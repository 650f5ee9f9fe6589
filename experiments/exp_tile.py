"""Tile aspect-ratio A/B for the DMA-tiled fused keys kernel.

Halo recompute fraction vs ideal is (th+28)/th * (tw+28)/tw; the temp
stack admits (64, 1024) -> 1.48x, (128, 512) -> 1.28x, (128, 384) ->
1.31x, (32, 1024) -> 1.93x.  Measures both images' key build alone and
the full masked pipeline per tile choice on the bench pair, plus a
parity check.

Run on the TPU: python experiments/exp_tile.py
"""
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.match import SENTINEL_BASE, match_epipolar_masked
from opengpc_tpu.ops.fused import fused_keys
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
left, right = make_pair(H, W, 16, seed=100)


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
    a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
    return (a, b)


def keys2(a, b, tile):
    kl = fused_keys(a, mask, 5, pos_base=0, sentinel_base=SENTINEL_BASE,
                    tile=tile)
    kr = fused_keys(b, mask, 5, pos_base=W, sentinel_base=SENTINEL_BASE,
                    tile=tile)
    return jnp.concatenate([kl, kr], axis=1)


ref = None
for tile in (None, (128, 512), (128, 384), (64, 512), (32, 1024)):
    name = "default_64x1024" if tile is None else f"{tile[0]}x{tile[1]}"
    got = np.asarray(jax.jit(lambda a, b: keys2(a, b, tile))(left, right))
    if ref is None:
        ref = got
    else:
        assert (got == ref).all(), name

    def kstep(a, b):
        return keys2(a, b, tile).sum(dtype=jnp.int32)

    ksec = device_time_per_iter(kstep, (left, right), dep, 3, 43, repeats=5)

    def mstep(a, b):
        key = keys2(a, b, tile)[13:H - 13]
        buf, counts = match_epipolar_masked(None, None, None, None, 128,
                                            key=key)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

    msec = device_time_per_iter(mstep, (left, right), dep, 3, 43, repeats=5)
    print(json.dumps({"tile": name, "keys_ms": round(ksec * 1e3, 3),
                      "pipeline_ms": round(msec * 1e3, 3)}), flush=True)
