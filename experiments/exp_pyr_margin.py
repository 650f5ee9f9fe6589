"""Single-pair rows pyramid: does skipping margin rows in the dedup keys
(like the batched fold does) pay?  The r3 `_pyramid_rows_impl` pads each
level's row-form outputs back to full height, so ~6% of the dedup sort's
input is margin sentinels (410/436 candidate rows at level 0, 24% fewer
at level 2).  Variant: run the B=1 batched impl (margin rows skipped,
K = 539k vs 574k at Sintel/3 levels) and squeeze.

Run on the TPU: python experiments/exp_pyr_margin.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.pyramid import (_pack_params, _pyramid_rows_batched_impl,
                                 _pyramid_rows_impl,
                                 pyramid_supports_to_numpy)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
LEVELS = 3
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)
mult, nbd = _pack_params(settings, LEVELS)
left, right = make_pair(H, W, 16)

full = functools.partial(_pyramid_rows_impl, mask=mask, settings=settings,
                         num_levels=LEVELS, use_pallas=use_pallas,
                         mult=mult, nbd=nbd)


def trimmed(l, r):
    out = _pyramid_rows_batched_impl(
        l[None], r[None], mask, settings, LEVELS, use_pallas, mult, nbd)
    return tuple(o[0] for o in out)


a = jax.jit(full)(left, right)
b = jax.jit(trimmed)(left, right)
sa = set(map(tuple, pyramid_supports_to_numpy(*a).tolist()))
sb = set(map(tuple, pyramid_supports_to_numpy(*b).tolist()))
assert sa == sb and len(sa) > 1000, (len(sa), len(sb))
print(f"gate ok: trimmed set == full set ({len(sa)})", file=sys.stderr)

_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def consume(out):
    tot = jnp.int32(0)
    for x in jax.tree.leaves(out):
        tot = tot + x.sum(dtype=jnp.int32).astype(jnp.int32)
    return tot


def dep(s, args):
    a_, b_ = args
    a_ = jax.lax.dynamic_update_slice(
        a_, (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1),
        (0, 0))
    return (a_, b_)


def t(step, n_long=103):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, (left, right), dep, 3, n_long,
                                repeats=1 if _FAST else 5)


PPIX = 2 * H * W * (1 + 0.25 + 0.0625)
for name, fn in (("full_margins", full), ("trimmed_margins", trimmed)):
    sec = t(lambda a_, b_, fn=fn: consume(fn(a_, b_)))
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "mpix_s": round(PPIX / 1e6 / max(sec, 1e-9), 1)}),
          flush=True)
