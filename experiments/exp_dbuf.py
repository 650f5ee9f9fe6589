"""Double-buffered DMA A/B for the fused keys kernel.

The production kernel fetches its (96, 1152) halo tile synchronously
(start+wait) before computing; this variant prefetches grid step s+1's
tile into the other scratch slot while step s computes (the guide's
double-buffering pattern over sequential grid steps).  If DMA latency is
a real fraction of the ~5.5 us/tile step time, this should show up.

Run on the TPU: python experiments/exp_dbuf.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.match import SENTINEL_BASE, match_epipolar_masked
from opengpc_tpu.ops.fused import (_HALO_C, _HALO_R, _prep, fused_keys,
                                   tile_codes_and_cand)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
left, right = make_pair(H, W, 16, seed=100)


def _kernel_keys_db(img_ref, key_ref, scratch, sem, *, h, w, th, tw, n_rt,
                    n_ct, tests, thr2, pos_base, sentinel_base):
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * n_ct + j
    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    def dma_for(step_idx, slot_idx):
        ii = jax.lax.div(step_idx, n_ct)
        jj = jax.lax.rem(step_idx, n_ct)
        return pltpu.make_async_copy(
            img_ref.at[pl.ds(ii * th, th + _HALO_R),
                       pl.ds(jj * tw, tw + _HALO_C)],
            scratch.at[slot_idx],
            sem.at[slot_idx],
        )

    @pl.when(step == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(step + 1 < n_rt * n_ct)
    def _():
        dma_for(step + 1, nxt).start()

    dma_for(step, slot).wait()
    x32 = scratch[slot].astype(jnp.int32)
    code, cand = tile_codes_and_cand(x32, i * th, h, w, th, tests, thr2,
                                     x0=j * tw, tw=tw)
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    key_ref[:] = jnp.where(cand, code, jnp.int32(sentinel_base + pos_base) + xx)


def fused_keys_db(img, pos_base):
    padded, h, w, th, tw, n_rt, n_ct, tests, thr2 = _prep(img, mask, 5)
    kernel = functools.partial(
        _kernel_keys_db, h=h, w=w, th=th, tw=tw, n_rt=n_rt, n_ct=n_ct,
        tests=tests, thr2=thr2, pos_base=int(pos_base),
        sentinel_base=SENTINEL_BASE,
    )
    keys = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        out_shape=jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th + _HALO_R, tw + _HALO_C), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=jax.default_backend() != "tpu",
    )(padded)
    return keys[:h, :w]


def keys_prod(a, b):
    kl = fused_keys(a, mask, 5, pos_base=0, sentinel_base=SENTINEL_BASE)
    kr = fused_keys(b, mask, 5, pos_base=W, sentinel_base=SENTINEL_BASE)
    return jnp.concatenate([kl, kr], axis=1)


def keys_db(a, b):
    return jnp.concatenate(
        [fused_keys_db(a, 0), fused_keys_db(b, W)], axis=1)


# parity first
got = np.asarray(jax.jit(keys_db)(left, right))
want = np.asarray(jax.jit(keys_prod)(left, right))
assert (got == want).all()
print(json.dumps({"exp": "dbuf_parity", "ok": True}), flush=True)


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
    return (jax.lax.dynamic_update_slice(a, upd, (0, 0)), b)


for name, fn in (("keys_sync", keys_prod), ("keys_dbuf", keys_db)):
    sec = device_time_per_iter(
        lambda a, b: fn(a, b).sum(dtype=jnp.int32), (left, right), dep,
        3, 43, repeats=5)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3)}), flush=True)


def pipe(fn):
    def step(a, b):
        key = fn(a, b)[13:H - 13]
        buf, counts = match_epipolar_masked(None, None, None, None, 128,
                                            key=key)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)
    return step


for name, fn in (("pipe_sync", keys_prod), ("pipe_dbuf", keys_db)):
    sec = device_time_per_iter(pipe(fn), (left, right), dep, 3, 43,
                               repeats=5)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3)}), flush=True)
