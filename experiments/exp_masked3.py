"""Round-3 session-2 frontier closers:

  masked_batch_B{2,4,8}: aggregate-throughput curve of the batched masked
      fold — does aggregate keep climbing past B=4?
  pyramid_rows / pyramid_masked: A/B of the 3-level pyramid feeding the
      finest-wins dedup from row-form buffers (current) vs directly from
      masked detection windows (skips per-level pack sorts but doubles the
      dedup sort's input width).

Run on the TPU: python experiments/exp_masked3.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import (_sparsematch_masked_impl,
                               _sparsematch_rows_impl)
from opengpc_tpu.match import MASKED_SENTINEL
from opengpc_tpu.pyramid import _dedup_unpack, _pyramid_impl, downscale2
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"
mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


def report(name, sec, npix):
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "aggregate_mpix_s": round(npix / 1e6 / max(sec, 1e-9),
                                                1)}), flush=True)


mz = functools.partial(_sparsematch_masked_impl, mask=mask,
                       settings=settings, use_pallas=use_pallas)


def consume(out):
    buf, counts = out
    return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)


for b in (2, 4, 8):
    pairs = [make_pair(H, W, 16, seed=100 + k) for k in range(b)]
    lb = np.stack([p[0] for p in pairs])
    rb = np.stack([p[1] for p in pairs])
    n_long = max(11, 43 // b)
    sec = device_time_per_iter(lambda a, c: consume(mz(a, c)), (lb, rb),
                               dep, 3, n_long, repeats=5)
    report(f"masked_batch_B{b}", sec, 2 * b * H * W)

# ---------------------------------------------------------------------
# pyramid A/B: rows-fed dedup (current) vs masked-window-fed dedup
# ---------------------------------------------------------------------
left, right = make_pair(H, W, 16, seed=100)
NUM_LEVELS = 3
mult = 4
nbd = int(2 * settings.disp_high + 1).bit_length()
all_px = sum(2 * (H >> k) * (W >> k) for k in range(NUM_LEVELS))


def pyr_rows(l, r):
    out = _pyramid_impl(l, r, mask=mask, settings=settings,
                        num_levels=NUM_LEVELS, use_pallas=use_pallas,
                        dedup=True)
    return sum(o.sum(dtype=jnp.int32) for o in out[:4]) + out[4].sum()


def pyr_masked(l, r):
    """Feed the finest-wins dedup directly from masked detection windows:
    no per-level pack sort, but each level contributes (H_l, 2W_l) window
    slots instead of (H_l, W_l) packed slots."""
    sent = jnp.int32(0x7FFFFFFF)
    keys = []
    li, ri = l, r
    for level in range(NUM_LEVELS):
        buf, counts = _sparsematch_masked_impl(
            li, ri, mask=mask, settings=settings, use_pallas=use_pallas)
        hl = li.shape[0]
        scale = 1 << level
        yy = jnp.arange(hl, dtype=jnp.int32)[:, None]
        valid = buf != MASKED_SENTINEL
        bd = max(1, int(2 * settings.disp_high).bit_length())
        xs = buf >> bd
        ds = (buf & ((1 << bd) - 1)) - settings.disp_high
        pix = (yy * scale) * W + xs * scale
        keys.append(jnp.where(
            valid, ((pix * mult + level) << nbd) | (ds + settings.disp_high),
            sent).reshape(-1))
        if level + 1 < NUM_LEVELS:
            li = downscale2(li)
            ri = downscale2(ri)
    out = _dedup_unpack(jnp.concatenate(keys), mult, nbd, W,
                        settings.disp_high, NUM_LEVELS)
    return sum(o.sum(dtype=jnp.int32) for o in out[:4]) + out[4].sum()


sec = device_time_per_iter(pyr_rows, (left, right), dep, 3, 23, repeats=5)
report("pyramid_rows", sec, all_px)
sec = device_time_per_iter(pyr_masked, (left, right), dep, 3, 23, repeats=5)
report("pyramid_masked", sec, all_px)

# parity: the masked-fed dedup must produce the same merged support set
o1 = jax.jit(functools.partial(
    _pyramid_impl, mask=mask, settings=settings, num_levels=NUM_LEVELS,
    use_pallas=use_pallas, dedup=True))(left, right)


def pyr_masked_out(l, r):
    sent = jnp.int32(0x7FFFFFFF)
    keys = []
    li, ri = l, r
    for level in range(NUM_LEVELS):
        buf, counts = _sparsematch_masked_impl(
            li, ri, mask=mask, settings=settings, use_pallas=use_pallas)
        hl = li.shape[0]
        scale = 1 << level
        yy = jnp.arange(hl, dtype=jnp.int32)[:, None]
        valid = buf != MASKED_SENTINEL
        bd = max(1, int(2 * settings.disp_high).bit_length())
        xs = buf >> bd
        ds = (buf & ((1 << bd) - 1)) - settings.disp_high
        pix = (yy * scale) * W + xs * scale
        keys.append(jnp.where(
            valid, ((pix * mult + level) << nbd) | (ds + settings.disp_high),
            sent).reshape(-1))
        if level + 1 < NUM_LEVELS:
            li = downscale2(li)
            ri = downscale2(ri)
    return _dedup_unpack(jnp.concatenate(keys), mult, nbd, W,
                         settings.disp_high, NUM_LEVELS)


o2 = jax.jit(pyr_masked_out)(left, right)


def to_set(out):
    xs, ys, ds, lv, counts = (np.asarray(t) for t in out)
    keep = lv >= 0
    return set(zip(xs[keep].tolist(), ys[keep].tolist(), ds[keep].tolist(),
                   lv[keep].tolist()))


assert to_set(o1) == to_set(o2), "pyramid masked-fed dedup != rows-fed"
print(json.dumps({"exp": "pyramid_parity", "ok": True}), flush=True)
