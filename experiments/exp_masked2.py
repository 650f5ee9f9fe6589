"""Masked-contract frontier A/B (round 3, session 2):

  masked_single    : current headline path (baseline for this run)
  masked_tau       : same contract, defaultTauForest (bench config 2 rides
                     the FLAT contract today -- is tau eligible for the
                     headline number?)
  masked_batch_B4  : B pairs folded into one (B*H, 2W) masked emit
  masked_interior  : slice the key image to candidate rows [13, H-13)
                     before the sort (margin rows are all-sentinel and can
                     never pair; reference margin: inference.hpp:318-325).
                     Sorts (H-26, 2W) instead of (H, 2W).
  rows_interior    : same slicing on the row-form contract

Run on the TPU: python experiments/exp_masked2.py
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
from opengpc_tpu.infer import (_batched_key_images, _fused_key_image,
                               _key_image_jnp, _sparsematch_masked_impl)
from opengpc_tpu.match import match_epipolar_masked, match_epipolar_rows
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

B = 4
H, W = 436, 1024
MARGIN = 13
use_pallas = jax.default_backend() == "tpu"

zero_mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
tau_mask = make_filter_mask(load_forest("forests/defaultTauForest.txt"))
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True)

pairs = [make_pair(H, W, 16, seed=100 + b) for b in range(B)]
lb = np.stack([p[0] for p in pairs])
rb = np.stack([p[1] for p in pairs])


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


def t(step, args, n_long=43):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=5)


def report(name, sec, npair=1):
    mpix = 2 * H * W * npair / 1e6 / max(sec, 1e-9)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "aggregate_mpix_s": round(mpix, 1)}), flush=True)


def consume(out):
    buf, counts = out
    return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)


# baseline: current masked impl, zero forest
mz = functools.partial(_sparsematch_masked_impl, mask=zero_mask,
                       settings=settings, use_pallas=use_pallas)
report("masked_single", t(lambda a, b: consume(mz(a, b)), (lb[0], rb[0])))

# tau forest on the masked contract
mt = functools.partial(_sparsematch_masked_impl, mask=tau_mask,
                       settings=settings, use_pallas=use_pallas)
report("masked_tau", t(lambda a, b: consume(mt(a, b)), (lb[0], rb[0])))

# batched masked fold
report(f"masked_batch_B{B}",
       t(lambda a, b: consume(mz(a, b)), (lb, rb), n_long=23), B)


def keyimg(a, b, mask):
    key = _fused_key_image(a, b, mask, settings) if use_pallas else None
    if key is None:
        key = _key_image_jnp(a, b, mask, settings, use_pallas=False)
    return key


def masked_interior(a, b, mask):
    key = keyimg(a, b, mask)[MARGIN:H - MARGIN]
    return match_epipolar_masked(None, None, None, None, settings.disp_high,
                                 key=key)


report("masked_interior",
       t(lambda a, b: consume(masked_interior(a, b, zero_mask)),
         (lb[0], rb[0])))


def rows_interior(a, b, mask):
    key = keyimg(a, b, mask)[MARGIN:H - MARGIN]
    (xs, ds), counts = match_epipolar_rows(
        None, None, None, None, settings.disp_high, key=key)
    return (xs.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32)
            + counts.sum(dtype=jnp.int32))


report("rows_interior", t(lambda a, b: rows_interior(a, b, zero_mask),
                          (lb[0], rb[0])))

# contract-preserving variants: pad outputs back to H rows
def masked_interior_padded(a, b, mask):
    buf, counts = masked_interior(a, b, mask)
    buf = jnp.pad(buf, ((MARGIN, MARGIN), (0, 0)),
                  constant_values=0x7FFFFFFF)
    counts = jnp.pad(counts, (MARGIN, MARGIN))
    return buf, counts


report("masked_interior_padded",
       t(lambda a, b: consume(masked_interior_padded(a, b, zero_mask)),
         (lb[0], rb[0])))


def rows_interior_padded(a, b, mask):
    key = keyimg(a, b, mask)[MARGIN:H - MARGIN]
    (xs, ds), counts = match_epipolar_rows(
        None, None, None, None, settings.disp_high, key=key)
    xs = jnp.pad(xs, ((MARGIN, MARGIN), (0, 0)))
    ds = jnp.pad(ds, ((MARGIN, MARGIN), (0, 0)))
    counts = jnp.pad(counts, (MARGIN, MARGIN))
    return (xs.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32)
            + counts.sum(dtype=jnp.int32))


report("rows_interior_padded",
       t(lambda a, b: rows_interior_padded(a, b, zero_mask), (lb[0], rb[0])))


def batch_masked_interior_padded(a, b, mask):
    keys = _batched_key_images(a, b, mask, settings, use_pallas)
    ki = keys[:, MARGIN:H - MARGIN].reshape(B * (H - 2 * MARGIN), 2 * W)
    buf, counts = match_epipolar_masked(None, None, None, None,
                                        settings.disp_high, key=ki)
    buf = buf.reshape(B, H - 2 * MARGIN, 2 * W)
    counts = counts.reshape(B, H - 2 * MARGIN)
    buf = jnp.pad(buf, ((0, 0), (MARGIN, MARGIN), (0, 0)),
                  constant_values=0x7FFFFFFF)
    counts = jnp.pad(counts, ((0, 0), (MARGIN, MARGIN)))
    return consume((buf, counts))


report(f"masked_batch_interior_B{B}",
       t(lambda a, b: batch_masked_interior_padded(a, b, zero_mask),
         (lb, rb), n_long=23), B)

# parity sanity of the interior slice (host, once)
full = jax.jit(mz)(lb[0], rb[0])
sl = jax.jit(functools.partial(masked_interior, mask=zero_mask))(lb[0], rb[0])
fbuf, fcnt = np.asarray(full[0]), np.asarray(full[1])
sbuf, scnt = np.asarray(sl[0]), np.asarray(sl[1])
assert fcnt[:MARGIN].sum() == 0 and fcnt[H - MARGIN:].sum() == 0
assert (fcnt[MARGIN:H - MARGIN] == scnt).all()
assert (fbuf[MARGIN:H - MARGIN] == sbuf).all()
print(json.dumps({"exp": "interior_parity", "ok": True}), flush=True)
