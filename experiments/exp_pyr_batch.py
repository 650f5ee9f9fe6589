"""Batched pyramid fold A/B (VERDICT r4 #2a): does stacking B pairs'
per-level row-form work into (B*hs, 2W_l) segmented sorts plus ONE (B, K)
dedup sort beat lax.map of B sequential rows-pyramids?

Variants on Sintel-sized (436, 1024) pairs, defaultZeroForest settings,
3 levels:
  single       : one pair, rows pyramid (the adopted r3/r4 path)
  map_pyramids : lax.map of B rows-pyramids (the pre-r5 batched path)
  folded       : _pyramid_rows_batched_impl (the r5 adoption candidate)

Run on the TPU: python experiments/exp_pyr_batch.py [B]
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
                                 _pyramid_rows_impl)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 436, 1024
LEVELS = 3
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)
mult, nbd = _pack_params(settings, LEVELS)

pairs = [make_pair(H, W, 16, seed=100 + b) for b in range(B)]
lb = np.stack([p[0] for p in pairs])
rb = np.stack([p[1] for p in pairs])

one = functools.partial(_pyramid_rows_impl, mask=mask, settings=settings,
                        num_levels=LEVELS, use_pallas=use_pallas,
                        mult=mult, nbd=nbd)
fold = functools.partial(_pyramid_rows_batched_impl, mask=mask,
                         settings=settings, num_levels=LEVELS,
                         use_pallas=use_pallas, mult=mult, nbd=nbd)


def consume(out):
    xs, ys, ds, lv, counts = out
    return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
            + ds.sum(dtype=jnp.int32) + lv.sum(dtype=jnp.int32)
            + counts.sum(dtype=jnp.int32))


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def t(step, args, n_long=23):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, args, dep, 3, n_long,
                                repeats=1 if _FAST else 5)


PPIX = 2 * H * W * (1 + 0.25 + 0.0625)


def report(name, sec, npair):
    mpix = PPIX * npair / 1e6 / max(sec, 1e-9)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "aggregate_mpix_s": round(mpix, 1)}), flush=True)


# correctness gate before timing (decoded sets equal per pair)
from opengpc_tpu.pyramid import pyramid_supports_to_numpy  # noqa: E402

fout = jax.jit(fold)(lb, rb)
for b in range(B):
    got = set(map(tuple, pyramid_supports_to_numpy(
        *(np.asarray(o)[b] for o in fout)).tolist()))
    want = set(map(tuple, pyramid_supports_to_numpy(
        *jax.jit(one)(lb[b], rb[b])).tolist()))
    assert got == want, f"pair {b}: folded set != single set"
print(f"gate ok: folded == per-pair for B={B}", file=sys.stderr)

report("single_pair", t(lambda a, b: consume(one(a, b)),
                        (lb[0], rb[0]), n_long=43), 1)
report(f"map_pyramids_B{B}",
       t(lambda a, b: consume(jax.lax.map(lambda ab: one(*ab), (a, b))),
         (lb, rb)), B)
report(f"folded_B{B}", t(lambda a, b: consume(fold(a, b)), (lb, rb)), B)
