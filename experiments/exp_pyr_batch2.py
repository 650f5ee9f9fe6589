"""Batched pyramid fold round 2: the full fold LOST on TPU (exp_pyr_batch:
folded_B4 7.01 ms vs lax.map 5.665 — the (B, K~574k) dedup sort hits the
same batched-big-sort pathology as the vmap'd global sort dead end), while
winning 5x on CPU.  HYBRID variant: fold the per-level row sorts (the part
that wins — same fold as the batched rows contract) but run the dedup
sorts per pair under lax.map.

  map_pyramids : lax.map of B rows-pyramids (the r4 baseline)
  folded       : full fold incl. one (B, K) dedup sort (r5 first cut)
  hybrid       : folded per-level row sorts + lax.map per-pair dedup

Run on the TPU: python experiments/exp_pyr_batch2.py [B]
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
from opengpc_tpu.pyramid import (_dedup_unpack, _pack_params,
                                 _pyramid_batched_keys,
                                 _pyramid_rows_batched_impl,
                                 _pyramid_rows_impl,
                                 pyramid_supports_to_numpy)
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
                         use_pallas=use_pallas, mult=mult, nbd=nbd,
                         map_dedup=False)
hybrid = functools.partial(_pyramid_rows_batched_impl, mask=mask,
                           settings=settings, num_levels=LEVELS,
                           use_pallas=use_pallas, mult=mult, nbd=nbd,
                           map_dedup=True)


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


# gate: hybrid == fold == per-pair
hout = jax.jit(hybrid)(lb, rb)
for b in range(B):
    got = set(map(tuple, pyramid_supports_to_numpy(
        *(np.asarray(o)[b] for o in hout)).tolist()))
    want = set(map(tuple, pyramid_supports_to_numpy(
        *jax.jit(one)(lb[b], rb[b])).tolist()))
    assert got == want, f"pair {b}: hybrid set != single set"
print(f"gate ok: hybrid == per-pair for B={B}", file=sys.stderr)

report(f"map_pyramids_B{B}",
       t(lambda a, b: consume(jax.lax.map(lambda ab: one(*ab), (a, b))),
         (lb, rb)), B)
report(f"folded_B{B}", t(lambda a, b: consume(fold(a, b)), (lb, rb)), B)
report(f"hybrid_B{B}", t(lambda a, b: consume(hybrid(a, b)), (lb, rb)), B)
