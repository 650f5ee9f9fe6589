"""Batched COMPACT pyramid A/B (r5 follow-up to exp_pyr_batch2): on a
sparse (0.15-density) batch, does the hybrid fold (per-level folded
compacted matcher + per-pair lax.map dedup) beat lax.map of B compact
pyramids?

Run on the TPU: python experiments/exp_pyr_batch3.py [B]
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
from opengpc_tpu.pyramid import (_pack_params, _pyramid_compact_batched_impl,
                                 _pyramid_compact_impl,
                                 pyramid_supports_to_numpy)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_sparse_pair

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

pairs = [make_sparse_pair(H, W, 16, density=0.15, seed=100 + b)
         for b in range(B)]
lb = np.stack([p[0] for p in pairs])
rb = np.stack([p[1] for p in pairs])

one = functools.partial(_pyramid_compact_impl, mask=mask, settings=settings,
                        num_levels=LEVELS, use_pallas=use_pallas,
                        mult=mult, nbd=nbd, chunk=None, k=None)
fold = functools.partial(_pyramid_compact_batched_impl, mask=mask,
                         settings=settings, num_levels=LEVELS,
                         use_pallas=use_pallas, mult=mult, nbd=nbd,
                         chunk=None, k=None)

# gate: no overflow, per-pair equality
fout = jax.jit(fold)(lb, rb)
assert not np.asarray(fout[-1]).any(), "sparse batch tripped overflow"
for b in range(B):
    sout = jax.jit(one)(lb[b], rb[b])
    assert not bool(np.asarray(sout[-1]))
    got = set(map(tuple, pyramid_supports_to_numpy(
        *(np.asarray(o)[b] for o in fout[:-1])).tolist()))
    want = set(map(tuple, pyramid_supports_to_numpy(*sout[:-1]).tolist()))
    assert got == want, f"pair {b}"
print(f"gate ok: folded compact == per-pair for B={B}", file=sys.stderr)

_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def consume(out):
    tot = jnp.int32(0)
    for x in jax.tree.leaves(out):
        tot = tot + x.sum(dtype=jnp.int32).astype(jnp.int32)
    return tot


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


def t(step, args, n_long=23):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, args, dep, 3, n_long,
                                repeats=1 if _FAST else 5)


PPIX = 2 * H * W * (1 + 0.25 + 0.0625)


def report(name, sec, npair):
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "aggregate_mpix_s": round(PPIX * npair / 1e6
                                                / max(sec, 1e-9), 1)}),
          flush=True)


report("single_pair_compact", t(lambda a, b: consume(one(a, b)),
                                (lb[0], rb[0]), n_long=43), 1)
report(f"map_compact_B{B}",
       t(lambda a, b: consume(jax.lax.map(lambda ab: one(*ab), (a, b))),
         (lb, rb)), B)
report(f"folded_compact_B{B}", t(lambda a, b: consume(fold(a, b)),
                                 (lb, rb)), B)
