"""Overflow-misprediction economics (VERDICT r4 next #3): price what a
tripped compact-contract overflow costs on chip, and decide the graded
retry question (re-run at K'=2K before full width?).

Scene: ~0.35 candidate density (just above the 0.30 auto-compact cutoff —
the boundary region where mispredictions live).  Variants:

  epipolar: masked full-width        (the correct dispatch here)
            compact S=128 K=64      (the misprediction waste; overflows)
            [graded K'=128 == chunk is the full-width sort by construction
             — no epipolar graded retry exists, recorded as analysis]
  global:   global-rows full-width
            global-compact S=512 K=128   (overflow status + time)
            global-compact S=512 K=256   (the graded retry candidate)

Run on the TPU: python experiments/exp_ovf_cost.py
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import (_sparsematch_global_compact_impl,
                               _sparsematch_global_rows_impl,
                               _sparsematch_masked_compact_impl,
                               _sparsematch_masked_impl)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_sparse_pair

H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)
gsettings = dataclasses.replace(settings, epipolar_mode=False)
left, right = make_sparse_pair(H, W, 16, density=0.35)

_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def dep(s, args):
    a, b = args
    a = jax.lax.dynamic_update_slice(
        a, (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1), (0, 0))
    return (a, b)


def t(step, n_long=103):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, (left, right), dep, 3, n_long,
                                repeats=1 if _FAST else 5)


def report(name, sec, note=""):
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "note": note}), flush=True)


def consume(*xs):
    tot = jnp.int32(0)
    for x in jax.tree.leaves(xs):
        tot = tot + x.sum(dtype=jnp.int32).astype(jnp.int32)
    return tot


# --- epipolar ---------------------------------------------------------
def masked_step(a, b):
    return consume(*_sparsematch_masked_impl(
        a, b, mask=mask, settings=settings, use_pallas=use_pallas))


def compact_step(a, b):
    buf, counts, ovf = _sparsematch_masked_compact_impl(
        a, b, mask=mask, settings=settings, use_pallas=use_pallas,
        chunk=128, k=64)
    return consume(buf, counts) + ovf.astype(jnp.int32)


ovf = bool(np.asarray(jax.jit(
    lambda a, b: _sparsematch_masked_compact_impl(
        a, b, mask=mask, settings=settings, use_pallas=use_pallas,
        chunk=128, k=64)[2])(left, right)))
m = t(masked_step)
c = t(compact_step)
report("masked_full", m)
report("masked_compact_k64", c,
       f"overflow={ovf}; misprediction waste = "
       f"{100 * c / max(m, 1e-9):.0f}% of a masked dispatch")

# --- global -----------------------------------------------------------
def grows_step(a, b):
    return consume(*_sparsematch_global_rows_impl(
        a, b, mask=mask, settings=gsettings, use_pallas=use_pallas))


def gc_step_for(k):
    def step(a, b):
        (xs, ys, ds), counts, ovf = _sparsematch_global_compact_impl(
            a, b, mask=mask, settings=gsettings, use_pallas=use_pallas,
            chunk=512, k=k)
        return consume(xs, ys, ds, counts) + ovf.astype(jnp.int32)
    return step


g = t(grows_step)
report("global_rows_full", g)
for k in (128, 256):
    govf = bool(np.asarray(jax.jit(
        lambda a, b, k=k: _sparsematch_global_compact_impl(
            a, b, mask=mask, settings=gsettings, use_pallas=use_pallas,
            chunk=512, k=k)[2])(left, right)))
    gk = t(gc_step_for(k))
    report(f"global_compact_k{k}", gk,
           f"overflow={govf}; {100 * gk / max(g, 1e-9):.0f}% of a "
           "global-rows dispatch")
