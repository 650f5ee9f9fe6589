"""Multigrid vs fixed-sweep Jacobi densify device timing (VERDICT r4 #4).

The r4 device densifier was a fixed-64-sweep masked Jacobi
(densify._diffuse): 1.96 ms at Sintel scale — 4.5x the matcher — with a
fill radius bounded by the sweep count.  The r5 multigrid path
(densify._diffuse_multigrid) restricts seeds down a 2x2 pyramid, solves
coarse, and relaxes a few sweeps per level: unbounded fill radius at
O(log) work.  This times both end-to-end from a masked buffer
(seed + solve, the densify_from_masked production path) on the chip.

Run on the TPU: python experiments/exp_densify_mg.py
"""
import json
import os
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.densify import _densify_from_masked
from opengpc_tpu.forest import load_forest
from opengpc_tpu.infer import build_sparsematch_masked
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_scene

H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)
left, right, _, _ = make_scene(np.random.default_rng(3), H, W)
buf, counts = build_sparsematch_masked(forest, settings,
                                       use_pallas=use_pallas)(left, right)
buf = jnp.asarray(buf)


def dep(s, args):
    (b,) = args
    b = jax.lax.dynamic_update_slice(
        b, (s.astype(jnp.int32) & 1).reshape(1, 1), (0, 0))
    return (b,)


_FAST = os.environ.get("OGPC_EXP_FAST", "") not in ("", "0")


def t(step, n_long=103):
    if _FAST:
        n_long = 4
    return device_time_per_iter(step, (buf,), dep, 3, n_long,
                                repeats=1 if _FAST else 5)


def report(name, sec):
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3)}), flush=True)


variants = [
    ("jacobi64", dict(method="jacobi", num_iters=64)),
    ("multigrid_s6", dict(method="multigrid", num_iters=6)),
    ("multigrid_s10", dict(method="multigrid", num_iters=10)),
    ("multigrid_s16", dict(method="multigrid", num_iters=16)),
]
for name, kw in variants:
    def step(b, kw=kw):
        val, filled = _densify_from_masked(b, settings.disp_high,
                                           kw["num_iters"], width=W,
                                           method=kw["method"])
        return (val.sum(dtype=jnp.float32).astype(jnp.int32)
                + filled.sum(dtype=jnp.int32))
    # correctness gate: dense scene -> everything fills either way
    v, f = _densify_from_masked(buf, settings.disp_high, kw["num_iters"],
                                width=W, method=kw["method"])
    frac = float(np.asarray(f).mean())
    report(name + f"_fillfrac{frac:.3f}", t(step))
