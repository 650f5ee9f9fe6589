"""Global (non-epipolar) matcher stage costs + A/B (VERDICT r2 item 2).

The default-settings path (inference.hpp:75 epipolarMode=false) was 2.4x
slower than epipolar in round 2 (~590 vs ~1430 Mpix/s).  Variants on the
Sintel-sized bench pair:

  flat_global    : round-2 pipeline (packed flat sort + flat compaction)
  global_rows    : flat sort + SEGMENTED pack (match_global_rows)
  sort_2op_893k  : the flat (2HW,) 2-operand sort alone (the floor)
  sort_1op_893k  : 1-operand flat sort (what dropping pos would buy)
  keys_only      : fused key images alone

Run on the TPU: python experiments/exp_global.py
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
from opengpc_tpu.infer import (_fused_key_image, _sparsematch_global_rows_impl,
                               _sparsematch_impl)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"
forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=False,
                             capacity=1 << 19)
left, right = make_pair(H, W, 16, seed=100)


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


def t(step, args, n_long=43):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=5)


def report(name, sec):
    mpix = 2 * H * W / 1e6 / max(sec, 1e-9)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "mpix_s": round(mpix, 1)}), flush=True)


# round-2 flat global pipeline
def flat_step(a, b):
    xs, ys, ds, count = _sparsematch_impl(a, b, mask=mask, settings=settings,
                                          use_pallas=use_pallas)
    return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
            + ds.sum(dtype=jnp.int32) + count)


report("flat_global", t(flat_step, (left, right)))


def rows_step(a, b):
    (xs, ys, ds), counts = _sparsematch_global_rows_impl(
        a, b, mask=mask, settings=settings, use_pallas=use_pallas)
    return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
            + ds.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32))


report("global_rows", t(rows_step, (left, right)))


# stage floors on synthetic data of the same shape
rng = np.random.default_rng(0)
k1 = jnp.asarray(rng.integers(0, 1 << 30, (2 * H * W,), np.int32))
pos = jnp.arange(2 * H * W, dtype=jnp.int32)


def dep1(s, args):
    (a,) = args
    return (a.at[0].set(a[0] ^ (s.astype(jnp.int32) & 1)),)


def t1(step, args, n_long=43):
    return device_time_per_iter(step, args, dep1, 3, n_long, repeats=5)


report("sort_2op_893k", t1(
    lambda k: sum(o.sum(dtype=jnp.int32) for o in jax.lax.sort(
        (k, pos), dimension=0, num_keys=1, is_stable=False)) & 0xFFFF, (k1,)))
report("sort_1op_893k", t1(
    lambda k: jax.lax.sort((k,), dimension=0, num_keys=1,
                           is_stable=False)[0].sum(dtype=jnp.int32) & 0xFFFF,
    (k1,)))

if use_pallas:
    def keys_step(a, b):
        return _fused_key_image(a, b, mask, settings).sum(dtype=jnp.int32)

    report("keys_only", t(keys_step, (left, right)))
