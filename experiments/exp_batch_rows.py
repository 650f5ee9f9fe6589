"""Batched row-form matcher A/B (VERDICT r2 item 1): does folding the
batch into ONE (B*H, 2W) segmented row sort beat lax.map of B pipelines?

Variants on Sintel-sized (436, 1024) pairs, defaultZeroForest settings:
  map_pipelines : lax.map of B independent row-form pipelines (round-2)
  stacked_pallas: per-pair Pallas key images (lax.map), one stacked sort
  stacked_jnp   : vmap'd jnp key images, one stacked sort
  single        : one pair, row-form (the round-2 headline path)

Run on the TPU: python experiments/exp_batch_rows.py [B]
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
from opengpc_tpu.infer import (_fused_key_image, _key_image_jnp,
                               _sparsematch_rows_impl)
from opengpc_tpu.match import match_epipolar_rows
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 436, 1024
use_pallas = jax.default_backend() == "tpu"

forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True,
                             capacity=1 << 19)

pairs = [make_pair(H, W, 16, seed=100 + b) for b in range(B)]
lb = np.stack([p[0] for p in pairs])
rb = np.stack([p[1] for p in pairs])


def consume_rows(out):
    (xs, ds), counts = out
    return (xs.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32)
            + counts.sum(dtype=jnp.int32))


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape((1,) * a.ndim)
    a = jax.lax.dynamic_update_slice(a, upd, (0,) * a.ndim)
    return (a, b)


def t(step, args, n_long=23):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=5)


one = functools.partial(_sparsematch_rows_impl, mask=mask, settings=settings,
                        use_pallas=use_pallas)


def report(name, sec, npair):
    mpix = 2 * H * W * npair / 1e6 / max(sec, 1e-9)
    print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3),
                      "aggregate_mpix_s": round(mpix, 1)}), flush=True)


# single pair baseline
report("single_pair", t(lambda a, b: consume_rows(one(a, b)),
                        (lb[0], rb[0]), n_long=43), 1)

# round-2 contract: lax.map of B pipelines
report(f"map_pipelines_B{B}",
       t(lambda a, b: consume_rows(jax.lax.map(lambda ab: one(*ab), (a, b))),
         (lb, rb)), B)


def stacked(a, b, keyfn):
    keys = keyfn(a, b)
    st = keys.reshape(B * H, 2 * W)
    (xs, ds), counts = match_epipolar_rows(None, None, None, None,
                                           settings.disp_high, key=st)
    return (xs.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32)
            + counts.sum(dtype=jnp.int32))


if use_pallas:
    report(f"stacked_pallas_B{B}",
           t(lambda a, b: stacked(a, b, lambda x, y: jax.lax.map(
               lambda ab: _fused_key_image(ab[0], ab[1], mask, settings),
               (x, y))), (lb, rb)), B)

report(f"stacked_jnp_B{B}",
       t(lambda a, b: stacked(a, b, jax.vmap(
           lambda l, r: _key_image_jnp(l, r, mask, settings))), (lb, rb)), B)

# stacked with vmap'd PALLAS keys (pallas_call vmap adds a grid dim)
if use_pallas:
    try:
        report(f"stacked_vmap_pallas_B{B}",
               t(lambda a, b: stacked(a, b, jax.vmap(
                   lambda l, r: _fused_key_image(l, r, mask, settings))),
                 (lb, rb)), B)
    except Exception as e:  # noqa: BLE001 - exploratory variant
        print(json.dumps({"exp": f"stacked_vmap_pallas_B{B}",
                          "error": repr(e)[:200]}), flush=True)
