"""True pipeline cost with ALL outputs consumed vs count-only (DCE trap).

Findings (v5e): with scatter compaction 16.3 ms vs 0.37 count-only; after
the sort-based compaction rewrite 1.1 ms (14.7x).  Bench steps must
consume every output buffer.
"""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import _sparsematch_impl
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
left, right = make_pair(H, W, 16)
forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True, capacity=1 << 19)

def dep(c, args):
    l, r = args
    l = jax.lax.dynamic_update_slice(l, (c.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1,1), (0,0))
    return (l, r)

def t(step, n_long=23):
    return device_time_per_iter(step, (left, right), dep, 3, n_long, repeats=3)

def full_outputs(l, r):
    xs, ys, ds, count = _sparsematch_impl(l, r, mask=mask, settings=settings, use_pallas=True)
    return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32)) & 0xFF + count

s = t(full_outputs)
print(json.dumps({"exp": "pipeline_ALL_outputs", "ms": round(s*1e3,3),
                  "mpix_s": round(2*H*W/1e6/s,1)}), flush=True)

def count_only(l, r):
    return _sparsematch_impl(l, r, mask=mask, settings=settings, use_pallas=True)[3]
s = t(count_only)
print(json.dumps({"exp": "pipeline_count_only", "ms": round(s*1e3,3)}), flush=True)
