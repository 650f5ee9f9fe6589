"""Row-form output contract timing: per-row packed buffers, no flat assembly.

Findings (v5e): 0.63 ms/pair = ~1430 Mpix/s with identical support set
(vs 1.1 ms flat).
"""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import _sparsematch_rows_impl, row_supports_to_numpy
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024
left, right = make_pair(H, W, 16)
forest = load_forest("forests/defaultZeroForest.txt")
mask = make_filter_mask(forest)
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True, capacity=1 << 19)

def step(l, r):
    (xs, ds), counts = _sparsematch_rows_impl(l, r, mask=mask, settings=settings, use_pallas=True)
    return (xs.sum(dtype=jnp.int32) + ds.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32))

def dep(c, args):
    l, r = args
    l = jax.lax.dynamic_update_slice(l, (c & 1).astype(jnp.uint8).reshape(1,1), (0,0))
    return (l, r)

s = device_time_per_iter(step, (left, right), dep, 3, 43, repeats=5)
print(json.dumps({"exp": "pipeline_rowform_ALL_outputs", "ms": round(s*1e3,3),
                  "mpix_s": round(2*H*W/1e6/s,1)}), flush=True)
(xs, ds), counts = jax.jit(lambda l, r: _sparsematch_rows_impl(l, r, mask=mask, settings=settings, use_pallas=True))(left, right)
supp = row_supports_to_numpy(xs, ds, counts)
print(f"supports {len(supp)} acc {(supp[:,2]==16).mean():.4f}", file=sys.stderr)
assert len(supp) == 344799 and (supp[:,2]==16).all()
