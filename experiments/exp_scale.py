"""Resolution scaling of the masked contract (SURVEY 5.g: scaling over
the problem dimension is image area here).

Sintel (436x1024) / HD (1080x1920) / 4K (2160x3840) stereo pairs through
build_sparsematch_masked's impl; prints ms/pair and Mpix/s per size, plus
which key path ran (fused Pallas kernel vs jnp fallback when the image
exceeds the kernel's VMEM budget).

Run on the TPU: python experiments/exp_scale.py
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
from opengpc_tpu.infer import _sparsematch_masked_impl
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

use_pallas = jax.default_backend() == "tpu"
mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True)


def dep(s, args):
    a, b = args
    upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
    a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
    return (a, b)


for name, (h, w), n_long in (("sintel", (436, 1024), 43),
                             ("hd", (1080, 1920), 23),
                             ("uhd4k", (2160, 3840), 11)):
    left, right = make_pair(h, w, 16, seed=7)
    # every resolution rides the kernel since the per-tile DMA rework;
    # use_pallas is the only selector left
    path = "pallas" if use_pallas else "jnp"
    fn = functools.partial(_sparsematch_masked_impl, mask=mask,
                           settings=settings, use_pallas=use_pallas)

    def step(a, b):
        buf, counts = fn(a, b)
        return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

    # one warm call for the support count
    buf, counts = jax.jit(fn)(left, right)
    n_sup = int(np.asarray(counts).sum())
    sec = device_time_per_iter(step, (left, right), dep, 3, n_long,
                               repeats=5)
    print(json.dumps({
        "exp": f"masked_{name}", "shape": [h, w], "key_path": path,
        "ms": round(sec * 1e3, 3),
        "mpix_s": round(2 * h * w / 1e6 / max(sec, 1e-9), 1),
        "supports": n_sup,
    }), flush=True)
