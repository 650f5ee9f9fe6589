"""2x2 downscale variants + half-res match cost on TPU.

Findings (v5e): strided slicing 4.8 ms/image, reshape 0.185 ms,
lax.reduce_window 0.018 ms (adopted in pyramid.downscale2);
(218,512) match alone 0.19 ms.
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
import dataclasses
settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                             disp_high=128, epipolar_mode=True, capacity=1 << 17)

def dep(c, args):
    a = list(args)
    a[0] = jax.lax.dynamic_update_slice(a[0], (c & 1).astype(a[0].dtype).reshape((1,)*a[0].ndim), (0,)*a[0].ndim)
    return tuple(a)

def t(step, args, n_long=23):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=3)

def pool_strided(img):
    x = img.astype(jnp.int16)
    return ((x[0::2,0::2]+x[0::2,1::2]+x[1::2,0::2]+x[1::2,1::2])//4).astype(jnp.uint8)

def pool_reshape(img):
    h2, w2 = img.shape[0]//2, img.shape[1]//2
    x = img[:2*h2,:2*w2].astype(jnp.int16).reshape(h2,2,w2,2)
    return (x.sum((1,3))//4).astype(jnp.uint8)

def pool_rw(img):
    x = img.astype(jnp.int32)
    s = jax.lax.reduce_window(x, 0, jax.lax.add, (2,2), (2,2), 'VALID')
    return (s//4).astype(jnp.uint8)

for name, fn in (("strided", pool_strided), ("reshape", pool_reshape), ("reduce_window", pool_rw)):
    s = t(lambda l: fn(l).sum(dtype=jnp.int32) & 0xFF, (left,))
    print(json.dumps({"exp": f"pool_{name}", "ms": round(s*1e3, 3)}), flush=True)

# match at (218,512) on precomputed input
l2 = np.asarray(jax.jit(pool_reshape)(left)); r2 = np.asarray(jax.jit(pool_reshape)(right))
s = t(lambda a, b: _sparsematch_impl(a, b, mask=mask, settings=settings, use_pallas=True)[3], (l2, r2))
print(json.dumps({"exp": "match_218x512_alone", "ms": round(s*1e3, 3)}), flush=True)
