"""Batched sort scaling on TPU: one flat sort vs vmap-batched rows.

Findings (v5e): 893k 1-op flat 0.54 ms; (4,893k) batched 6.13 ms (2.8x
worse than 4 independent) -> batch pipelines with lax.map, not vmap.
"""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from opengpc_tpu.utils import device_time_per_iter

N = 436 * 2047
rng = np.random.default_rng(0)
k1 = jnp.asarray(rng.integers(0, 1 << 30, (N,), np.int32))
k4 = jnp.asarray(rng.integers(0, 1 << 30, (4, N), np.int32))

def dep(s, args):
    a = list(args)
    a[0] = a[0].at[(0,)*a[0].ndim].set(a[0][(0,)*a[0].ndim] ^ (s.astype(jnp.int32) & 1))
    return tuple(a)

def t(step, args, n_long=23):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=3)

s = t(lambda k: jax.lax.sort((k,), dimension=0, num_keys=1, is_stable=False)[0].sum(dtype=jnp.int32) & 0xFF, (k1,))
print(json.dumps({"exp": "flat_sort_893k_1op", "ms": round(s*1e3,3)}), flush=True)

s = t(lambda k: jax.lax.sort((k,), dimension=1, num_keys=1, is_stable=False)[0].sum(dtype=jnp.int32) & 0xFF, (k4,))
print(json.dumps({"exp": "batched4_sort_893k_1op", "ms": round(s*1e3,3)}), flush=True)

# batched matcher row-sort for reference: (4*436, 2048) 2-op
km = jnp.asarray(rng.integers(0, 1 << 30, (1744, 2048), np.int32))
pos = jnp.broadcast_to(jnp.arange(2048, dtype=jnp.int32)[None], (1744, 2048))
s = t(lambda k: sum(o.sum(dtype=jnp.int32) for o in jax.lax.sort((k, pos), dimension=1, num_keys=1, is_stable=False)) & 0xFF, (km,))
print(json.dumps({"exp": "rows1744_sort2048_2op", "ms": round(s*1e3,3)}), flush=True)
