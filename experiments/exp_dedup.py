"""Pyramid-dedup primitive costs on TPU: flat vs row sorts, scatter-min, gather.

Findings (v5e): flat 1.5M 2-op sort 1.48 ms; row sort (768,2048) 0.059 ms;
flat scatter-min 10.5 ms; flat gather 11.3 ms -> never un-sort via
gather/scatter; emit sorted order instead (pyramid.py dedup).
"""
import json, sys
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from opengpc_tpu.utils import device_time_per_iter

N = 3 * (1 << 19)   # concat pyramid buffers
HW = 436 * 1024

rng = np.random.default_rng(0)
vals = jnp.asarray(rng.integers(0, HW * 8, N, np.int32))
pix = jnp.asarray(rng.integers(0, HW, N, np.int32))
lev = jnp.asarray(rng.integers(0, 3, N, np.int32))

def dep(s, args):
    a = list(args)
    a[0] = a[0].at[0].set((a[0][0] ^ (s.astype(jnp.int32) & 1)))
    return tuple(a)

def t(step, args, n_long=23):
    return device_time_per_iter(step, args, dep, 3, n_long, repeats=3)

# 1-D flat sort (what the current dedup does)
s = t(lambda v: sum(o.sum(dtype=jnp.int32) for o in jax.lax.sort((v, pix), dimension=0, num_keys=1, is_stable=False)) & 0xFF, (vals,))
print(json.dumps({"exp": "flat_sort_1.5M_2op", "ms": round(s*1e3, 3)}))

# reshaped row sort (needs merge logic, for scale reference)
v2 = vals.reshape(768, 2048)
s = t(lambda v: jax.lax.sort((v,), dimension=1, num_keys=1, is_stable=False)[0].sum(dtype=jnp.int32) & 0xFF, (v2,))
print(json.dumps({"exp": "row_sort_768x2048_1op", "ms": round(s*1e3, 3)}))

# flat scatter-min into HW grid
def scat(p):
    grid = jnp.full((HW,), 0x7FFFFFFF, jnp.int32)
    grid = grid.at[p].min(lev, mode="drop")
    return grid.sum(dtype=jnp.int32) & 0xFF
s = t(scat, (pix,))
print(json.dumps({"exp": "flat_scatter_min_1.5M_to_446k", "ms": round(s*1e3, 3)}))

# flat gather 1.5M from 446k
table = jnp.asarray(rng.integers(0, 8, HW, np.int32))
def gath(p):
    return table[p].sum(dtype=jnp.int32) & 0xFF
s = t(gath, (pix,))
print(json.dumps({"exp": "flat_gather_1.5M_from_446k", "ms": round(s*1e3, 3)}))
