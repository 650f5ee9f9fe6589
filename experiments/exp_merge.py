"""Bound for a jnp-composed bitonic-merge global sort (the last unexplored
idea against the global-mode flat-sort floor).

Scheme: per-row 2-op sort of (512, 2048) (~0.35 ms) then merge the 512
sorted rows with a bitonic merge network: round k (k=0..8) needs
log2(2*2048*2^k) = 12+k compare-exchange passes -> 144 passes total.
This measures the unit cost of one pass (reshape + select min/max with
payload) at a mid and a small stride, and the monolithic flat 2-op sort
it would have to beat.

Measured on v5e: one pass 5.3 us (stride 256) / 8.7 us (stride 64);
144 passes ~= 0.8-1.2 ms + 0.35 ms pre-sort >= 1.1 ms vs 0.80 ms for
lax.sort on the same (1M, 2-operand) data -- the composed network loses
by ~1.4-2x before even accounting for the cross-row rounds' row
reversals.  XLA's monolithic sort keeps its passes fused in VMEM; a
jnp-composed network cannot beat it from outside.  Dead end recorded in
the README ledger.

Run on the TPU: python experiments/exp_merge.py
"""
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.utils import device_time_per_iter

R, C = 512, 2048
rng = np.random.default_rng(0)
key = rng.integers(0, 1 << 30, (R, C), dtype=np.int32)
pos = rng.integers(0, 1 << 20, (R, C), dtype=np.int32)


def dep(s, args):
    a, b = args
    return (a.at[0, 0].set(s.astype(jnp.int32) & 1), b)


def pass_intra(k, p, s):
    k4 = k.reshape(R, C // (2 * s), 2, s)
    p4 = p.reshape(R, C // (2 * s), 2, s)
    a, b = k4[:, :, 0], k4[:, :, 1]
    pa, pb = p4[:, :, 0], p4[:, :, 1]
    swap = a > b
    k2 = jnp.stack([jnp.where(swap, b, a), jnp.where(swap, a, b)],
                   axis=2).reshape(R, C)
    p2 = jnp.stack([jnp.where(swap, pb, pa), jnp.where(swap, pa, pb)],
                   axis=2).reshape(R, C)
    return k2, p2


for name, fn, n_long in (
    ("one_strided_pass_s256",
     lambda k, p: sum(t.sum(dtype=jnp.int32) for t in pass_intra(k, p, 256)),
     43),
    ("one_strided_pass_s64",
     lambda k, p: sum(t.sum(dtype=jnp.int32) for t in pass_intra(k, p, 64)),
     43),
    ("flat_2op_sort_1M",
     lambda k, p: sum(t.sum(dtype=jnp.int32) for t in jax.lax.sort(
         (k.reshape(-1), p.reshape(-1)), dimension=0, num_keys=1,
         is_stable=False)),
     23),
):
    sec = device_time_per_iter(fn, (key, pos), dep, 3, n_long, repeats=5)
    print(json.dumps({"exp": name, "us": round(sec * 1e6, 1)}), flush=True)
