"""Sparse-to-dense disparity densification.

The GPC method emits sparse supports; downstream consumers often want a
dense map (the paper pipelines supports into an edge-preserving
interpolator).  This is a simple TPU-friendly densifier: seed a dense grid
with the supports and run a fixed number of masked Jacobi diffusion
sweeps — unknown pixels take the mean of their already-filled 4-neighbors,
known support pixels stay pinned.  Static shapes, ``lax.fori_loop``, no
data-dependent control flow.

Not a reference component (the reference leaves refinement hooks unused,
buffer.hpp:104-119); provided as an extra, clearly separated from the
parity surface.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("shape", "num_iters"))
def _densify(xs, ys, ds, count, shape: Tuple[int, int], num_iters: int):
    h, w = shape
    idx = jnp.arange(xs.shape[0])
    valid = idx < count
    flat = jnp.where(valid, ys.astype(jnp.int32) * w + xs.astype(jnp.int32), h * w)

    seed_sum = jnp.zeros((h * w + 1,), jnp.float32).at[flat].add(
        jnp.where(valid, ds.astype(jnp.float32), 0.0), mode="drop"
    )
    seed_cnt = jnp.zeros((h * w + 1,), jnp.float32).at[flat].add(
        valid.astype(jnp.float32), mode="drop"
    )
    known = (seed_cnt[: h * w] > 0).reshape(h, w)
    value = jnp.where(
        known, (seed_sum[: h * w] / jnp.maximum(seed_cnt[: h * w], 1.0)).reshape(h, w), 0.0
    )

    def sweep(_, carry):
        val, filled = carry
        f = filled.astype(jnp.float32)
        vsum = (
            jnp.pad(val * f, ((0, 1), (0, 0)))[1:, :]
            + jnp.pad(val * f, ((1, 0), (0, 0)))[:-1, :]
            + jnp.pad(val * f, ((0, 0), (0, 1)))[:, 1:]
            + jnp.pad(val * f, ((0, 0), (1, 0)))[:, :-1]
        )
        nsum = (
            jnp.pad(f, ((0, 1), (0, 0)))[1:, :]
            + jnp.pad(f, ((1, 0), (0, 0)))[:-1, :]
            + jnp.pad(f, ((0, 0), (0, 1)))[:, 1:]
            + jnp.pad(f, ((0, 0), (1, 0)))[:, :-1]
        )
        grown = nsum > 0
        upd = vsum / jnp.maximum(nsum, 1.0)
        # support (seed) pixels stay pinned; every other filled-or-grown
        # pixel RELAXES each sweep (true masked Jacobi — the filled set
        # grows by one ring per sweep and keeps diffusing behind the front)
        new_val = jnp.where(known, val, jnp.where(grown, upd, 0.0))
        return new_val, filled | grown

    value, filled = jax.lax.fori_loop(0, num_iters, sweep, (value, known))
    return value, filled


def densify_supports(
    supports: np.ndarray,
    shape: Tuple[int, int],
    num_iters: int = 64,
):
    """Dense float32 disparity map from (n, 3) supports (x, y, d).

    Returns (disparity (H, W) float32, filled (H, W) bool).  Pixels not
    reached within ``num_iters`` diffusion sweeps stay unfilled (each
    sweep grows the filled region by one 4-neighborhood ring).
    """
    supports = np.asarray(supports).reshape(-1, 3)
    n = max(1, len(supports))
    xs = jnp.asarray(np.resize(supports[:, 0], n).astype(np.int32))
    ys = jnp.asarray(np.resize(supports[:, 1], n).astype(np.int32))
    ds = jnp.asarray(np.resize(supports[:, 2], n).astype(np.int32))
    value, filled = _densify(xs, ys, ds, len(supports), tuple(shape), num_iters)
    return np.asarray(value), np.asarray(filled)
