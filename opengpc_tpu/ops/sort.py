"""Pallas row-wise bitonic sort for the matcher (historical A/B artifact).

Round-1 status: beat the then-default STABLE ``lax.sort`` standalone
(0.40 vs 0.47 ms on 436x2048) but lost in-pipeline to fusion.  Round 2
switched the pipeline to UNSTABLE ``lax.sort`` (0.30 ms — XLA's stable
sort adds an iota tiebreaker operand), which this kernel no longer beats
even standalone; kept selectable (``sort_impl="bitonic"``) as a measured
baseline.  This kernel sorts each row of a (R, N) int32 key array
(with an int32 payload) with a fully unrolled bitonic network: log2(N)
stages of compare-exchange, each implemented as a circular roll + select
across lanes — no data-dependent control flow, everything in VMEM.

Ordering: by key only, NOT stable — equal keys never swap, but bitonic
exchanges may deliver an equal run's elements in any relative order.  The
matcher therefore recovers the src/tar role of each element of a pair
from the position payload (min/max normalization in
match._match_epipolar_packed), never from the order within the run.

N must be a power of two; the matcher pads rows with unique max-range
sentinel keys (they sort to the end and can never pair).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; keys+payload+pass temps stay ~10 * TR * N * 4 bytes
TILE_R = 16


def bitonic_network(s: jnp.ndarray, tr: int, n: int) -> jnp.ndarray:
    """Fully unrolled bitonic network over the stacked (2*tr, n) array
    ``s`` = [key rows; payload rows].  Keys-only comparator, in-kernel use
    (called by this module's kernel AND ops/fused_match.py — the single
    source of the sort network)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, n), 1)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (2 * tr, n), 1)

    size = 2
    while size <= n:
        asc = (lane & size) == 0
        j = size >> 1
        while j > 0:
            low = (lane & j) == 0
            low2 = (lane2 & j) == 0
            # pltpu.roll requires non-negative shifts; roll(n - j) == roll(-j)
            o = jnp.where(low2, pltpu.roll(s, n - j, 1), pltpu.roll(s, j, 1))
            k, ok = s[:tr], o[:tr]
            keep_min = low == asc
            # keys-only comparator: equal keys never swap (each side keeps
            # itself), so no payload tie-break is needed — the matcher only
            # requires equal keys to end up adjacent, and recovers the
            # src/tar role from the position payload, not from order.
            take = (keep_min & (ok < k)) | (~keep_min & (ok > k))
            take2 = jnp.concatenate([take, take], axis=0)
            s = jnp.where(take2, o, s)
            j >>= 1
        size <<= 1
    return s


def _kernel(key_ref, pay_ref, key_out, pay_out, *, n, tr):
    # stack key and payload row-blocks into ONE array: lane rolls act
    # per-row, so each compare-exchange pass needs 2 rolls instead of 4
    s = bitonic_network(
        jnp.concatenate([key_ref[:], pay_ref[:]], axis=0), tr, n
    )
    key_out[:] = s[:tr]
    pay_out[:] = s[tr:]


def bitonic_sort_rows(
    key: jnp.ndarray, payload: jnp.ndarray, interpret: Optional[bool] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort each row of (R, N) int32 ``key`` ascending (equal keys in
    unspecified relative order), permuting ``payload`` alongside.  N must
    be a power of two >= 256.
    """
    r, n = key.shape
    if n & (n - 1) or n < 256:
        raise ValueError(f"row length {n} must be a power of two >= 256")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tile = min(TILE_R, r)
    pad_r = (-r) % tile
    if pad_r:
        key = jnp.pad(key, ((0, pad_r), (0, 0)), constant_values=0x7FFFFFFF)
        payload = jnp.pad(payload, ((0, pad_r), (0, 0)))
    rp = key.shape[0]

    kernel = functools.partial(_kernel, n=n, tr=tile)
    key_s, pay_s = pl.pallas_call(
        kernel,
        grid=(rp // tile,),
        out_shape=(
            jax.ShapeDtypeStruct((rp, n), jnp.int32),
            jax.ShapeDtypeStruct((rp, n), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(key.astype(jnp.int32), payload.astype(jnp.int32))
    return key_s[:r], pay_s[:r]
