"""Fully fused epipolar match kernel: filter + traverse + sort in one pass.

One Pallas program per row-tile does everything between raw uint8 pixels
and per-row match candidates (the BASELINE north-star's "fused
filter+traverse+sort"): box blur, sobel candidates, the <=32 pixel-pair
tests, sentinel-key construction, a keys-only bitonic row sort, and
unique-collision pair detection.  Leaf codes, candidate masks, and sort
keys never touch HBM — the kernel reads the two halo-padded images and
writes only the (keep, src_x, d) pair buffers that the jnp compaction
consumes.

Constraints (callers fall back to the split pipeline otherwise):
* epipolar mode, <= 30 tests (sentinel packing), pow2-padded row length;
* same VMEM sizing rules as ops/fused.py, shared via _pick_tile_h.

Semantics equal the split pipeline exactly (ops/fused.py codes +
match._match_epipolar_packed); pinned by tests/test_fused_match.py in
interpret mode and verified support-identical on TPU.

Measured on v5e (Sintel-sized pair, defaultZeroForest): 0.90 ms/pair vs
0.68 ms for the split pipeline — XLA's lax.sort outruns the in-kernel
bitonic network by more than fusion saves in HBM traffic, so the split
pipeline remains the default (`_sparsematch_impl(fused_match=False)`).
Kept as a supported, tested alternative: it demonstrates the fully fused
path and may win on other chip generations or row lengths.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengpc_tpu.forest import FilterMask, PATCH_HALF
from opengpc_tpu.ops.fused import (
    FusedKernelBudgetError,
    PAD,
    _round_up,
    tile_codes_and_cand,
)
from opengpc_tpu.ops.sort import bitonic_network

SENTINEL_BASE = 0x40000000
PAD_KEY_BASE = 0x7F000000


def _kernel(left_ref, right_ref, keep_ref, srcx_ref, d_ref, *,
            h, w, th, n2, tests, thr2, disp_high):
    t = pl.program_id(0)
    y0 = t * th
    xl = left_ref[pl.ds(y0, th + 28), :].astype(jnp.int32)
    xr = right_ref[pl.ds(y0, th + 28), :].astype(jnp.int32)

    # shared contract math (ops/fused.py) — one source for all kernels
    code_l, cand_l = tile_codes_and_cand(xl, y0, h, w, th, tests, thr2)
    code_r, cand_r = tile_codes_and_cand(xr, y0, h, w, th, tests, thr2)

    pos2 = jax.lax.broadcasted_iota(jnp.int32, (th, 2 * w), 1)
    key = jnp.where(
        jnp.concatenate([cand_l, cand_r], axis=1),
        jnp.concatenate([code_l, code_r], axis=1),
        SENTINEL_BASE + pos2,
    )
    if n2 > 2 * w:
        padpos = jax.lax.broadcasted_iota(jnp.int32, (th, n2 - 2 * w), 1) + 2 * w
        key = jnp.concatenate([key, PAD_KEY_BASE + padpos], axis=1)
        pos = jnp.concatenate([pos2, padpos], axis=1)
    else:
        pos = pos2

    # --- keys-only bitonic sort with position payload (shared network) --
    s = bitonic_network(jnp.concatenate([key, pos], axis=0), th, n2)
    key_s, pos_s = s[:th], s[th:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, n2), 1)

    # --- unique-collision pair detection (match._match_epipolar_packed) --
    nxt_k = pltpu.roll(key_s, n2 - 1, 1)   # key_s[i+1] (wraps at row end)
    prv_k = pltpu.roll(key_s, 1, 1)        # key_s[i-1]
    nxt2_k = pltpu.roll(key_s, n2 - 2, 1)  # key_s[i+2]
    last = lane >= n2 - 1
    eq_i = (key_s == nxt_k) & ~last                    # eq[i]
    eq_prev = (prv_k == key_s) & (lane >= 1)           # eq[i-1]
    eq_next = (nxt_k == nxt2_k) & (lane < n2 - 2)      # eq[i+1]
    pair = eq_i & ~eq_prev & ~eq_next

    nxt_p = pltpu.roll(pos_s, n2 - 1, 1)
    lo = jnp.minimum(pos_s, nxt_p)
    hi = jnp.maximum(pos_s, nxt_p)
    cross = (lo < w) & (hi >= w) & (hi < 2 * w)
    src_x = lo
    d = lo - (hi - w)
    keep = pair & cross & (jnp.abs(d) <= disp_high)

    keep_ref[:] = keep.astype(jnp.uint8)
    srcx_ref[:] = jnp.where(keep, src_x, 0)
    d_ref[:] = jnp.where(keep, d, 0)


def fused_sparsematch_rows(
    left: jnp.ndarray,
    right: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    disp_high: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(keep bool (H, N2), src_x int32, d int32) per-row match candidates
    from two raw uint8 images, fully fused.  Raises FusedKernelBudgetError
    beyond the sizing budget."""
    from opengpc_tpu.ops.fused import _INPUT_BUDGET, _pick_tile_h

    h, w = left.shape
    if mask.num_tests > 30:
        raise FusedKernelBudgetError("fused match needs <= 30 tests")
    th = min(_pick_tile_h(w), 16)  # sort temps cap the tile height too
    n2 = max(256, 1 << (2 * w - 1).bit_length())
    n_tiles = (h + th - 1) // th
    wp = _round_up(w + 2 * PAD, 128)
    if (n_tiles * th + 28) * wp * 2 > _INPUT_BUDGET:
        raise FusedKernelBudgetError("padded inputs exceed VMEM budget")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def pad_img(img):
        return jnp.pad(
            img, ((PAD, n_tiles * th + 28 - h - PAD), (PAD, wp - w - PAD))
        )

    i_off = np.asarray(mask.i_off)
    j_off = np.asarray(mask.j_off)
    tau = np.asarray(mask.tau)
    tests = tuple(
        (int(i_off[t, 0]), int(i_off[t, 1]), int(j_off[t, 0]), int(j_off[t, 1]),
         int(tau[t]))
        for t in range(mask.num_tests)
    )
    kernel = functools.partial(
        _kernel, h=h, w=w, th=th, n2=n2, tests=tests,
        thr2=int(gradient_threshold) ** 2, disp_high=int(disp_high),
    )
    keep, src_x, d = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * th, n2), jnp.uint8),
            jax.ShapeDtypeStruct((n_tiles * th, n2), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * th, n2), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((n_tiles * th + 28, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles * th + 28, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((th, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, n2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pad_img(left), pad_img(right))
    return keep[:h] != 0, src_x[:h], d[:h]
