"""Fused Pallas preprocessing + leaf-code kernel.

One VMEM pass replaces the reference's three separate SSE kernels plus
index compaction (box filter.hpp:293-392, sobel filter.hpp:404-519,
gpcFilter[Tau] filter.hpp:547-683, arr2ind filter.hpp:60-87): a single
kernel loads the halo-padded uint8 image once and emits

* the (H, W) int32 leaf-code image (test 0 at the MSB end, naive-path bit
  order, tau semantics ``a > b - tau``), and
* the (H, W) uint8 candidate mask (binary sobel response with the 13-px
  interior margin).

The box-blurred intermediate lives only in VMEM — it never round-trips
through HBM, which is the point of fusing on a bandwidth-bound chip.  All
forest test offsets are compile-time constants (the analog of readForest
baking offsets into a FilterMask, inference.hpp:404-446), so the 2T
shifted reads compile to static lane/sublane shifts, not gathers.

Semantics are the scalar parity contract (SURVEY.md §7): identical to
ops/preprocess.box3 + sobel3 + candidate_mask and ops/codes.leaf_codes at
every candidate pixel (pinned by tests/test_pallas.py against both the jnp
path and the C++ oracle).

Sizing: the tile height adapts to image width so the per-tile temporaries
stay inside VMEM (see ``_pick_tile_h``); Sintel 1024x436, KITTI 1242x375
and multi-Mpix frames up to ~3000 px wide all fit.  ``fused_codes`` raises
beyond the budget — callers fall back to the jnp path
(infer.build_sparsematch does this automatically).
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

from opengpc_tpu.ops.preprocess import CANDIDATE_MARGIN

PAD = PATCH_HALF + 1       # 13-px code halo + 1-px box/sobel halo
MARGIN = CANDIDATE_MARGIN  # candidate interior margin (inference.hpp:318-325)

# Mosaic stack-allocates ~33 live (tile_h+26, w+26) int32 temporaries for a
# 30-test code loop (measured); tile height adapts to image width so the
# stack stays inside VMEM, and the full padded uint8 input block gets the
# rest.
_TEMP_BYTES_PER_ELEM = 33 * 4
_STACK_BUDGET = 14 * 2**20
_INPUT_BUDGET = 8 * 2**20


class FusedKernelBudgetError(ValueError):
    """Image exceeds the fused kernel's VMEM sizing budget (callers fall
    back to the jnp path on exactly this error, nothing broader)."""


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile_h(w: int) -> int:
    for th in (64, 32, 16, 8):
        if (th + 26) * (w + 26) * _TEMP_BYTES_PER_ELEM <= _STACK_BUDGET:
            return th
    raise FusedKernelBudgetError(
        f"image width {w} exceeds the fused kernel's VMEM budget even at "
        f"8-row tiles; use the jnp path"
    )


def _div9_floor(x32):
    """floor(x / 9) for 0 <= x <= 2295 via multiply-shift — Mosaic has no
    vector integer divide; this is the same trick as the reference's SSE
    ``mulhi(x, 7282)`` (filter.hpp:304,416), exact over the box-sum range."""
    return (x32 * 7282) >> 16


def _div9_trunc(x32):
    """C-truncating x / 9 for |x| <= 2295 (sobel numerators)."""
    q = _div9_floor(jnp.abs(x32))
    return jnp.where(x32 < 0, -q, q)





def tile_codes_and_cand(x32, y0, h, w, th, tests, thr2):
    """In-kernel (codes int32, cand bool) for one (th+28, wp) int32 tile.

    The single source of the contract math for every Pallas kernel (this
    module's split kernel AND ops/fused_match.py): box 3x3 + zeroed
    boundary, <=32 code tests MSB-first, binary sobel + margin-13
    candidates.  tests: tuple of (iy, ix, jy, jx, tau) python ints.
    """
    hc, wc = th + 26, w + 26  # code-support region of this tile

    # --- box 3x3 on the code-support region -----------------------------
    # tile region coord (r, c) = image (y0 + r - 13, c - 13)
    #                          = tile-local padded (r + 1, c + 1)
    total = jnp.zeros((hc, wc), jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            total = total + jax.lax.slice(
                x32, (1 + dy, 1 + dx), (1 + dy + hc, 1 + dx + wc)
            )
    blurred = _div9_floor(total)
    # valid box region (boxNaive + clearBoundary): 1 <= y <= h-3, 2 <= x <= w-2
    rr = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0) + y0
    cc = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    box_valid = (rr >= 14) & (rr <= h + 10) & (cc >= 15) & (cc <= w + 11)
    smooth = jnp.where(box_valid, blurred, jnp.int32(0))  # (hc, wc)

    # --- leaf codes (gpcFilter[Tau] naive semantics) ---------------------
    code = jnp.zeros((th, w), jnp.int32)
    for iy, ix, jy, jx, tau in tests:
        a = jax.lax.slice(smooth, (13 + iy, 13 + ix), (13 + iy + th, 13 + ix + w))
        b = jax.lax.slice(smooth, (13 + jy, 13 + jx), (13 + jy + th, 13 + jx + w))
        bit = (a > b - jnp.int32(tau)).astype(jnp.int32)
        code = code * 2 + bit

    # --- sobel 3x3 on the raw image + margin -> candidate mask ----------
    def raw(dy, dx):
        return jax.lax.slice(
            x32, (PAD + dy, PAD + dx), (PAD + dy + th, PAD + dx + w)
        )

    sx_num = raw(-1, -1) + raw(1, -1) + 2 * raw(0, -1) \
        - raw(-1, 1) - 2 * raw(0, 1) - raw(1, 1)
    sy_num = raw(-1, -1) + raw(-1, 1) + 2 * raw(-1, 0) \
        - raw(1, -1) - 2 * raw(1, 0) - raw(1, 1)
    sx = _div9_trunc(sx_num)  # C truncation (negative-safe)
    sy = _div9_trunc(sy_num)
    grad = sx * sx + sy * sy > jnp.int32(thr2)

    yy = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    interior = (yy >= MARGIN) & (yy < h - MARGIN) & (xx >= MARGIN) & (xx < w - MARGIN)
    return code, grad & interior


def _kernel(img_ref, codes_ref, cand_ref, *, h, w, th, tests, thr2):
    """One row-tile of the fused pipeline.

    ``img_ref`` holds the full halo-padded image in VMEM (uint8, small);
    each grid step reads its tile + 28-row halo with a dynamic row slice
    and writes a (th, w) block of codes and candidates.  Tiling keeps the
    ~2T live int32 slice temporaries at (th+26, wp) instead of image-sized
    (Mosaic stack-allocates them; a whole-image variant OOMs VMEM).
    """
    t = pl.program_id(0)
    y0 = t * th  # first output image row of this tile == padded row offset
    x32 = img_ref[pl.ds(y0, th + 28), :].astype(jnp.int32)
    code, cand = tile_codes_and_cand(x32, y0, h, w, th, tests, thr2)
    codes_ref[:] = code
    cand_ref[:] = cand.astype(jnp.uint8)


def _kernel_keys(img_ref, key_ref, *, h, w, th, tests, thr2, pos_base,
                 sentinel_base):
    """Key-emitting variant: one (th, w) block of sentinel-packed sort keys
    ``candidate ? code : sentinel_base + pos_base + x`` — the exact key
    layout match._match_epipolar_packed builds, fused into the kernel so
    the codes/candidate arrays never round-trip through HBM (measured
    ~0.06 ms/pair saved on v5e, experiments/exp_sort2.py)."""
    t = pl.program_id(0)
    y0 = t * th
    x32 = img_ref[pl.ds(y0, th + 28), :].astype(jnp.int32)
    code, cand = tile_codes_and_cand(x32, y0, h, w, th, tests, thr2)
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1)
    key_ref[:] = jnp.where(cand, code, jnp.int32(sentinel_base + pos_base) + xx)


def _prep(img, mask: FilterMask, gradient_threshold: int):
    """Shared pallas_call scaffolding: padded input + static test tuple."""
    h, w = img.shape
    th = _pick_tile_h(w)
    n_tiles = (h + th - 1) // th
    wp = _round_up(w + 2 * PAD, 128)
    # pad so the last tile's halo read (rows [y0, y0 + th + 28)) stays in
    # bounds: n_tiles * th + 28 rows total
    padded = jnp.pad(
        img,
        ((PAD, n_tiles * th + 28 - h - PAD), (PAD, wp - w - PAD)),
        constant_values=0,
    )
    i_off = np.asarray(mask.i_off)
    j_off = np.asarray(mask.j_off)
    tau = np.asarray(mask.tau)
    tests = tuple(
        (int(i_off[t, 0]), int(i_off[t, 1]), int(j_off[t, 0]), int(j_off[t, 1]),
         int(tau[t]))
        for t in range(mask.num_tests)
    )
    thr2 = int(gradient_threshold) * int(gradient_threshold)
    return padded, h, w, th, n_tiles, tests, thr2


def _fused_codes_impl(img, mask: FilterMask, gradient_threshold: int, interpret: bool):
    padded, h, w, th, n_tiles, tests, thr2 = _prep(img, mask, gradient_threshold)
    kernel = functools.partial(
        _kernel, h=h, w=w, th=th, tests=tests, thr2=thr2,
    )
    codes, cand = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles * th, w), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * th, w), jnp.uint8),
        ),
        in_specs=[
            pl.BlockSpec(padded.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(padded)
    return codes[:h], cand[:h] != 0


def _check_budget(img):
    h, w = img.shape
    _pick_tile_h(w)  # raises for over-wide images
    wp = _round_up(w + 2 * PAD, 128)
    if (h + 2 * PAD + 64) * wp > _INPUT_BUDGET:
        raise FusedKernelBudgetError(
            f"image {h}x{w}: padded input block exceeds the fused kernel's "
            f"VMEM budget; use the jnp path"
        )


def fused_codes(
    img: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(codes int32 (H, W), candidates bool (H, W)) in one fused pass.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests run the
    same kernel logic on CPU).  Raises ValueError for images beyond the
    VMEM sizing budget — use the jnp path for those.
    """
    _check_budget(img)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_codes_impl(img, mask, gradient_threshold, bool(interpret))


def fused_keys(
    img: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    pos_base: int,
    sentinel_base: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(H, W) int32 sentinel-packed matcher sort keys in one fused pass:
    ``candidate ? leaf_code : sentinel_base + pos_base + x``.

    ``pos_base`` is 0 for the source image and W for the target, so the
    concatenated (H, 2W) key image has unique per-row sentinels — exactly
    what match._match_epipolar_packed builds from (codes, candidates), with
    one less HBM round-trip.  Same budget/interpret contract as
    fused_codes."""
    _check_budget(img)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    padded, h, w, th, n_tiles, tests, thr2 = _prep(img, mask, gradient_threshold)
    kernel = functools.partial(
        _kernel_keys, h=h, w=w, th=th, tests=tests, thr2=thr2,
        pos_base=int(pos_base), sentinel_base=int(sentinel_base),
    )
    keys = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((n_tiles * th, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(padded.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((th, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
    )(padded)
    return keys[:h]
