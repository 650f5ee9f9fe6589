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

Sizing: the image stays HBM-resident (``pl.ANY``) and each grid step DMAs
one (64+32, 1024+128) halo tile into a VMEM scratch (``_fetch_tile``), so
the per-tile temporaries AND the input footprint are constants — any
resolution runs on the kernel (Sintel through 4K measured,
experiments/exp_scale.py).  The FusedKernelBudgetError fallback machinery
remains for ops/fused_match.py, whose whole-row in-VMEM sort keeps a
width budget.
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

from opengpc_tpu.ops.preprocess import CANDIDATE_MARGIN, require_u8

PAD = PATCH_HALF + 1       # 13-px code halo + 1-px box/sobel halo
MARGIN = CANDIDATE_MARGIN  # candidate interior margin (inference.hpp:318-325)

# Mosaic stack-allocates ~33 live (tile_h+26, tile_w+26) int32 temporaries
# for a 30-test code loop (measured); tile height adapts to TILE width so
# the stack stays inside VMEM.  This module's kernels cap tile width at
# 1024 (input arrives per-tile via DMA, _fetch_tile), so they always get
# tile_h=64; ops/fused_match.py passes full rows and still budgets its
# whole-row in-VMEM inputs against _INPUT_BUDGET.
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





def tile_codes_and_cand(x32, y0, h, w, th, tests, thr2, x0=0, tw=None):
    """In-kernel (codes int32, cand bool) for one (th+28, >=tw+28) int32
    tile whose first output pixel is image (y0, x0).

    The single source of the contract math for every Pallas kernel (this
    module's split kernel AND ops/fused_match.py): box 3x3 + zeroed
    boundary, <=32 code tests MSB-first, binary sobel + margin-13
    candidates.  tests: tuple of (iy, ix, jy, jx, tau) python ints.
    ``tw`` defaults to full-row tiles (x0=0, tw=w — how fused_match.py
    calls it); the 2-D-tiled kernels below pass a column offset.
    """
    if tw is None:
        tw = w
    hc, wc = th + 26, tw + 26  # code-support region of this tile

    # --- box 3x3 on the code-support region -----------------------------
    # tile region coord (r, c) = image (y0 + r - 13, x0 + c - 13)
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
    cc = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1) + x0
    box_valid = (rr >= 14) & (rr <= h + 10) & (cc >= 15) & (cc <= w + 11)
    smooth = jnp.where(box_valid, blurred, jnp.int32(0))  # (hc, wc)

    # --- leaf codes (gpcFilter[Tau] naive semantics) ---------------------
    code = jnp.zeros((th, tw), jnp.int32)
    for iy, ix, jy, jx, tau in tests:
        a = jax.lax.slice(smooth, (13 + iy, 13 + ix), (13 + iy + th, 13 + ix + tw))
        b = jax.lax.slice(smooth, (13 + jy, 13 + jx), (13 + jy + th, 13 + jx + tw))
        bit = (a > b - jnp.int32(tau)).astype(jnp.int32)
        code = code * 2 + bit

    # --- sobel 3x3 on the raw image + margin -> candidate mask ----------
    def raw(dy, dx):
        return jax.lax.slice(
            x32, (PAD + dy, PAD + dx), (PAD + dy + th, PAD + dx + tw)
        )

    sx_num = raw(-1, -1) + raw(1, -1) + 2 * raw(0, -1) \
        - raw(-1, 1) - 2 * raw(0, 1) - raw(1, 1)
    sy_num = raw(-1, -1) + raw(-1, 1) + 2 * raw(-1, 0) \
        - raw(1, -1) - 2 * raw(1, 0) - raw(1, 1)
    sx = _div9_trunc(sx_num)  # C truncation (negative-safe)
    sy = _div9_trunc(sy_num)
    grad = sx * sx + sy * sy > jnp.int32(thr2)

    yy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + y0
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + x0
    interior = (yy >= MARGIN) & (yy < h - MARGIN) & (xx >= MARGIN) & (xx < w - MARGIN)
    return code, grad & interior


# DMA halo sizes, rounded up from the true needs (28 rows / 28 cols) to
# Mosaic's uint8 memory-tiling alignments: copy extents must be multiples
# of the (32, 128) tile (a 92-row slice fails to compile: "slice shape
# along dimension 0 must be aligned to tiling").  Offsets i*th / j*tw are
# multiples of 64 / 1024, already aligned.
_HALO_R = 32
_HALO_C = 128


def _fetch_tile(img_ref, scratch, sem, th, tw):
    """DMA this grid step's (th+32, tw+128) halo tile from the HBM-resident
    padded image into VMEM scratch and return it as int32.

    The input stays in HBM (``pl.ANY``) and each tile copies only its halo
    window, so VMEM holds one tile + the temp stack regardless of image
    size — this is what removes the old whole-image-in-VMEM budget cliff
    (4K fell back to the jnp path).  The kernels consume the leading
    (th+28, tw+28) region via static slices; the alignment surplus rows/
    cols are dead weight in the copy only."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        img_ref.at[pl.ds(i * th, th + _HALO_R), pl.ds(j * tw, tw + _HALO_C)],
        scratch, sem,
    )
    dma.start()
    dma.wait()
    return scratch[...].astype(jnp.int32)


def _kernel(img_ref, codes_ref, cand_ref, scratch, sem, *, h, w, th, tw,
            tests, thr2):
    """One (th, tw) tile of the fused pipeline.

    Tiling keeps the ~33 live (th+26, tw+26) int32 slice temporaries
    bounded (Mosaic stack-allocates them; a whole-image variant OOMs
    VMEM) and the DMA fetch keeps the input out of VMEM entirely.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    x32 = _fetch_tile(img_ref, scratch, sem, th, tw)
    code, cand = tile_codes_and_cand(x32, i * th, h, w, th, tests, thr2,
                                     x0=j * tw, tw=tw)
    codes_ref[:] = code
    cand_ref[:] = cand.astype(jnp.uint8)


def _kernel_keys(img_ref, key_ref, scratch, sem, *, h, w, th, tw, tests,
                 thr2, pos_base, sentinel_base, pack_bits=0):
    """Key-emitting variant: one (th, tw) block of sentinel-packed sort
    keys ``candidate ? code : sentinel_base + pos_base + x`` — the exact
    key layout match._match_epipolar_packed builds, fused into the kernel
    so the codes/candidate arrays never round-trip through HBM (measured
    ~0.06 ms/pair saved on v5e, experiments/exp_sort2.py).

    ``pack_bits > 0`` (small forests, match._pack_ok): candidates emit the
    SINGLE-OPERAND sort key ``(code << pack_bits) | (pos_base + x)``
    directly — match._pack_keypos's layout, saving its (H, 2W)
    elementwise pass (VERDICT r4 #7; A/B experiments/exp_keypack.py)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x32 = _fetch_tile(img_ref, scratch, sem, th, tw)
    code, cand = tile_codes_and_cand(x32, i * th, h, w, th, tests, thr2,
                                     x0=j * tw, tw=tw)
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    if pack_bits:
        cand_key = (code << pack_bits) | (jnp.int32(pos_base) + xx)
    else:
        cand_key = code
    key_ref[:] = jnp.where(cand, cand_key,
                           jnp.int32(sentinel_base + pos_base) + xx)


def _tile_geom(out_h: int, w: int, tile=None):
    """Tile choice + grid for every DMA-tiled kernel — the ONE place the
    Mosaic alignment invariants live: DMA offsets i*th / j*tw and copy
    extents must be multiples of the uint8 memory tile (_HALO_R, _HALO_C);
    an unaligned offset/extent fails to compile only on real TPU,
    invisible to the interpret-mode suite.  Returns (th, tw, n_rt, n_ct)."""
    if tile is not None:
        th, tw = tile
    else:
        tw = min(_round_up(w, 128), 1024)
        th = _pick_tile_h(tw)
    assert th % _HALO_R == 0, (th, _HALO_R)
    assert tw % _HALO_C == 0, (tw, _HALO_C)
    return th, tw, (out_h + th - 1) // th, (w + tw - 1) // tw


def mask_tests(mask: FilterMask):
    """The forest's tests as a static tuple of python ints
    (iy, ix, jy, jx, tau) — the compile-time constants every kernel bakes
    in (the analog of readForest's FilterMask, inference.hpp:404-446)."""
    i_off = np.asarray(mask.i_off)
    j_off = np.asarray(mask.j_off)
    tau = np.asarray(mask.tau)
    return tuple(
        (int(i_off[t, 0]), int(i_off[t, 1]), int(j_off[t, 0]),
         int(j_off[t, 1]), int(tau[t]))
        for t in range(mask.num_tests)
    )


def _prep(img, mask: FilterMask, gradient_threshold: int, tile=None):
    """Shared pallas_call scaffolding: padded input + static test tuple.

    Tiles are (th, tw) with tw capped at 1024 — narrow enough that the
    temp stack always admits th=64, wide enough that lane-dim DMA offsets
    (multiples of tw) stay 128-aligned.  ``tile=(th, tw)`` overrides the
    choice (experiments/exp_tile.py A/Bs tile aspect ratios)."""
    require_u8(img)
    h, w = img.shape
    th, tw, n_rt, n_ct = _tile_geom(h, w, tile)
    # pad so every tile's halo read (rows [i*th, i*th + th + _HALO_R),
    # cols [j*tw, j*tw + tw + _HALO_C)) stays in bounds
    padded = jnp.pad(
        img,
        ((PAD, n_rt * th + _HALO_R - h - PAD),
         (PAD, n_ct * tw + _HALO_C - w - PAD)),
        constant_values=0,
    )
    tests = mask_tests(mask)
    thr2 = int(gradient_threshold) * int(gradient_threshold)
    return padded, h, w, th, tw, n_rt, n_ct, tests, thr2


def _tile_scratch(th, tw):
    return [
        pltpu.VMEM((th + _HALO_R, tw + _HALO_C), jnp.uint8),
        pltpu.SemaphoreType.DMA(()),
    ]


def _fused_codes_impl(img, mask: FilterMask, gradient_threshold: int, interpret: bool):
    padded, h, w, th, tw, n_rt, n_ct, tests, thr2 = _prep(
        img, mask, gradient_threshold)
    kernel = functools.partial(
        _kernel, h=h, w=w, th=th, tw=tw, tests=tests, thr2=thr2,
    )
    codes, cand = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        out_shape=(
            jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.int32),
            jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.uint8),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=_tile_scratch(th, tw),
        interpret=interpret,
    )(padded)
    return codes[:h, :w], cand[:h, :w] != 0


def fused_codes(
    img: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(codes int32 (H, W), candidates bool (H, W)) in one fused pass.

    ``interpret=None`` auto-selects interpreter mode off-TPU (tests run the
    same kernel logic on CPU).  Any resolution runs on the kernel (the
    input is HBM-resident; tiles are fetched per grid step, _fetch_tile).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_codes_impl(img, mask, gradient_threshold, bool(interpret))


def _kernel_census(img_ref, code_ref, scratch, sem, *, h, w, th, tw):
    """One (th, tw) tile of the 5x5 census transform — the fused-kernel
    recast of the reference's SSE census (filter.hpp:722-818; scalar
    contract filter.hpp:692-712, implemented by ops/census.census5x5):
    24-bit codes, bit i set iff neighbor > center, px-major scan skipping
    the center.  Same per-tile HBM DMA pattern as the code kernels (the
    PAD-row halo is reused; census only needs 2 of its 14 rows)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x32 = _fetch_tile(img_ref, scratch, sem, th, tw)
    center = jax.lax.slice(x32, (PAD, PAD), (PAD + th, PAD + tw))
    # accumulate MSB-first with code*2 + bit (the proven Mosaic pattern of
    # tile_codes_and_cand) — the obvious `code | where(pred, 1<<bit, 0)`
    # formulation compiles but MISCOMPILES on real TPU (interpret-mode
    # clean, device output wrong; caught by the r4 TPU differential).
    # Neighbor scan is px-major with bit i at the i-th neighbor, so the
    # MSB-first walk runs the scan in reverse.
    neighbors = [(px, py) for px in range(-2, 3) for py in range(-2, 3)
                 if not (px == 0 and py == 0)]
    code = jnp.zeros((th, tw), jnp.int32)
    for px, py in reversed(neighbors):
        nb = jax.lax.slice(
            x32, (PAD + py, PAD + px), (PAD + py + th, PAD + px + tw)
        )
        code = code * 2 + (nb > center).astype(jnp.int32)
    yy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + i * th
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    valid = (yy >= 2) & (yy <= h - 4) & (xx >= 2) & (xx <= w - 3)
    code_ref[:] = jnp.where(valid, code, jnp.int32(0))


def fused_census(img: jnp.ndarray, interpret: Optional[bool] = None) -> jnp.ndarray:
    """(H, W) int32 dense 5x5 census codes in one DMA-tiled Pallas pass —
    pixel-identical to ops/census.census5x5 (itself oracle-gated in
    tests/test_parity.py).  Same interpret/any-resolution contract as
    fused_codes."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = img.shape
    th, tw, n_rt, n_ct = _tile_geom(h, w)
    padded = jnp.pad(
        img,
        ((PAD, n_rt * th + _HALO_R - h - PAD),
         (PAD, n_ct * tw + _HALO_C - w - PAD)),
        constant_values=0,
    )
    kernel = functools.partial(_kernel_census, h=h, w=w, th=th, tw=tw)
    codes = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        out_shape=jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_tile_scratch(th, tw),
        interpret=bool(interpret),
    )(padded)
    return codes[:h, :w]


def fused_keys(
    img: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    pos_base: int,
    sentinel_base: int,
    interpret: Optional[bool] = None,
    tile=None,
    pack_bits: int = 0,
) -> jnp.ndarray:
    """(H, W) int32 sentinel-packed matcher sort keys in one fused pass:
    ``candidate ? leaf_code : sentinel_base + pos_base + x``.

    ``pos_base`` is 0 for the source image and W for the target, so the
    concatenated (H, 2W) key image has unique per-row sentinels — exactly
    what match._match_epipolar_packed builds from (codes, candidates), with
    one less HBM round-trip.  Same interpret/any-resolution contract as
    fused_codes.  ``pack_bits > 0`` emits candidates already pos-packed
    for the single-operand sort (match._pack_keypos layout — the caller
    must satisfy match._pack_ok)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    padded, h, w, th, tw, n_rt, n_ct, tests, thr2 = _prep(
        img, mask, gradient_threshold, tile=tile)
    kernel = functools.partial(
        _kernel_keys, h=h, w=w, th=th, tw=tw, tests=tests, thr2=thr2,
        pos_base=int(pos_base), sentinel_base=int(sentinel_base),
        pack_bits=int(pack_bits),
    )
    keys = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        out_shape=jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_tile_scratch(th, tw),
        interpret=bool(interpret),
    )(padded)
    return keys[:h, :w]


def _kernel_keys_slab(y0_ref, img_ref, key_ref, scratch, sem, *, h, w, th,
                      tw, tests, thr2, pos_base, sentinel_base):
    """Slab variant of _kernel_keys for row-sharded single-frame matching:
    the slab's first output row sits at global image row ``y0_ref[0]``
    (an SMEM scalar — traced per shard under shard_map), and all
    row-coordinate math (box boundary clearing, candidate margin) runs in
    GLOBAL coordinates against the full image height ``h``, so a shard's
    keys are bit-identical to the same rows of a single-device run."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    x32 = _fetch_tile(img_ref, scratch, sem, th, tw)
    code, cand = tile_codes_and_cand(
        x32, y0_ref[0] + i * th, h, w, th, tests, thr2, x0=j * tw, tw=tw
    )
    xx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + j * tw
    key_ref[:] = jnp.where(cand, code, jnp.int32(sentinel_base + pos_base) + xx)


def fused_keys_slab(
    slab: jnp.ndarray,
    mask: FilterMask,
    gradient_threshold: int,
    pos_base: int,
    sentinel_base: int,
    y0,
    h_total: int,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Sentinel-packed matcher keys for a ROW SLAB of a larger image —
    the per-shard kernel of the single-frame multi-chip path
    (parallel.build_sharded_frame_sparsematch), the TPU-native recast of
    the reference's parFor row partitioning (filter.hpp:128-145,601-604).

    ``slab``: (sh + 2*PAD, W) uint8 holding global rows
    [y0 - PAD, y0 + sh + PAD) of the image (zeros where outside — exactly
    the zero padding a single-device run sees at the image border; interior
    shards get real neighbor rows via halo exchange).  ``y0`` may be a
    traced scalar (``lax.axis_index`` under shard_map); ``h_total`` is the
    static full-image height.  Returns the (sh, W) key block — bit-equal
    to rows [y0, y0+sh) of fused_keys on the full image.
    """
    require_u8(slab)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sh = slab.shape[0] - 2 * PAD
    w = slab.shape[1]
    assert sh >= 1, slab.shape
    th, tw, n_rt, n_ct = _tile_geom(sh, w)
    # the slab already carries its PAD rows of top context (halo); pad the
    # bottom/right only up to the tiles' DMA reach
    padded = jnp.pad(
        slab,
        ((0, n_rt * th + _HALO_R - sh - 2 * PAD),
         (PAD, n_ct * tw + _HALO_C - w - PAD)),
        constant_values=0,
    )
    kernel = functools.partial(
        _kernel_keys_slab, h=int(h_total), w=w, th=th, tw=tw,
        tests=mask_tests(mask),
        thr2=int(gradient_threshold) * int(gradient_threshold),
        pos_base=int(pos_base), sentinel_base=int(sentinel_base),
    )
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    keys = pl.pallas_call(
        kernel,
        grid=(n_rt, n_ct),
        out_shape=jax.ShapeDtypeStruct((n_rt * th, n_ct * tw), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((th, tw), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=_tile_scratch(th, tw),
        interpret=bool(interpret),
    )(y0_arr, padded)
    return keys[:sh, :w]
