"""Multi-scale pyramid sparse matching (BASELINE.json config 3).

The reference operates at a single scale; the GPC paper and the BASELINE
configs call for multi-scale matching: run the same forest at each level
of a mean-pooled image pyramid and merge the supports, scaling coordinates
and disparities back to level 0.  Coarse levels see disparities beyond
``disp_high`` and add coverage in low-texture regions; all levels execute
inside one jitted program (each level is just a smaller dense pipeline —
no data-dependent shapes).

Downscale: exact 2x2 mean with floor((a+b+c+d)/4) on uint8 — deterministic
integer semantics, testable bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import FilterMask, Forest, make_filter_mask
from opengpc_tpu.infer import _sparsematch_impl


def downscale2(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) uint8 -> (H//2, W//2) uint8 by 2x2 mean (floor)."""
    h, w = img.shape
    h2, w2 = h // 2, w // 2
    x = img[: 2 * h2, : 2 * w2].astype(jnp.int16)
    pooled = (
        x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2] + x[1::2, 1::2]
    ) // 4
    return pooled.astype(jnp.uint8)


def _pyramid_impl(left, right, mask: FilterMask, settings: InferenceSettings,
                  num_levels: int, use_pallas: bool, dedup: bool):
    xs_all, ys_all, ds_all, lv_all = [], [], [], []
    l_img, r_img = left, right
    for level in range(num_levels):
        xs, ys, ds, count = _sparsematch_impl(
            l_img, r_img, mask=mask, settings=settings, use_pallas=use_pallas
        )
        scale = 1 << level
        xs_all.append(xs.astype(jnp.int32) * scale)
        ys_all.append(ys.astype(jnp.int32) * scale)
        ds_all.append(ds.astype(jnp.int32) * scale)
        lv_all.append(jnp.full_like(xs, level))
        # zero out slots beyond this level's count so merged buffers carry
        # no stale coordinates
        valid = jnp.arange(xs.shape[0]) < count
        xs_all[-1] = jnp.where(valid, xs_all[-1], 0)
        ys_all[-1] = jnp.where(valid, ys_all[-1], 0)
        ds_all[-1] = jnp.where(valid, ds_all[-1], 0)
        lv_all[-1] = jnp.where(valid, lv_all[-1], -1)
        if level + 1 < num_levels:
            l_img = downscale2(l_img)
            r_img = downscale2(r_img)
    xs_c = jnp.concatenate(xs_all)
    ys_c = jnp.concatenate(ys_all)
    ds_c = jnp.concatenate(ds_all)
    lv_c = jnp.concatenate(lv_all)
    if dedup:
        # cross-level merge policy: FINEST LEVEL WINS.  A level-0 pixel can
        # also match (with scaled coordinates landing on the same (x, y))
        # at coarser levels with a conflicting disparity; keep only the
        # lowest-level support per pixel.  Sort (pixel, level) keys, keep
        # the first entry of each pixel run, scatter the mask back.
        h0, w0 = left.shape
        mult = 1
        while mult <= num_levels:
            mult <<= 1
        valid = lv_c >= 0
        pix = ys_c * w0 + xs_c
        sentinel = jnp.int32(h0 * w0 * mult)
        key = jnp.where(valid, pix * mult + lv_c, sentinel)
        order = jnp.argsort(key)
        sk = key[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), sk[1:] // mult != sk[:-1] // mult]
        )
        keep_sorted = first & (sk < sentinel)
        keep = jnp.zeros_like(valid).at[order].set(keep_sorted)
        xs_c = jnp.where(keep, xs_c, 0)
        ys_c = jnp.where(keep, ys_c, 0)
        ds_c = jnp.where(keep, ds_c, 0)
        lv_c = jnp.where(keep, lv_c, -1)
    # per-level counts of the supports actually emitted (post-dedup)
    counts = jnp.stack(
        [jnp.sum(lv_c == level) for level in range(num_levels)]
    )
    return xs_c, ys_c, ds_c, lv_c, counts


def build_pyramid_sparsematch(
    forest_or_mask,
    settings: InferenceSettings,
    num_levels: int = 3,
    use_pallas: Optional[bool] = None,
    dedup: bool = True,
) -> Callable:
    """Jitted ``(left, right) -> (x, y, d, level, counts)`` pyramid matcher.

    Outputs are level-0 coordinates/disparities; ``level[i]`` tells which
    pyramid level produced support i (-1 marks empty slots), ``counts`` is
    the per-level count of emitted supports.  With ``dedup`` (default) the
    merge policy is finest-level-wins: at most one support per (x, y), and
    a level-0 support is never overridden by a coarser level.  Works on
    (H, W) images and (B, H, W) batches via vmap, like build_sparsematch.
    """
    mask = (
        make_filter_mask(forest_or_mask)
        if isinstance(forest_or_mask, Forest)
        else forest_or_mask
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    fn = functools.partial(
        _pyramid_impl, mask=mask, settings=settings,
        num_levels=num_levels, use_pallas=use_pallas, dedup=dedup,
    )

    @jax.jit
    def run(left, right):
        if left.ndim == 3:
            return jax.vmap(fn)(left, right)
        return fn(left, right)

    return run


def pyramid_supports_to_numpy(xs, ys, ds, levels, counts) -> np.ndarray:
    """Trim merged pyramid buffers to an (n, 4) int array of
    (x, y, d, level) rows (empty slots dropped).  With the default dedup
    policy the rows contain at most one support per (x, y)."""
    lv = np.asarray(levels)
    keep = lv >= 0
    return np.stack(
        [np.asarray(xs)[keep], np.asarray(ys)[keep], np.asarray(ds)[keep],
         lv[keep]],
        axis=1,
    ).astype(np.int32)
