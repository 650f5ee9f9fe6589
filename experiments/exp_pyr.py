"""Pyramid per-level matcher A/B: rows vs masked vs chunk-compacted.

The production pyramid (`pyramid._pyramid_rows_impl`) runs the ROW-FORM
matcher per level: key-image row sort + a per-level `_row_pack` sort,
then one flat dedup sort over W-width per-level buffers.  Two candidate
replacements trade those stages differently:

  masked  — per level: ONE row sort + masked emit (no pack sort), but the
      dedup keys come from the full (H, 2W+1) masked buffer, ~2x the
      rows path's W-width buffers, so the final flat dedup sort doubles.
  compact — per level: strided chunk sort + narrow (nc*k = W) row sort
      (match_epipolar_masked_compact), no pack sort AND W-width dedup
      keys; exact only while the per-chunk overflow guard stays False
      (dense scenes trip it — the caller falls back to the rows pyramid).

All three produce the identical (x, y, d, level) support set after the
finest-wins dedup (asserted here whenever no overflow).  Measures
device_time_per_iter for each on the 79%-dense bench scene and the 15%
realistic-density scene (VERDICT r3 weak #2 follow-on).

Run: python experiments/exp_pyr.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import _interior_rows, _key_image
from opengpc_tpu.match import (MASKED_SENTINEL, match_epipolar_masked,
                               match_epipolar_masked_compact)
from opengpc_tpu.pyramid import (_dedup_unpack, _pyramid_impl, downscale2,
                                 pyramid_supports_to_numpy)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair, make_sparse_pair

H, W = 436, 1024
LEVELS = 3


def _pyramid_masked_impl(left, right, mask, settings, num_levels,
                         use_pallas, mult, nbd, compact, chunk, k):
    """Pyramid where every level rides the masked (or chunk-compacted)
    matcher; per-level masked buffers convert elementwise into the packed
    dedup keys (no per-level pack sort)."""
    h0, w0 = left.shape
    sent = jnp.int32(0x7FFFFFFF)
    disp_high = settings.disp_high
    bd = max(1, int(2 * disp_high).bit_length())
    assert bd == nbd, (bd, nbd)  # (2d) and (2d+1) share a bit_length
    keys = []
    ovf = jnp.bool_(False)
    l_img, r_img = left, right
    for level in range(num_levels):
        key, m = _interior_rows(
            _key_image(l_img, r_img, mask, settings, use_pallas))
        if compact:
            buf, _counts, o = match_epipolar_masked_compact(
                key, disp_high, chunk, k)
            ovf = ovf | o
        else:
            buf, _counts = match_epipolar_masked(
                None, None, None, None, disp_high, key=key)
        scale = 1 << level
        valid = buf != MASKED_SENTINEL
        x = buf >> bd
        yy = (jnp.arange(buf.shape[0], dtype=jnp.int32) + m)[:, None]
        pix = (yy * scale) * w0 + x * scale
        # buf's low bd bits already hold d + disp_high — OR them straight
        # into the dedup key's nbd-bit disparity field
        keys.append(jnp.where(
            valid,
            ((pix * mult + level) << nbd) | (buf & ((1 << bd) - 1)),
            sent,
        ).reshape(-1))
        if level + 1 < num_levels:
            l_img = downscale2(l_img)
            r_img = downscale2(r_img)
    out = _dedup_unpack(jnp.concatenate(keys), mult, nbd, w0,
                        disp_high, num_levels)
    return out + (ovf,)


def _trim(res):
    return set(map(tuple, pyramid_supports_to_numpy(*res).tolist()))


def main():
    forest = load_forest("forests/defaultZeroForest.txt")
    mask = make_filter_mask(forest)
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=True,
                                 capacity=1 << 19)
    use_pallas = jax.default_backend() == "tpu"

    mult = 1
    while mult < LEVELS:
        mult <<= 1
    nbd = int(2 * settings.disp_high + 1).bit_length()

    rows_fn = functools.partial(
        _pyramid_impl, mask=mask, settings=settings, num_levels=LEVELS,
        use_pallas=use_pallas, dedup=True)
    masked_fn = functools.partial(
        _pyramid_masked_impl, mask=mask, settings=settings,
        num_levels=LEVELS, use_pallas=use_pallas, mult=mult, nbd=nbd,
        compact=False, chunk=128, k=64)
    compact_fn = functools.partial(
        _pyramid_masked_impl, mask=mask, settings=settings,
        num_levels=LEVELS, use_pallas=use_pallas, mult=mult, nbd=nbd,
        compact=True, chunk=128, k=64)

    def dep(s, args):
        a, b = args
        upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
        a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
        return (a, b)

    def consume(res):
        return sum(r.sum(dtype=jnp.float32) for r in jax.tree.leaves(res))

    scenes = {
        "dense79": make_pair(H, W, 24),
        "sparse15": make_sparse_pair(H, W, 24, density=0.15),
    }
    mpix = H * W / 1e6
    out = {}
    for name, (l, r) in scenes.items():
        l, r = jnp.asarray(l), jnp.asarray(r)
        ref = _trim(jax.jit(rows_fn)(l, r))
        mres = jax.jit(masked_fn)(l, r)
        got_m = _trim(mres[:-1])
        assert got_m == ref, (name, "masked", len(got_m), len(ref))
        cres = jax.jit(compact_fn)(l, r)
        ovf = bool(np.asarray(cres[-1]))
        if not ovf:
            got_c = _trim(cres[:-1])
            assert got_c == ref, (name, "compact", len(got_c), len(ref))
        times = {}
        for label, fn in (("rows", rows_fn), ("masked", masked_fn),
                          ("compact", compact_fn)):
            def step(a, b, fn=fn):
                return consume(fn(a, b))

            t = device_time_per_iter(step, (l, r), dep, 3, 23, repeats=5)
            times[label] = {"ms": round(t * 1e3, 4),
                            "mpix_s": round(mpix / max(t, 1e-9), 1)}
            print(json.dumps({"scene": name, "variant": label,
                              **times[label]}), flush=True)
        out[name] = {"supports": len(ref), "compact_overflow": ovf,
                     "times": times}
    print(json.dumps({"exp": "pyr", "backend": jax.default_backend(),
                      "results": out}))


if __name__ == "__main__":
    main()
