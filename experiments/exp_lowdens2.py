"""Masked-compact ratio sweep: does K/S < 1/2 pay at realistic density?

exp_lowdens.py adopted strided chunk compaction with K = S/2 (effective
per-row capacity W) — but every measured point kept that ratio.  The GLOBAL
contract's sweep (exp_global_compact.py) found the DEEPER K/S = 1/4 ratio
best on wide rows (S=512/K=128, +91%), because the final uniqueness sort
shrinks with K.  The same argument applies to the masked contract's final
(nc*K) row sort: at 15% density the expected strided per-chunk load is
0.15*S (S=128 -> ~19 of 64 used), so K = S/4 leaves ~1.7x margin and halves
the final sort width again.

Measures the SHIPPED match_epipolar_masked_compact (production chunk/k
parameters) at two densities (15% and 8%) across (S, K) ratios 1/2, 1/4,
and 1/8; baseline = full-width masked matcher.  Decoded support sets
asserted equal whenever the overflow guard stays False; overflowing
configs are reported, not timed.

Run: python experiments/exp_lowdens2.py
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
from opengpc_tpu.infer import (_interior_rows, _key_image, _pad_rows,
                               masked_supports_to_numpy)
from opengpc_tpu.match import (MASKED_SENTINEL, match_epipolar_masked,
                               match_epipolar_masked_compact)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair, make_sparse_pair

H, W = 436, 1024
DISP = 16

SWEEP = ((128, 64), (128, 32), (128, 16),
         (256, 64), (256, 32),
         (512, 128), (512, 64),
         # wide-chunk additions (r4 session 3): larger chunks at the same
         # ratio are MORE overflow-robust (k grows with the chunk, so
         # clump variance crosses it less often — the CPU exactness map
         # showed S512/K128 surviving d15 where S128/K32 overflowed).
         # (512, 256) = ratio-1/2 with 4x the clump tolerance of the
         # shipped (128, 64); (1024, 256) = ratio-1/4 at nc=2
         (512, 256), (1024, 256))


def main():
    use_pallas = jax.default_backend() == "tpu"
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=True,
                                 capacity=1 << 19)

    def key_image(l, r):
        return _key_image(l, r, mask, settings, use_pallas)

    def dep(s, args):
        a, b = args
        upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1)
        a = jax.lax.dynamic_update_slice(a, upd, (0, 0))
        return (a, b)

    def report(name, sec, extra=None):
        rec = {"exp": name, "ms": round(sec * 1e3, 3),
               "mpix_s": round(2 * H * W / 1e6 / max(sec, 1e-9), 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)

    scenes = {
        "d15": make_sparse_pair(H, W, DISP, density=0.15),
        "d08": make_sparse_pair(H, W, DISP, density=0.08),
        # the dense-tolerance frontier: where do the wide ratio-1/2
        # chunks stop overflowing?  Feeds the auto-threshold rule
        "d30": make_sparse_pair(H, W, DISP, density=0.30),
    }

    for sname, (l, r) in scenes.items():
        def base_step(a, b):
            key, m = _interior_rows(key_image(a, b))
            buf, counts = match_epipolar_masked(None, None, None, None,
                                                settings.disp_high, key=key)
            return buf.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

        key0, m0 = _interior_rows(jax.jit(key_image)(l, r))
        buf0, cnt0 = jax.jit(functools.partial(
            match_epipolar_masked, disp_high=settings.disp_high))(
                None, None, None, None, key=jnp.asarray(key0))
        want = set(map(tuple, masked_supports_to_numpy(
            np.asarray(_pad_rows(buf0, m0, -2, value=MASKED_SENTINEL)),
            np.asarray(_pad_rows(cnt0, m0, -1)),
            settings.disp_high).tolist()))

        sec = device_time_per_iter(base_step, (l, r), dep, 3, 43, repeats=5)
        report(f"baseline_{sname}", sec, {"supports": len(want)})

        for chunk, k in SWEEP:
            name = f"compact_S{chunk}_K{k}_{sname}"

            def cstep(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                buf, counts, ovf = match_epipolar_masked_compact(
                    key, settings.disp_high, chunk, k)
                return (buf.sum(dtype=jnp.int32)
                        + counts.sum(dtype=jnp.int32)
                        + ovf.astype(jnp.int32))

            def cout(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                buf, counts, ovf = match_epipolar_masked_compact(
                    key, settings.disp_high, chunk, k)
                return (_pad_rows(buf, m, -2, value=MASKED_SENTINEL),
                        _pad_rows(counts, m, -1), ovf)

            buf, counts, ovf = jax.jit(cout)(l, r)
            if bool(np.asarray(ovf)):
                report(name, float("nan"), {"overflow": True})
                continue
            got = set(map(tuple, masked_supports_to_numpy(
                np.asarray(buf), np.asarray(counts),
                settings.disp_high).tolist()))
            assert got == want, (
                f"{name}: set mismatch ({len(got)} vs {len(want)})")
            sec = device_time_per_iter(cstep, (l, r), dep, 3, 43,
                                       repeats=5)
            report(name, sec, {"overflow": False})


if __name__ == "__main__":
    main()
