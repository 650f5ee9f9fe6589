"""Global-mode batched dispatch A/B (VERDICT r3 item 5).

The epipolar masked contract's batch FOLD keeps paying at B=2/4/8
(exp_masked3.py); global mode's batched builder is lax.map-only.  This
measures whether stacking B global pairs' flat sorts — one (B, N)
batched sort via vmap of match_global_rows over prebuilt key images —
beats B sequential pipelines, or whether the batched big-row sort is the
same vmap pathology the flat compaction sort showed (README ledger).

Variants (aggregate Mpix/s per chip, B in {2, 4}):
  laxmap_B{b}   — today's builder: lax.map over B full pipelines.
  vmapsort_B{b} — per-pair key images (lax.map over the Pallas kernel),
                  then vmap'd match_global_rows (ONE (B, N) segmented
                  sort covering the whole batch).
Support-set equality of variant vs per-pair baseline asserted per B.

Run: python experiments/exp_global_batch.py
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
from opengpc_tpu.infer import (_batched_key_images, _interior_rows,
                               _sparsematch_global_rows_impl,
                               global_row_supports_to_numpy)
from opengpc_tpu.match import match_global_rows
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024


def main():
    use_pallas = jax.default_backend() == "tpu"
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=False,
                                 capacity=1 << 19)
    one = functools.partial(_sparsematch_global_rows_impl, mask=mask,
                            settings=settings, use_pallas=use_pallas)

    def laxmap_impl(ls, rs):
        return jax.lax.map(lambda ab: one(*ab), (ls, rs))

    def vmapsort_impl(ls, rs):
        keys = _batched_key_images(ls, rs, mask, settings, use_pallas)
        keys, m = _interior_rows(keys)
        return jax.vmap(functools.partial(
            match_global_rows, w=W, disp_high=settings.disp_high,
            vertical_tolerance=settings.vertical_tolerance, y_offset=m,
        ))(keys)

    def consume(out):
        (xs, ys, ds), counts = out
        return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
                + ds.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32))

    def dep(s, args):
        a, b = args
        upd = (s.astype(jnp.int32) & 1).astype(jnp.uint8).reshape(1, 1, 1)
        a = jax.lax.dynamic_update_slice(a, upd, (0, 0, 0))
        return (a, b)

    for b in (2, 4):
        pairs = [make_pair(H, W, 16, seed=100 + i) for i in range(b)]
        lb = np.stack([p[0] for p in pairs])
        rb = np.stack([p[1] for p in pairs])

        # equality gate: vmapsort batch element i == per-pair run
        ov = jax.jit(vmapsort_impl)(lb, rb)
        for i in range(b):
            (oxs, oys, ods), ocnt = jax.jit(one)(lb[i], rb[i])
            want = set(map(tuple, global_row_supports_to_numpy(
                np.asarray(oxs), np.asarray(oys), np.asarray(ods),
                np.asarray(ocnt)).tolist()))
            got = set(map(tuple, global_row_supports_to_numpy(
                np.asarray(ov[0][0])[i], np.asarray(ov[0][1])[i],
                np.asarray(ov[0][2])[i], np.asarray(ov[1])[i]).tolist()))
            assert got == want, f"B{b} elem {i}: {len(got)} vs {len(want)}"

        for name, impl in (("laxmap", laxmap_impl), ("vmapsort", vmapsort_impl)):
            sec = device_time_per_iter(
                lambda a, c, impl=impl: consume(impl(a, c)), (lb, rb), dep,
                3, max(11, 23 // b), repeats=5)
            print(json.dumps({
                "exp": f"{name}_B{b}", "ms": round(sec * 1e3, 3),
                "aggregate_mpix_s": round(2 * b * H * W / 1e6
                                          / max(sec, 1e-9), 1),
            }), flush=True)


if __name__ == "__main__":
    main()
