"""Chunk-compacted GLOBAL mode: does the strided pre-compaction that bought
+27% on the masked epipolar contract (exp_lowdens.py, adopted r4) also pay
on the global contract?

Global mode's cost is dominated by ONE flat 2-operand sort over all 2HW
elements (0.82 ms of the 1.08 ms pipeline, exp_global.py) — and that sort
is density-INDEPENDENT: at 15% candidate density 85% of its input is
never-colliding sentinels.  Strided per-row chunk compaction (chunk c of a
row holds positions {p : p % nc == c}; per-chunk sort; keep first K) shrinks
the flat sort input from 2HW to H*nc*K = 2HW*(K/S) elements, overflow-guarded
exactly like the masked variant.

Why this is exact (when the overflow flag is False):
  - every VALID candidate survives (valid codes < SENTINEL_BASE sort left;
    the guard asserts no chunk holds > K of them), so the multiset of valid
    codes — the global uniqueness domain (inference.hpp:227-254) — is
    unchanged;
  - dropped elements are all sentinels.  Dropping sentinels can change
    equal-sentinel run LENGTHS (a column with 3 invalid pixels could drop
    to 2, forming a new "pair"), but equal sentinels are always same-image
    same-column (src sentinels are SENTINEL_BASE+[0,W), tar +[W,2W)), so the
    cross check (src_x < W <= tar_c) rejects every such pair — the same
    argument match_global_rows already relies on for un-compacted input.

Measures on the TPU, per scene (79%-dense make_pair and 15%-dense
make_sparse_pair): baseline match_global_rows vs compacted variants across
(S, K); decoded support sets asserted equal whenever no overflow.

Run: python experiments/exp_global_compact.py
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
from opengpc_tpu.infer import (_interior_rows, _key_image,
                               global_row_supports_to_numpy)
# the experiment measures the SHIPPED compacted matcher (adopted r4), so
# future semantic fixes can't silently diverge from what this sweep times
from opengpc_tpu.match import match_global_rows, match_global_rows_compact
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair, make_sparse_pair

H, W = 436, 1024
DISP = 16


def global_compact(key_img, w, disp_high, vertical_tolerance, chunk, k,
                   y_offset):
    """Strided chunk-compacted global matcher: ((xs, ys, ds), counts,
    overflow).  Exact whenever overflow is False (see module docstring)."""
    return match_global_rows_compact(
        key_img, w, disp_high, vertical_tolerance, chunk=chunk, k=k,
        y_offset=y_offset)


def main():
    use_pallas = jax.default_backend() == "tpu"
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=False,
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
        "dense": make_pair(H, W, DISP),
        "sparse": make_sparse_pair(H, W, DISP, density=0.15),
    }

    for sname, (l, r) in scenes.items():
        def base_step(a, b):
            key, m = _interior_rows(key_image(a, b))
            (xs, ys, ds), counts = match_global_rows(
                key, W, settings.disp_high, settings.vertical_tolerance,
                y_offset=m)
            return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
                    + ds.sum(dtype=jnp.int32)
                    + counts.sum(dtype=jnp.int32))

        key0, m0 = _interior_rows(jax.jit(key_image)(l, r))
        (bxs, bys, bds), bcnt = jax.jit(functools.partial(
            match_global_rows, w=W, disp_high=settings.disp_high,
            vertical_tolerance=settings.vertical_tolerance,
            y_offset=m0))(jnp.asarray(key0))
        want = set(map(tuple, global_row_supports_to_numpy(
            bxs, bys, bds, bcnt).tolist()))

        sec = device_time_per_iter(base_step, (l, r), dep, 3, 43, repeats=5)
        report(f"baseline_global_{sname}", sec, {"supports": len(want)})

        for chunk, k in ((128, 64), (128, 32), (256, 128), (256, 64),
                         (512, 128)):
            name = f"gcompact_S{chunk}_K{k}_{sname}"

            def cstep(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                (xs, ys, ds), counts, ovf = global_compact(
                    key, W, settings.disp_high,
                    settings.vertical_tolerance, chunk, k, m)
                return (xs.sum(dtype=jnp.int32) + ys.sum(dtype=jnp.int32)
                        + ds.sum(dtype=jnp.int32)
                        + counts.sum(dtype=jnp.int32)
                        + ovf.astype(jnp.int32))

            def cout(a, b, chunk=chunk, k=k):
                key, m = _interior_rows(key_image(a, b))
                return global_compact(key, W, settings.disp_high,
                                      settings.vertical_tolerance, chunk,
                                      k, m)

            (xs, ys, ds), counts, ovf = jax.jit(cout)(l, r)
            if bool(np.asarray(ovf)):
                report(name, float("nan"), {"overflow": True})
                continue
            got = set(map(tuple, global_row_supports_to_numpy(
                xs, ys, ds, counts).tolist()))
            assert got == want, (
                f"{name}: set mismatch ({len(got)} vs {len(want)})")
            sec = device_time_per_iter(cstep, (l, r), dep, 3, 43, repeats=5)
            report(name, sec, {"overflow": False})


if __name__ == "__main__":
    main()
