"""Device-resident masked-contract consumer timing (VERDICT r3 item 6).

densify_from_masked consumes (buf, row_counts) entirely on device (seed
scatter + masked-Jacobi diffusion).  This measures

  seed_only      — the scatter-decode alone (num_iters=0): the cost of
                   consuming the masked buffer on device without host
                   decode/re-upload.
  densify_dev    — full device densify (64 sweeps), device-timed.
  densify_host   — the decode-then-densify loop it replaces: fetch buf,
                   masked_supports_to_numpy, re-upload via
                   densify_supports (host wall-clock, includes transfers;
                   relay latency noted — through the axon relay the host
                   number is dominated by the tunnel and run-to-run
                   variable, the device number is the comparable one).

Run: python experiments/exp_dense_masked.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.densify import _densify_from_masked, densify_supports
from opengpc_tpu.forest import load_forest, make_filter_mask
from opengpc_tpu.infer import (_sparsematch_masked_impl,
                               masked_supports_to_numpy)
from opengpc_tpu.utils import device_time_per_iter
from opengpc_tpu.utils.scenes import make_pair

H, W = 436, 1024


def main():
    use_pallas = jax.default_backend() == "tpu"
    mask = make_filter_mask(load_forest("forests/defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=128, epipolar_mode=True,
                                 capacity=1 << 19)
    left, right = make_pair(H, W, 16)
    buf, counts = jax.jit(lambda l, r: _sparsematch_masked_impl(
        l, r, mask=mask, settings=settings, use_pallas=use_pallas))(
            left, right)
    buf = jnp.asarray(buf)
    n_sup = int(np.asarray(counts).sum())
    print(json.dumps({"exp": "scene", "supports": n_sup}), flush=True)

    def dep(s, args):
        (b,) = args
        # flip the last (always-sentinel pad) column's low bit so each
        # iteration's input depends on the previous output
        upd = (0x7FFFFFFE | (s.astype(jnp.int32) & 1)).reshape(1, 1)
        b = jax.lax.dynamic_update_slice(b, upd, (0, b.shape[1] - 1))
        return (b,)

    for name, iters, n_long, impl in (
            ("seed_scatter", 0, 43, "scatter"),
            ("seed_sortmerge", 0, 43, "sortmerge"),
            ("densify_dev_scatter", 64, 11, "scatter"),
            ("densify_dev_sortmerge", 64, 11, "sortmerge")):
        def step(b, iters=iters, impl=impl):
            d, f = _densify_from_masked(b, settings.disp_high, iters,
                                        seed_impl=impl)
            return d.sum(dtype=jnp.float32) + f.sum(dtype=jnp.int32)

        sec = device_time_per_iter(step, (buf,), dep, 3, n_long, repeats=5)
        print(json.dumps({"exp": name, "ms": round(sec * 1e3, 3)}),
              flush=True)

    # host loop: fetch + decode + re-upload + densify (wall clock)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        supp = masked_supports_to_numpy(np.asarray(buf), np.asarray(counts),
                                        settings.disp_high)
        d, f = densify_supports(supp, (H, W), num_iters=64)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"exp": "densify_host_roundtrip",
                      "ms": round(best * 1e3, 3),
                      "note": "includes relay transfers; variable"}),
          flush=True)

    # equality gate
    dd, df = _densify_from_masked(buf, settings.disp_high, 64)
    supp = masked_supports_to_numpy(np.asarray(buf), np.asarray(counts),
                                    settings.disp_high)
    hd, hf = densify_supports(supp, (H, W), num_iters=64)
    assert (np.asarray(df) == hf).all() and (np.asarray(dd) == hd).all()
    print(json.dumps({"exp": "parity", "ok": True}), flush=True)


if __name__ == "__main__":
    main()
