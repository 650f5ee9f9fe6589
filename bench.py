"""Headline benchmark: sparsematch throughput on a Sintel-sized stereo pair.

Reference benchmark config (/root/reference/samples/sparsematch.cpp:29-34):
defaultZeroForest, gradient threshold 5, vertical tolerance 0, dispHigh 128,
epipolar mode.  Image size matches Sintel (1024x436,
SintelOpticalFlow.hpp:492-493); real Sintel frames are not downloadable in
this environment, so the pair is a reproducible synthetic textured scene
with known ground-truth disparity (which also lets the bench assert
correctness: every support must hit the true disparity).

Timing methodology: on tunneled TPU setups ``block_until_ready`` can be a
no-op and host<->device transfers are slow, so wall-clocking single calls
measures the tunnel, not the chip.  Instead we run N chained pipeline
iterations inside one jitted ``lax.fori_loop`` (each iteration's input
depends on the previous match count, so nothing can be elided or
overlapped), fetch one scalar, and difference two loop lengths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
baseline is the BASELINE.json north-star of 50 Mpix/s per chip.
"""

import functools
import json
import time

import numpy as np


BASELINE_MPIX_S = 50.0  # BASELINE.json: >= 50 Mpix/s per v5e chip
H, W = 436, 1024        # Sintel frame size
TRUE_DISP = 16
N_SHORT, N_LONG = 3, 43


from opengpc_tpu.utils.scenes import make_pair, make_scene  # noqa: E402


def _check_against_oracle(left, right, supp, settings):
    """P/R gate vs the native CPU oracle (BASELINE: within 1%; we require
    exact).  Skipped silently if the oracle can't be built on this host."""
    import os
    import subprocess
    import sys
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    oracle = os.path.join(repo, "cpp", "build", "oracle")
    if not os.path.exists(oracle):
        r = subprocess.run(["make", "-C", os.path.join(repo, "cpp")],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(oracle):
            return
    from opengpc_tpu.io.raw import write_raw

    with tempfile.TemporaryDirectory() as td:
        lp, rp, op = (os.path.join(td, n) for n in ("l.raw", "r.raw", "o.txt"))
        write_raw(lp, left)
        write_raw(rp, right)
        subprocess.run(
            [oracle, "sparsematch", os.path.join(repo, "forests",
                                                 "defaultZeroForest.txt"),
             lp, rp, op, str(settings.gradient_threshold),
             str(settings.vertical_tolerance), str(settings.disp_high),
             "1", "0"],
            check=True,
        )
        with open(op) as f:
            want = set(tuple(int(v) for v in line.split()) for line in f
                       if line.strip())
    got = set(map(tuple, supp.tolist()))
    # supp may be capacity-trimmed; every returned support must be in the
    # oracle set and coverage must be essentially total
    assert got <= want, f"{len(got - want)} supports not in oracle set"
    assert len(got) >= min(len(want), settings.capacity) * 0.999, (
        f"only {len(got)} of {len(want)} oracle supports reproduced"
    )
    print(f"oracle check: {len(got)}/{len(want)} supports, exact subset",
          file=sys.stderr)


def main():
    import jax

    from opengpc_tpu.config import InferenceSettings
    from opengpc_tpu.forest import load_forest, make_filter_mask
    from opengpc_tpu.infer import build_sparsematch, supports_to_numpy

    forest = load_forest("forests/defaultZeroForest.txt")
    mask = make_filter_mask(forest)
    settings = InferenceSettings(
        gradient_threshold=5,
        vertical_tolerance=0,
        disp_high=128,
        epipolar_mode=True,
        capacity=1 << 19,
    )
    left, right = make_pair(H, W, TRUE_DISP)

    # correctness gate: every support must hit the true disparity
    match = build_sparsematch(forest, settings)
    supp = supports_to_numpy(*match(left, right))
    assert len(supp) > 1000, f"too few supports: {len(supp)}"
    correct = float((supp[:, 2] == TRUE_DISP).mean())
    assert correct > 0.99, f"support accuracy {correct:.3f} < 0.99"
    _check_against_oracle(left, right, supp, settings)

    import jax.numpy as jnp

    from opengpc_tpu.infer import _sparsematch_impl
    from opengpc_tpu.utils import device_time_per_iter

    use_pallas = jax.default_backend() == "tpu"

    def step(l, r):
        return _sparsematch_impl(
            l, r, mask=mask, settings=settings, use_pallas=use_pallas
        )[3]

    def make_dep(count, args):
        # fold the match count's low bit into a boundary pixel (cleared by
        # preprocessing, so results are unchanged) to chain iterations
        l, r = args
        l = jax.lax.dynamic_update_slice(
            l, (count & 1).astype(jnp.uint8).reshape(1, 1), (0, 0)
        )
        return (l, r)

    best = device_time_per_iter(
        step, (left, right), make_dep, N_SHORT, N_LONG, repeats=5
    )
    mpix_s = (2 * H * W / 1e6) / best
    print(
        json.dumps(
            {
                "metric": "sintel_sparsematch_throughput",
                "value": round(mpix_s, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
