"""Randomized TPU-vs-CPU parity sweep: N random (shape, settings, forest)
draws through the masked contract with the Pallas kernels on the real
chip, each compared set-exactly against the CPU jnp path (itself
oracle-pinned by the test suite).

Each new shape costs a remote compile (~25-40 s through the relay), so
keep N small; run uncontended (CPU-side pytest soaks starve the host
threads and stall compiles).

Run on the TPU: python experiments/exp_tpu_fuzz.py [N] [seed]
"""
import sys

sys.path.insert(0, ".")
import numpy as np

from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.forest import load_forest
from opengpc_tpu.infer import (build_sparsematch, build_sparsematch_masked,
                               build_sparsematch_masked_compact,
                               build_sparsematch_global_compact,
                               global_row_supports_to_numpy,
                               masked_supports_to_numpy, supports_to_numpy)
from opengpc_tpu.utils.scenes import make_scene, make_sparse_pair

N = int(sys.argv[1]) if len(sys.argv) > 1 else 3
seed = int(sys.argv[2]) if len(sys.argv) > 2 else 606
rng = np.random.default_rng(seed)
forests = {n: load_forest(f"forests/{n}") for n in
           ("defaultZeroForest.txt", "defaultTauForest.txt")}
for trial in range(N):
    h = int(rng.integers(48, 400))
    w = int(rng.integers(64, 1400))
    grad = int(rng.integers(1, 30))
    dh = int(rng.choice([16, 64, 128]))
    # 1-in-3 draws use a RANDOM forest (random test counts change the
    # fused kernels' unrolled test loop and the packed key layout —
    # exactly the kind of variation Mosaic miscompiles have hidden in);
    # the rest use the pretrained forests
    if rng.integers(0, 3) == 0:
        from opengpc_tpu.utils.fuzz import random_forest

        fname = "random"
        forests["random"] = random_forest(rng, max_ferns=3,
                                          max_tests_per_fern=10)
    else:
        fname = str(rng.choice(
            ["defaultZeroForest.txt", "defaultTauForest.txt"]))
    # 1-in-2 draws use a SPARSE scene (realistic ~10-25% candidate
    # density) so the chunk-compacted legs actually verify on-chip
    # instead of constantly overflowing on make_scene's ~79% density
    if rng.integers(0, 2) == 0:
        grad = int(rng.integers(5, 13))  # generator is sobel-quiet at >=5
        dens = float(rng.uniform(0.08, 0.25))
        stag = f"sparse{dens:.2f}"
        left, right = make_sparse_pair(h, w, int(rng.integers(1, 13)),
                                       density=dens,
                                       seed=int(rng.integers(1 << 30)))
    else:
        stag = "dense"
        left, right, _, _ = make_scene(rng, h, w)
    s = InferenceSettings(gradient_threshold=grad, vertical_tolerance=0,
                          disp_high=dh, epipolar_mode=True, capacity=1 << 19)
    forest = forests[fname]
    want = set(map(tuple, supports_to_numpy(*build_sparsematch(
        forest, s, use_pallas=False)(left, right)).tolist()))
    got = set(map(tuple, masked_supports_to_numpy(
        *build_sparsematch_masked(forest, s, use_pallas=True)(left, right),
        s.disp_high).tolist()))
    assert got == want, (trial, h, w, grad, dh, fname, len(got), len(want))
    # chunk-compacted contract on the same draw (r4): exact whenever the
    # overflow guard stays clear
    cbuf, ccounts, covf = build_sparsematch_masked_compact(
        forest, s, use_pallas=True)(left, right)
    ctag = "overflow"
    if not bool(np.asarray(covf)):
        got_c = set(map(tuple, masked_supports_to_numpy(
            cbuf, ccounts, s.disp_high).tolist()))
        assert got_c == want, (trial, "compact", h, w, len(got_c), len(want))
        ctag = "compact=="
    # chunk-compacted GLOBAL contract on the same draw (r4 session 2):
    # global-mode settings, TPU pallas path vs CPU flat-global set
    from opengpc_tpu.forest import make_filter_mask
    from opengpc_tpu.infer import _global_rows_ok

    gs = InferenceSettings(gradient_threshold=grad, vertical_tolerance=0,
                           disp_high=dh, epipolar_mode=False,
                           capacity=1 << 19)
    gtag = "g-ineligible"
    if _global_rows_ok(make_filter_mask(forest), (h, w), gs):
        gwant = set(map(tuple, supports_to_numpy(*build_sparsematch(
            forest, gs, use_pallas=False)(left, right)).tolist()))
        (gxs, gys, gds), gcounts, govf = build_sparsematch_global_compact(
            forest, gs, use_pallas=True)(left, right)
        gtag = "g-overflow"
        if not bool(np.asarray(govf)):
            got_g = set(map(tuple, global_row_supports_to_numpy(
                gxs, gys, gds, gcounts).tolist()))
            assert got_g == gwant, (trial, "gcompact", h, w,
                                    len(got_g), len(gwant))
            gtag = "gcompact=="
    # pyramid contracts on the same draw (r5): the rows pyramid's pallas
    # path vs the jnp path (same finest-wins dedup — sets of
    # (x, y, d, level) must be identical), and the compact pyramid vs
    # that set whenever its per-level overflow guard stays clear.
    # Random shapes exercise the per-level downscale/key shapes the
    # Sintel-sized A/Bs never vary.
    from opengpc_tpu.pyramid import (build_pyramid_sparsematch,
                                     build_pyramid_sparsematch_compact,
                                     pyramid_supports_to_numpy)
    from opengpc_tpu.pyramid import _rows_eligible

    nlv = int(rng.choice([2, 3]))
    ptag = "p-ineligible"
    if _rows_eligible(make_filter_mask(forest), s, h, w, nlv) is not None:
        pwant = set(map(tuple, pyramid_supports_to_numpy(
            *build_pyramid_sparsematch(forest, s, nlv, use_pallas=False)(
                left, right)).tolist()))
        pgot = set(map(tuple, pyramid_supports_to_numpy(
            *build_pyramid_sparsematch(forest, s, nlv, use_pallas=True)(
                left, right)).tolist()))
        assert pgot == pwant, (trial, "pyramid", h, w, nlv,
                               len(pgot), len(pwant))
        ptag = f"pyr{nlv}=="
        pc = build_pyramid_sparsematch_compact(forest, s, nlv,
                                               use_pallas=True)(left, right)
        if not bool(np.asarray(pc[-1])):
            pcgot = set(map(tuple,
                            pyramid_supports_to_numpy(*pc[:-1]).tolist()))
            assert pcgot == pwant, (trial, "pyr-compact", h, w, nlv,
                                    len(pcgot), len(pwant))
            ptag += ",pc=="
        else:
            ptag += ",pc-overflow"
    print(f"trial {trial}: ({h},{w}) {stag} grad={grad} dh={dh} "
          f"{fname[:11]} -> {len(want)} supports, TPU==CPU, {ctag}, "
          f"{gtag}, {ptag}", flush=True)
print("TPU randomized parity sweep OK")
