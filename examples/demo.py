"""End-to-end demo: mine -> train -> match -> visualize, no dataset needed.

Generates a small synthetic rectified stereo "dataset" with known
ground-truth disparity, mines patch triplets from it, trains a fresh GPC
forest, runs sparse matching with both the fresh forest and the pretrained
reference forest, and writes disparity visualizations.

Run:  python examples/demo.py [out_dir]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opengpc_tpu import (
    InferenceSettings,
    build_sparsematch,
    fern_factory,
    load_forest,
    save_forest,
    supports_to_numpy,
    zero_optimizer,
)
from opengpc_tpu.metrics import support_precision
from opengpc_tpu.mine import extract_triplets, mine_stereo_pair
from opengpc_tpu.io.png import write_png
from opengpc_tpu.train import train_forest
from opengpc_tpu.viz import disparity_visualization


from opengpc_tpu.utils.scenes import make_scene  # noqa: E402


def main(out_dir="demo_out", h=320, w=640, num_triplets=3000):
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    left, right, gt, occ = make_scene(rng, h, w)
    write_png(os.path.join(out_dir, "left.png"), left)
    write_png(os.path.join(out_dir, "right.png"), right)

    # --- mine triplets straight from the ground truth -------------------
    zeros = np.zeros((h, w), np.uint8)
    kl, kr, kn = mine_stereo_pair(gt, occ, zeros, num_triplets, 10, 25, rng)
    triplets = extract_triplets(left, right, kl, kr, kn)
    print(f"mined {len(triplets)} triplets")

    # --- train a fresh zero forest --------------------------------------
    t0 = time.perf_counter()
    forest = train_forest(triplets, fern_factory(2, 2, 2, 5),
                          zero_optimizer(), seed=1, verbose=False)
    print(f"trained fresh forest in {time.perf_counter() - t0:.1f} s")
    save_forest(forest, os.path.join(out_dir, "fresh_forest.txt"))

    # --- match with the fresh forest and the pretrained one -------------
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=32, epipolar_mode=True,
                                 capacity=1 << 18)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pretrained = load_forest(os.path.join(repo, "forests",
                                          "defaultZeroForest.txt"))
    for name, f in (("fresh", forest), ("pretrained", pretrained)):
        match = build_sparsematch(f, settings)
        supp = supports_to_numpy(*match(left, right))
        prec, n = support_precision(supp, gt, valid=(occ == 0), tol=0)
        print(f"{name:>10}: {len(supp)} supports, "
              f"exact-disparity precision {prec:.3f} over {n}")
        vis = disparity_visualization(left, supp, max_disparity=32)
        write_png(os.path.join(out_dir, f"disparity_{name}.png"), vis)

    # --- the fast output contracts + multi-scale, same support semantics -
    import dataclasses

    from opengpc_tpu.infer import (build_sparsematch_global_rows,
                                   build_sparsematch_rows,
                                   global_row_supports_to_numpy,
                                   row_supports_to_numpy)
    from opengpc_tpu.pyramid import (build_pyramid_sparsematch,
                                     pyramid_supports_to_numpy)

    (rxs, rds), rcounts = build_sparsematch_rows(pretrained, settings)(
        left, right)
    rows_supp = row_supports_to_numpy(rxs, rds, rcounts)
    print(f"  row-form: {len(rows_supp)} supports (per-row packed "
          "contract; identical set)")
    from opengpc_tpu.infer import (build_sparsematch_masked,
                                   masked_supports_to_numpy)

    mbuf, mcounts = build_sparsematch_masked(pretrained, settings)(
        left, right)
    print(f"    masked: "
          f"{len(masked_supports_to_numpy(mbuf, mcounts, settings.disp_high))}"
          " supports (minimum-device-work contract; identical set)")
    gsettings = dataclasses.replace(settings, epipolar_mode=False)
    (gxs, gys, gds), gcounts = build_sparsematch_global_rows(
        pretrained, gsettings)(left, right)
    print(f"    global: "
          f"{len(global_row_supports_to_numpy(gxs, gys, gds, gcounts))} "
          "supports (segmented global contract)")
    prows = pyramid_supports_to_numpy(
        *build_pyramid_sparsematch(pretrained, settings, num_levels=3)(
            left, right))
    print(f"   pyramid: {len(prows)} supports over 3 levels "
          f"(per-level {np.bincount(prows[:, 3], minlength=3).tolist()})")
    print(f"outputs in {out_dir}/")


if __name__ == "__main__":
    main(*sys.argv[1:2])
