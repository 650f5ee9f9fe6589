"""A/B: batched-fern training (one scorer dispatch per level for ALL ferns)
vs the fern-at-a-time loop, wall-clock on the real (relayed) TPU.

The batched path collapses F*max_depth scorer dispatches (each with an
include-count fetch, a counts fetch and a diagnostics fetch) into max_depth,
so through a high-latency link the win should approach F x on the dispatch
overhead.  Forests are byte-identical (pinned in tests/test_train.py); this
script re-asserts it on the side.

Run: python experiments/exp_train_batch.py  (TPU if reachable; CPU works)
"""

import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from opengpc_tpu.config import fern_factory, tau_optimizer, zero_optimizer
from opengpc_tpu.forest import serialize_forest
from opengpc_tpu.train import train_forest


def make_triplets(rng, n):
    ref = rng.integers(0, 256, (n, 729)).astype(np.int16)
    pos = np.clip(ref + rng.integers(-8, 9, (n, 729)), 0, 255)
    neg = rng.integers(0, 256, (n, 729))
    return np.stack([ref, pos, neg], axis=1).astype(np.uint8)


def main():
    import jax

    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    trips = make_triplets(rng, 50_000)
    settings = fern_factory(2, 2, 2, 5)
    out = {}
    for name, opt in (("zero", zero_optimizer()), ("tau", tau_optimizer())):
        texts = {}
        for label, bf in (("batched", True), ("sequential", False)):
            # warm (compile) pass, then timed pass
            train_forest(trips, settings, opt, seed=9, verbose=False,
                         batch_ferns=bf)
            t0 = time.perf_counter()
            f = train_forest(trips, settings, opt, seed=9, verbose=False,
                             batch_ferns=bf)
            dt = time.perf_counter() - t0
            texts[label] = serialize_forest(f)
            out[f"{name}_{label}_s"] = round(dt, 3)
            print(f"{name} {label}: {dt:.3f} s", flush=True)
        assert texts["batched"] == texts["sequential"], "forest mismatch!"
        print(f"{name}: forests byte-identical", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
