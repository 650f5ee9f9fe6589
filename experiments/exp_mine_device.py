"""Host vs device triplet extraction (VERDICT r2 item 7).

extract_triplets is host numpy by design (mining dispatches nothing to the
device).  This measures what the device path actually costs at realistic
triplet counts so host-only is a recorded decision, not a default.

Wall clock is the honest metric here on BOTH sides: the product of this
stage is a host-resident numpy array (written to disk / shuffled), so the
device path's transfers are part of its real cost.

Run on the TPU: python experiments/exp_mine_device.py
"""
import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

from opengpc_tpu.mine import (extract_triplets, extract_triplets_device,
                              mine_stereo_pair)
from opengpc_tpu.utils.scenes import make_scene

H, W = 436, 1024
rng = np.random.default_rng(1)
left, right, gt, occ = make_scene(rng, H, W)
oof = np.zeros((H, W), np.uint8)

for n in (1000, 10000):
    kl, kr, kn = mine_stereo_pair(gt, occ, oof, n, 10, 25, rng)

    t0 = time.perf_counter()
    host = extract_triplets(left, right, kl, kr, kn)
    t_host = time.perf_counter() - t0

    dev = extract_triplets_device(left, right, kl, kr, kn)  # compile warm-up
    t0 = time.perf_counter()
    dev = extract_triplets_device(left, right, kl, kr, kn)
    t_dev = time.perf_counter() - t0

    assert (host == dev).all()
    print(json.dumps({
        "exp": f"extract_{n}_triplets", "host_ms": round(t_host * 1e3, 1),
        "device_ms_warm": round(t_dev * 1e3, 1),
        "host_triplets_per_s": round(len(host) / t_host),
        "device_triplets_per_s": round(len(dev) / t_dev),
    }), flush=True)
