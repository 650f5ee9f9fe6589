"""Host-side A/B: threaded masked-buffer decode + supports writer
(cpp/decode.cc ogpc_masked_decode_par / ogpc_write_supports_par) vs the
sequential natives.  Pure host work — no TPU needed; the masked buffer is
synthesized at the headline scene's density (~39% of the (436, 2048)
window slots hold a support, 345k total).

Why it matters: on a LOCAL accelerator the device pipeline is ~0.43
ms/pair, so the single-threaded 1.3 ms decode + ~15 ms writer are the
sequence-throughput ceiling (VERDICT r3 weak #3); the per-row scan and
the per-line itoa are both embarrassingly parallel once the row offsets
come from the counts prefix sum.

Run: python experiments/exp_hostdecode.py
"""
import ctypes
import json
import sys
import time

sys.path.insert(0, ".")
import numpy as np

import opengpc_tpu.io.png as iopng
from opengpc_tpu.io.supports import write_supports
from opengpc_tpu.match import MASKED_SENTINEL

H, W2, DISP = 436, 2048, 128
DENSITY = 0.386  # headline scene: 344799 supports / (436*2048) slots


def make_buffer(rng):
    bd = max(1, int(2 * DISP).bit_length())
    hit = rng.random((H, W2)) < DENSITY
    x = rng.integers(0, W2 // 2, (H, W2)).astype(np.int32)
    d = rng.integers(-DISP, DISP + 1, (H, W2)).astype(np.int32)
    buf = np.where(hit, (x << bd) | (d + DISP),
                   MASKED_SENTINEL).astype(np.int32)
    return np.ascontiguousarray(buf), hit.sum(axis=1).astype(np.int32)


def best_of(f, reps=21):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    lib = iopng._native_lib()
    assert lib is not None and hasattr(lib, "ogpc_masked_decode_par")
    rng = np.random.default_rng(0)
    buf, counts = make_buffer(rng)
    n = int(counts.sum())
    out = np.empty((n + 1, 3), np.int32)
    bp = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    cp = counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    op = out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    seq = best_of(lambda: lib.ogpc_masked_decode(
        bp, H, W2, DISP, MASKED_SENTINEL, op, n))
    ref = out[:n].copy()
    results = {"supports": n, "decode_seq_ms": round(seq * 1e3, 3)}
    for t in (2, 4, 8):
        tt = best_of(lambda: lib.ogpc_masked_decode_par(
            bp, H, W2, DISP, MASKED_SENTINEL, cp, op, n, t))
        assert (out[:n] == ref).all(), t
        results[f"decode_par{t}_ms"] = round(tt * 1e3, 3)

    # numpy fallback for scale
    flat = buf.ravel()
    results["decode_numpy_ms"] = round(best_of(
        lambda: np.flatnonzero(flat != MASKED_SENTINEL), 5) * 1e3, 3)

    a = np.ascontiguousarray(ref)
    ap = a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    results["write_seq_ms"] = round(best_of(
        lambda: lib.ogpc_write_supports(b"/tmp/ogpc_ws.txt", ap, n), 9) * 1e3, 2)
    for t in (4, 8):
        results[f"write_par{t}_ms"] = round(best_of(
            lambda: lib.ogpc_write_supports_par(
                b"/tmp/ogpc_wp.txt", ap, n, t), 9) * 1e3, 2)
    assert open("/tmp/ogpc_ws.txt", "rb").read() == \
        open("/tmp/ogpc_wp.txt", "rb").read()
    # the shipped dispatcher (threshold + thread pick)
    results["write_shipped_ms"] = round(best_of(
        lambda: write_supports("/tmp/ogpc_wd.txt", a), 9) * 1e3, 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
