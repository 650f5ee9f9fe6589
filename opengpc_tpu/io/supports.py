"""Supports text-file I/O — the "x y d" line format shared by the CLI,
the native oracle (cpp/oracle.cc) and the refmatch driver.

Writing is the per-frame bottleneck of sequence mode at Sintel scale
(~345k supports/frame): ``np.savetxt(fmt="%d")`` costs ~750 ms per frame,
the native writer (cpp/decode.cc ogpc_write_supports, hand-rolled itoa)
12-18 ms — byte-identical output (pinned by test).  Falls back to savetxt when the native
library isn't built.
"""

from __future__ import annotations

import ctypes

import numpy as np


def write_supports(path: str, supports: np.ndarray) -> None:
    """Write an (n, 3) int array as 'x y d' lines (byte-identical to
    ``np.savetxt(path, a, fmt="%d")``)."""
    from opengpc_tpu.io.png import _DECODE_THREADS, _native_lib

    a = np.ascontiguousarray(np.asarray(supports).reshape(-1, 3),
                             dtype=np.int32)
    lib = _native_lib()
    if lib is not None and hasattr(lib, "ogpc_write_supports_par") \
            and _DECODE_THREADS > 1 and a.shape[0] >= 50_000:
        # parallel formatting (the hand-rolled itoa dominates): each thread
        # formats an equal slice, buffers written in order — byte-identical
        rc = lib.ogpc_write_supports_par(
            str(path).encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a.shape[0], _DECODE_THREADS,
        )
        if rc == 0:
            return
    if lib is not None and hasattr(lib, "ogpc_write_supports"):
        rc = lib.ogpc_write_supports(
            str(path).encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            a.shape[0],
        )
        if rc == 0:
            return
    np.savetxt(path, a, fmt="%d")


def read_supports(path: str) -> np.ndarray:
    """Read an 'x y d' lines file back into an (n, 3) int64 array."""
    return np.loadtxt(path, dtype=np.int64).reshape(-1, 3)
