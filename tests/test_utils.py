"""Timing/profiling utility tests."""

import numpy as np
import jax.numpy as jnp
import jax

from opengpc_tpu.utils import PhaseTimer, device_time_per_iter


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("preprocess"):
        pass
    with t.phase("match"):
        pass
    with t.phase("match"):
        pass
    assert set(t.totals) == {"preprocess", "match"}
    assert "tPreprocess" in t.report() and "tMatch" in t.report()
    assert t.ms("match") >= 0


def test_device_time_per_iter_runs():
    def step(x):
        return jnp.sum(x).astype(jnp.int32)

    def make_dep(s, args):
        (x,) = args
        return (x + (s % 2),)

    dt = device_time_per_iter(step, (np.ones((64, 64), np.int32),), make_dep,
                              n_short=2, n_long=6, repeats=1)
    assert dt >= 0.0
