"""Utilities: phase timing, device benchmarking, profiling."""

from opengpc_tpu.utils.timing import (
    PhaseTimer,
    device_time_per_iter,
    trace,
)
