"""Configuration dataclasses.

Knob names and defaults mirror the reference settings structs
(InferenceSettings /root/reference/lib/gpc/inference.hpp:71-131,
Zero/TauOptimizerSettings Fern.hpp:91-141, FernSettings Fern.hpp:169-174,
ForestSettings training.hpp:58-72) so users of the reference can map
configurations 1:1.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class InferenceSettings:
    """Settings for sparse matching (inference.hpp:71-131).

    The reference's ``useHashtable`` / ``numThreads`` knobs do not exist
    here: hash-table vs sort matching collapses into the single on-device
    sort matcher, and intra-chip parallelism is XLA's job.  ``capacity``
    is new — the fixed size of the support output buffer (device pipelines
    have static shapes; overflow is reported via the returned count).
    """

    gradient_threshold: int = 10
    disp_high: int = 128
    vertical_tolerance: int = 1
    epipolar_mode: bool = False
    capacity: int = 32768

    def __post_init__(self):
        if not (0 <= self.gradient_threshold <= 255):
            raise ValueError("gradient_threshold needs to be within 0...255")


@dataclasses.dataclass(frozen=True)
class OptimizerSettings:
    """Greedy fern-split optimizer settings (Fern.hpp:71-141).

    ``tau_lo``/``tau_hi`` bound the intercept line search (a zero fern is
    tau_lo=0, tau_hi=1 which forces tau=0); ``w1`` weights the harmonic
    mean of precision/recall.
    """

    tau_lo: int = 0
    tau_hi: int = 1
    num_resamples: int = 10
    only_score_non_split_samples: bool = False
    w1: float = 0.5


def zero_optimizer(num_resamples: int = 10, only_score_non_split_samples: bool = False,
                   w1: float = 0.5) -> OptimizerSettings:
    """ZeroOptimizerSettings (Fern.hpp:121-141): tau forced to 0."""
    return OptimizerSettings(0, 1, num_resamples, only_score_non_split_samples, w1)


def tau_optimizer(tau_lo: int = -10, tau_hi: int = 10, num_resamples: int = 10,
                  only_score_non_split_samples: bool = False,
                  w1: float = 0.5) -> OptimizerSettings:
    """TauOptimizerSettings (Fern.hpp:91-120)."""
    return OptimizerSettings(tau_lo, tau_hi, num_resamples, only_score_non_split_samples, w1)


@dataclasses.dataclass(frozen=True)
class ForestSettings:
    """Forest training settings (training.hpp:58-72 + FernFactory
    Fern.hpp:405-414): ``ferns`` is a list of scales (one entry per fern),
    ``max_depth`` the number of tests per fern, ``sample_fraction`` the
    bootstrap fraction per fern."""

    ferns: tuple  # tuple of scale ints (forest.SCALE_S/M/L)
    max_depth: int = 5
    sample_fraction: float = 0.7


def fern_factory(num_s: int, num_m: int, num_l: int, max_depth: int) -> ForestSettings:
    """FernFactory(Fern.hpp:405-414): num_s 7x7 + num_m 17x17 + num_l 27x27."""
    from opengpc_tpu.forest import SCALE_S, SCALE_M, SCALE_L

    scales = (SCALE_S,) * num_s + (SCALE_M,) * num_m + (SCALE_L,) * num_l
    return ForestSettings(ferns=scales, max_depth=max_depth)
