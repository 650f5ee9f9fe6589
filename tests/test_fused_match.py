"""Fully fused match kernel parity vs the split pipeline (interpret mode)."""

import functools
import os

import numpy as np
import pytest

from opengpc_tpu import forest as forest_mod
from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.infer import _sparsematch_impl, supports_to_numpy

FORESTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "forests"
)


def structured_image(rng, h, w):
    small = rng.integers(0, 256, (h // 4 + 2, w // 4 + 2))
    img = np.kron(small, np.ones((4, 4)))[:h, :w]
    return np.clip(img + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(48, 80), (70, 100)])
@pytest.mark.parametrize(
    "forest_file", ["defaultZeroForest.txt", "defaultTauForest.txt"]
)
def test_fused_match_equals_split_pipeline(shape, forest_file):
    rng = np.random.default_rng(sum(shape))
    h, w = shape
    left = structured_image(rng, h, w)
    right = np.roll(left, -3, axis=1)
    right[:, -3:] = rng.integers(0, 256, (h, 3)).astype(np.uint8)

    forest = forest_mod.load_forest(os.path.join(FORESTS, forest_file))
    mask = forest_mod.make_filter_mask(forest)
    settings = InferenceSettings(gradient_threshold=5, vertical_tolerance=0,
                                 disp_high=64, epipolar_mode=True,
                                 capacity=16384)
    want = supports_to_numpy(*_sparsematch_impl(
        left, right, mask=mask, settings=settings))
    got = supports_to_numpy(*_sparsematch_impl(
        left, right, mask=mask, settings=settings, fused_match=True))
    assert len(want) > 0
    assert set(map(tuple, got.tolist())) == set(map(tuple, want.tolist()))
