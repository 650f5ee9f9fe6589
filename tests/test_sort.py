"""Bitonic row-sort kernel parity (interpret mode)."""

import numpy as np
import pytest

from opengpc_tpu.ops.sort import bitonic_sort_rows


@pytest.mark.parametrize("shape", [(5, 256), (17, 1024), (36, 2048)])
def test_bitonic_sorts_rows(shape):
    r, n = shape
    rng = np.random.default_rng(r + n)
    key = rng.integers(0, 1 << 30, (r, n)).astype(np.int32)
    key[:, ::5] = key[:, 1::5]  # duplicates
    pay = np.tile(np.arange(n, dtype=np.int32), (r, 1))
    ks, ps = bitonic_sort_rows(key, pay, interpret=True)
    ks, ps = np.asarray(ks), np.asarray(ps)
    for i in range(r):
        np.testing.assert_array_equal(ks[i], np.sort(key[i]))
        # payload permutation is consistent with the sorted keys
        np.testing.assert_array_equal(key[i][ps[i]], ks[i])
        # each payload appears exactly once
        assert len(np.unique(ps[i])) == n


def test_bitonic_rejects_non_pow2():
    key = np.zeros((4, 300), np.int32)
    with pytest.raises(ValueError):
        bitonic_sort_rows(key, key, interpret=True)
