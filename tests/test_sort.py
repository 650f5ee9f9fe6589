"""Bitonic row-sort kernel parity (interpret mode)."""

import numpy as np
import pytest

from opengpc_tpu.ops.sort import bitonic_sort_rows


@pytest.mark.parametrize("shape", [(5, 256), (17, 1024), (36, 2048)])
def test_bitonic_sorts_rows(shape):
    r, n = shape
    rng = np.random.default_rng(r + n)
    key = rng.integers(0, 1 << 30, (r, n)).astype(np.int32)
    key[:, 1::2] = key[:, 0::2]  # duplicates
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


def test_matcher_bitonic_equals_lax():
    """Packed epipolar matcher gives identical supports with either sort."""
    import jax.numpy as jnp

    from opengpc_tpu.match import match_epipolar

    rng = np.random.default_rng(3)
    h, w = 40, 100  # non-pow2 width exercises the pad path
    codes_l = rng.integers(0, 1 << 20, (h, w)).astype(np.int32)
    codes_r = np.roll(codes_l, -4, axis=1)
    valid = rng.random((h, w)) < 0.5
    args = (jnp.asarray(codes_l), jnp.asarray(codes_r),
            jnp.asarray(valid), jnp.asarray(np.roll(valid, -4, axis=1)))

    (x1, y1, d1), c1 = match_epipolar(*args, 64, 4096, packed=True,
                                      sort_impl="lax")
    (x2, y2, d2), c2 = match_epipolar(*args, 64, 4096, packed=True,
                                      sort_impl="bitonic")
    assert int(c1) == int(c2) > 10
    s1 = set(zip(np.asarray(x1)[:int(c1)].tolist(),
                 np.asarray(y1)[:int(c1)].tolist(),
                 np.asarray(d1)[:int(c1)].tolist()))
    s2 = set(zip(np.asarray(x2)[:int(c2)].tolist(),
                 np.asarray(y2)[:int(c2)].tolist(),
                 np.asarray(d2)[:int(c2)].tolist()))
    assert s1 == s2
