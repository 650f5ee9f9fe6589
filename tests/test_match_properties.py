"""Matcher property tests vs a brute-force O(n^2) oracle (SURVEY.md §4.3).

Independent of the C++ oracle: the unique-collision rule is restated from
first principles over random codes with heavy duplication.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from opengpc_tpu.match import compact, match_epipolar, match_global


def brute_force_epipolar(codes_l, codes_r, valid_l, valid_r, disp_high):
    """Row-wise: (x, y, d) iff the code occurs exactly once among valid
    pixels of the row in EACH image and |d| <= disp_high."""
    h, w = codes_l.shape
    out = set()
    for y in range(h):
        for x in range(w):
            if not valid_l[y, x]:
                continue
            c = codes_l[y, x]
            if (codes_l[y][valid_l[y]] == c).sum() != 1:
                continue
            tars = np.flatnonzero((codes_r[y] == c) & valid_r[y])
            if len(tars) == 1:
                d = x - int(tars[0])
                if abs(d) <= disp_high:
                    out.add((x, y, d))
    return out


def brute_force_global(codes_l, codes_r, valid_l, valid_r, disp_high, vt):
    h, w = codes_l.shape
    cl = codes_l[valid_l]
    cr = codes_r[valid_r]
    pos_l = np.argwhere(valid_l)  # (n, 2) of (y, x)
    pos_r = np.argwhere(valid_r)
    out = set()
    for (y, x), c in zip(pos_l, codes_l[valid_l]):
        if (cl == c).sum() != 1:
            continue
        hits = np.flatnonzero(cr == c)
        if len(hits) == 1:
            ty, tx = pos_r[hits[0]]
            d = int(x) - int(tx)
            if abs(d) <= disp_high and abs(int(y) - int(ty)) <= vt:
                out.add((int(x), int(y), d))
    return out


def _got(res):
    (xs, ys, ds), count = res
    n = int(count)
    return set(
        zip(np.asarray(xs)[:n].tolist(), np.asarray(ys)[:n].tolist(),
            np.asarray(ds)[:n].tolist())
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("packed", [False, True])
def test_epipolar_matches_brute_force(seed, packed):
    rng = np.random.default_rng(seed)
    h, w = 12, 40
    # tiny code alphabet -> lots of duplicates, triples, singletons
    codes_l = rng.integers(0, 25, (h, w)).astype(np.int32)
    codes_r = rng.integers(0, 25, (h, w)).astype(np.int32)
    valid_l = rng.random((h, w)) < 0.6
    valid_r = rng.random((h, w)) < 0.6

    want = brute_force_epipolar(codes_l, codes_r, valid_l, valid_r, 30)
    got = _got(match_epipolar(
        jnp.asarray(codes_l), jnp.asarray(codes_r),
        jnp.asarray(valid_l), jnp.asarray(valid_r), 30, 4096, packed=packed,
    ))
    assert got == want
    assert len(want) > 0


@pytest.mark.parametrize("seed", [3, 4])
@pytest.mark.parametrize("packed", [False, True])
def test_global_matches_brute_force(seed, packed):
    rng = np.random.default_rng(seed)
    h, w = 10, 24
    codes_l = rng.integers(0, 60, (h, w)).astype(np.int32)
    codes_r = rng.integers(0, 60, (h, w)).astype(np.int32)
    valid_l = rng.random((h, w)) < 0.5
    valid_r = rng.random((h, w)) < 0.5

    want = brute_force_global(codes_l, codes_r, valid_l, valid_r, 20, 2)
    got = _got(match_global(
        jnp.asarray(codes_l), jnp.asarray(codes_r),
        jnp.asarray(valid_l), jnp.asarray(valid_r), 20, 2, 4096,
        packed=packed,
    ))
    assert got == want


def test_capacity_overflow_truncates_deterministically():
    """count reports the true total; the buffer holds the first `capacity`
    matches in scan order and never garbage."""
    rng = np.random.default_rng(9)
    h, w = 16, 64
    codes = rng.integers(0, 1 << 20, (h, w)).astype(np.int32)
    valid = np.ones((h, w), bool)
    # identical images -> every pixel with a row-unique code matches d=0
    full = _got(match_epipolar(
        jnp.asarray(codes), jnp.asarray(codes),
        jnp.asarray(valid), jnp.asarray(valid), 8, 4096,
    ))
    cap = 17
    (xs, ys, ds), count = match_epipolar(
        jnp.asarray(codes), jnp.asarray(codes),
        jnp.asarray(valid), jnp.asarray(valid), 8, cap,
    )
    assert int(count) == len(full) > cap
    held = set(
        zip(np.asarray(xs).tolist(), np.asarray(ys).tolist(),
            np.asarray(ds).tolist())
    )
    assert held <= full and len(held) == cap
