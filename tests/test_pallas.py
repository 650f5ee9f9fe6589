"""Fused Pallas kernel parity vs the jnp ops (and hence the C++ oracle,
which the jnp ops are pinned against in test_parity.py).

Runs in interpreter mode on the CPU test devices — same kernel program,
no TPU needed (SURVEY.md §4).
"""

import numpy as np
import pytest

from opengpc_tpu import forest as forest_mod
from opengpc_tpu.config import InferenceSettings
from opengpc_tpu.infer import build_sparsematch, supports_to_numpy
from opengpc_tpu.ops.codes import leaf_codes
from opengpc_tpu.ops.fused import fused_codes
from opengpc_tpu.ops.preprocess import box3, candidate_mask, sobel3

import os

FORESTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "forests"
)


def structured_image(rng, h, w):
    small = rng.integers(0, 256, (h // 4 + 2, w // 4 + 2))
    img = np.kron(small, np.ones((4, 4)))[:h, :w]
    return np.clip(img + rng.integers(-12, 13, (h, w)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "shape",
    [
        (64, 96), (100, 250), (436, 1024),
        (37, 130),    # image shorter than one tile (padding-heavy)
        (129, 1023),  # width just under the 128-lane round-up boundary
    ],
)
@pytest.mark.parametrize(
    "forest_file", ["defaultZeroForest.txt", "defaultTauForest.txt"]
)
def test_fused_matches_jnp_ops(shape, forest_file):
    rng = np.random.default_rng(sum(shape))
    img = structured_image(rng, *shape)
    forest = forest_mod.load_forest(os.path.join(FORESTS, forest_file))
    mask = forest_mod.make_filter_mask(forest)
    thr = 5

    codes_f, cand_f = fused_codes(img, mask, thr, interpret=True)
    cand_f = np.asarray(cand_f)
    codes_f = np.asarray(codes_f)

    smooth = box3(img)
    want_cand = np.asarray(candidate_mask(sobel3(img, thr)))
    want_codes = np.asarray(leaf_codes(smooth, mask))

    np.testing.assert_array_equal(cand_f, want_cand)
    assert want_cand.sum() > 0
    np.testing.assert_array_equal(
        codes_f[want_cand], want_codes[want_cand]
    )


@pytest.mark.parametrize("forest_file",
                         ["defaultZeroForest.txt", "defaultTauForest.txt"])
def test_fused_keys_matches_jnp_key_build(forest_file):
    """The key-emitting kernel must produce exactly the sentinel-packed key
    image match._match_epipolar_packed builds from (codes, candidates)."""
    from opengpc_tpu.match import SENTINEL_BASE
    from opengpc_tpu.ops.fused import fused_keys

    rng = np.random.default_rng(3)
    h, w = 100, 250
    img = structured_image(rng, h, w)
    forest = forest_mod.load_forest(os.path.join(FORESTS, forest_file))
    mask = forest_mod.make_filter_mask(forest)

    for pos_base in (0, w):
        got = np.asarray(fused_keys(img, mask, 5, pos_base=pos_base,
                                    sentinel_base=SENTINEL_BASE,
                                    interpret=True))
        cand = np.asarray(candidate_mask(sobel3(img, 5)))
        codes = np.asarray(leaf_codes(box3(img), mask))
        want = np.where(cand, codes,
                        SENTINEL_BASE + pos_base + np.arange(w)[None, :])
        np.testing.assert_array_equal(got, want)


def test_fused_keys_pack_bits_matches_xla_pack():
    """fused_keys(pack_bits=pb) must emit exactly what match._pack_keypos
    builds from the unpacked key image (the single-operand sort layout,
    VERDICT r4 #7)."""
    from opengpc_tpu.match import SENTINEL_BASE, _pack_keypos, _pos_bits
    from opengpc_tpu.ops.fused import fused_keys

    rng = np.random.default_rng(4)
    h, w = 100, 250
    img = structured_image(rng, h, w)
    forest = forest_mod.load_forest(
        os.path.join(FORESTS, "defaultZeroForest.txt"))
    mask = forest_mod.make_filter_mask(forest, max_tests=17)
    pb = _pos_bits(2 * w)
    for pos_base in (0, w):
        plain = fused_keys(img, mask, 5, pos_base=pos_base,
                           sentinel_base=SENTINEL_BASE, interpret=True)
        import jax.numpy as jnp

        pos = jnp.broadcast_to(
            jnp.arange(w, dtype=jnp.int32)[None, :] + pos_base, (h, w))
        want = np.asarray(_pack_keypos(plain, pos, pb))
        got = np.asarray(fused_keys(img, mask, 5, pos_base=pos_base,
                                    sentinel_base=SENTINEL_BASE,
                                    interpret=True, pack_bits=pb))
        np.testing.assert_array_equal(got, want)


def test_pipeline_with_pallas_matches_without():
    rng = np.random.default_rng(9)
    h, w = 96, 160
    left = structured_image(rng, h, w)
    right = np.roll(left, -3, axis=1)
    forest = forest_mod.load_forest(os.path.join(FORESTS, "defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, epipolar_mode=True,
                                 capacity=16384)

    ref = build_sparsematch(forest, settings, use_pallas=False)
    pal = build_sparsematch(forest, settings, use_pallas=True)
    want = set(map(tuple, supports_to_numpy(*ref(left, right)).tolist()))
    got = set(map(tuple, supports_to_numpy(*pal(left, right)).tolist()))
    assert got == want and len(want) > 0


def test_fused_kernel_handles_large_images():
    """The kernels are (64, 1024)-tiled with per-tile DMA from an
    HBM-resident input, so formerly-over-budget sizes (wide AND tall) run
    on the kernel and match the jnp contract path exactly.  (Before the
    rework these shapes raised FusedKernelBudgetError and fell back.)"""
    from opengpc_tpu.ops.codes import leaf_codes
    from opengpc_tpu.ops.preprocess import candidate_mask, sobel3
    from opengpc_tpu.infer import preprocess

    rng = np.random.default_rng(17)
    forest = forest_mod.load_forest(os.path.join(FORESTS, "defaultZeroForest.txt"))
    mask = forest_mod.make_filter_mask(forest)
    for h, w in ((40, 3000), (1500, 260), (200, 3000)):
        # (200, 3000): row AND column tile offsets both nonzero — the
        # combined y0+x0 coordinate case the 2-D tiling introduces
        img = structured_image(rng, h, w)
        codes, cand = fused_codes(img, mask, 5, interpret=True)
        smooth, want_cand = preprocess(img, 5)
        want_codes = leaf_codes(smooth, mask)
        assert (np.asarray(cand) == np.asarray(want_cand)).all(), (h, w)
        sel = np.asarray(want_cand)
        assert (np.asarray(codes)[sel] == np.asarray(want_codes)[sel]).all(), (h, w)
        assert sel.sum() > 100, (h, w)


def test_wide_image_pallas_pipeline_end_to_end():
    """use_pallas=True on a very wide image (formerly beyond the kernel's
    whole-image-in-VMEM budget; now 6 column tiles) produces the same
    supports as the jnp contract path."""
    rng = np.random.default_rng(21)
    h, w = 40, 6000  # 6 column tiles
    left = structured_image(rng, h, w)
    right = np.roll(left, -2, axis=1)
    forest = forest_mod.load_forest(os.path.join(FORESTS, "defaultZeroForest.txt"))
    settings = InferenceSettings(gradient_threshold=5, epipolar_mode=True,
                                 disp_high=16, capacity=65536)
    ref = build_sparsematch(forest, settings, use_pallas=False)
    pal = build_sparsematch(forest, settings, use_pallas=True)
    want = supports_to_numpy(*ref(left, right))
    got = supports_to_numpy(*pal(left, right))
    assert len(want) > 100
    assert set(map(tuple, got.tolist())) == set(map(tuple, want.tolist()))


@pytest.mark.parametrize("shape", [(64, 96), (100, 250), (37, 130), (200, 1100)])
def test_fused_census_matches_jnp(shape):
    from opengpc_tpu.ops.census import census5x5
    from opengpc_tpu.ops.fused import fused_census

    rng = np.random.default_rng(sum(shape) + 7)
    img = structured_image(rng, *shape)
    got = np.asarray(fused_census(img, interpret=True))
    want = np.asarray(census5x5(img))
    assert want.any()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("y0,sh", [(0, 64), (64, 64), (32, 96), (192, 64)])
def test_fused_keys_slab_matches_full_image(y0, sh):
    """fused_keys_slab on rows [y0, y0+sh) of a 256-row image (halo from
    the real neighbors, zeros outside) == the same rows of fused_keys on
    the whole image — the per-shard kernel of the sharded-frame path."""
    from opengpc_tpu.match import SENTINEL_BASE
    from opengpc_tpu.ops.fused import PAD, fused_keys, fused_keys_slab

    rng = np.random.default_rng(y0 + sh)
    h, w = 256, 160
    img = structured_image(rng, h, w)
    forest = forest_mod.load_forest(os.path.join(FORESTS,
                                                 "defaultTauForest.txt"))
    mask = forest_mod.make_filter_mask(forest)
    full = np.asarray(fused_keys(img, mask, 5, pos_base=0,
                                 sentinel_base=SENTINEL_BASE,
                                 interpret=True))
    padded = np.pad(img, ((PAD, PAD), (0, 0)))
    slab = padded[y0:y0 + sh + 2 * PAD]  # rows [y0-PAD, y0+sh+PAD) global
    got = np.asarray(fused_keys_slab(slab, mask, 5, pos_base=0,
                                     sentinel_base=SENTINEL_BASE,
                                     y0=y0, h_total=h, interpret=True))
    np.testing.assert_array_equal(got, full[y0:y0 + sh])
