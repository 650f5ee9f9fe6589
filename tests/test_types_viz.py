"""Value-type and visualization tests."""

import numpy as np

from opengpc_tpu.types import (
    Correspondence,
    Descriptor,
    Point,
    Support,
    correspondences_from_supports,
    supports_from_array,
    supports_to_array,
)
from opengpc_tpu.viz import (
    dense_disparity_visualization,
    disparity_visualization,
    draw_correspondences,
    draw_line,
    kitti_disparity_colors,
)


def test_support_roundtrip():
    arr = np.array([[10, 20, 5], [3, 4, -2]], np.int32)
    sup = supports_from_array(arr)
    assert sup[0] == Support(10, 20, 5)
    np.testing.assert_array_equal(supports_to_array(sup), arr)


def test_correspondences_from_supports():
    c = correspondences_from_supports(np.array([[10, 20, 4]]))
    assert c[0] == Correspondence(Point(10, 20), Point(6, 20))


def test_descriptor_ordering_by_state():
    a = Descriptor(5, Point(0, 0))
    b = Descriptor(7, Point(9, 9))
    assert a < b and a == Descriptor(5, Point(1, 1))


def test_kitti_colors_shape_and_range():
    c = kitti_disparity_colors(np.array([0, 32, 64, 128, 300]))
    assert c.shape == (5, 3) and c.dtype == np.uint8
    # monotone-ish: d=0 maps into the first (dark) bin
    assert tuple(c[0]) != tuple(c[3])


def test_disparity_visualization_overlays():
    gray = np.zeros((20, 30), np.uint8)
    sup = np.array([[5, 6, 10]])
    out = disparity_visualization(gray, sup)
    assert out.shape == (20, 30, 3)
    assert tuple(out[6, 5]) != (0, 0, 0)
    assert tuple(out[0, 0]) == (0, 0, 0)


def test_dense_disparity_visualization():
    gray = np.zeros((10, 10), np.uint8)
    disp = np.full((10, 10), 64.0)
    valid = np.zeros((10, 10), bool)
    valid[3, 4] = True
    out = dense_disparity_visualization(gray, disp, valid)
    assert tuple(out[3, 4]) != (0, 0, 0) and tuple(out[0, 0]) == (0, 0, 0)


def test_draw_line_clips():
    img = np.zeros((10, 10, 3), np.uint8)
    draw_line(img, -5, 2, 15, 2, (255, 0, 0))
    assert (img[2, :, 0] == 255).all()
    assert img[3].sum() == 0


def test_draw_correspondences():
    gray = np.zeros((20, 40), np.uint8)
    sup = np.array([[30, 10, 8]])
    out = draw_correspondences(gray, sup)
    # line from (30,10) to (22,10)
    assert (out[10, 22:31].sum(axis=1) > 0).all()


def test_draw_triangle():
    from opengpc_tpu.viz import draw_triangle

    img = np.zeros((20, 20, 3), np.uint8)
    draw_triangle(img, [(2, 2), (16, 2), (2, 16)], (0, 255, 0))
    assert tuple(img[3, 3]) == (0, 255, 0)    # inside
    assert tuple(img[15, 15]) == (0, 0, 0)    # outside the hypotenuse
    assert tuple(img[2, 2]) == (0, 255, 0)    # vertex
    # clipping: off-canvas vertices don't crash
    draw_triangle(img, [(-5, -5), (25, 0), (0, 25)], (255, 0, 0))


def test_kitti_colors_reference_compat_mode():
    """compat="reference" uses the rotated-by-one table
    (buffer.hpp:960-963): d=0 lands in the first rotated bin whose left
    color is blue {0,0,1}, vs black {0,0,0} canonically.  Unknown modes
    raise.  (Byte-identity to the real binary's PNG is pinned in
    tests/test_reference_binary.py.)"""
    import pytest

    d = np.array([0.0])
    canon = kitti_disparity_colors(d)
    ref = kitti_disparity_colors(d, compat="reference")
    assert tuple(canon[0]) == (0, 0, 0)
    assert tuple(ref[0]) == (0, 0, 255)
    with pytest.raises(ValueError):
        kitti_disparity_colors(d, compat="bogus")
