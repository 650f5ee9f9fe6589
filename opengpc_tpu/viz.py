"""Disparity visualization (KITTI colormap overlay).

Equivalent of the reference's ``getDisparityVisualization``
(/root/reference/lib/gpc/buffer.hpp:876-1014): overlay sparse disparity
supports on the grayscale source image, colored with Andreas Geiger's
8-bin KITTI colormap, disparity normalized to [0, 128] and clamped at 0.8.

Vectorized numpy throughout (host-side output path, not device compute).

Deliberate deviation: the reference's Support overload (buffer.hpp:949-1014)
uses a colormap table rotated by one entry relative to its index-based
overload and the published KITTI devkit (first bin {0,0,1} instead of
{0,0,0}) — almost certainly an editing slip.  We use the canonical KITTI
table (buffer.hpp:891-894).
"""

from __future__ import annotations

import numpy as np

# Canonical KITTI colormap: (r, g, b, weight) per bin (buffer.hpp:891-894).
_MAP = np.array(
    [
        [0, 0, 0, 114],
        [0, 0, 1, 185],
        [1, 0, 0, 114],
        [1, 0, 1, 174],
        [0, 1, 0, 114],
        [0, 1, 1, 185],
        [1, 1, 0, 114],
        [1, 1, 1, 0],
    ],
    dtype=np.float32,
)

_SUM = _MAP[:, 3].sum()
_CUMSUM = np.concatenate([[0.0], np.cumsum(_MAP[:7, 3]) / _SUM]).astype(np.float32)
with np.errstate(divide="ignore"):
    _WEIGHTS = (_SUM / _MAP[:7, 3]).astype(np.float32)  # last bin weight unused


def kitti_disparity_colors(
    d: np.ndarray, min_disparity: float = 0.0, max_disparity: float = 128.0
) -> np.ndarray:
    """Map disparities to (n, 3) uint8 RGB via the KITTI colormap.

    value = clamp((d - min) / (max - min), 0, 0.8); piecewise-linear
    interpolation between bin colors (buffer.hpp:920-944).
    """
    d = np.asarray(d, dtype=np.float32)
    value = np.clip((d - min_disparity) / (max_disparity - min_disparity), 0.0, 0.8)
    bin_idx = np.clip(np.searchsorted(_CUMSUM[1:8], value, side="right"), 0, 6)
    w = 1.0 - (value - _CUMSUM[bin_idx]) * _WEIGHTS[bin_idx]
    w = w[..., None]
    rgb = (w * _MAP[bin_idx, :3] + (1.0 - w) * _MAP[bin_idx + 1, :3]) * 255.0
    return rgb.astype(np.uint8)


def disparity_visualization(
    gray: np.ndarray,
    supports: np.ndarray,
    min_disparity: float = 0.0,
    max_disparity: float = 128.0,
) -> np.ndarray:
    """Overlay (n, 3) int supports (x, y, d) on a (h, w) uint8 gray image.

    Returns an (h, w, 3) uint8 RGB image (buffer.hpp:949-1014 semantics
    with the canonical colormap; see module docstring).
    """
    gray = np.asarray(gray, dtype=np.uint8)
    out = np.repeat(gray[:, :, None], 3, axis=2)
    supports = np.asarray(supports)
    if supports.size == 0:
        return out
    x, y, d = supports[:, 0], supports[:, 1], supports[:, 2]
    out[y, x] = kitti_disparity_colors(d, min_disparity, max_disparity)
    return out
