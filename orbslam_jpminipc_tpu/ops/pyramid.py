"""Image pyramid with OpenCV-compatible geometry.

Replaces ORBextractor::ComputePyramid (src/ORBextractor.cc:781-822). The
reference resizes level-to-level with bilinear interpolation; we do the same
(jax.image.resize 'linear' uses half-pixel sample positions, matching
cv::resize INTER_LINEAR). Shapes are static per level (computed from config
at trace time), so one jitted extraction program covers all levels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def level_sizes(h: int, w: int, n_levels: int, scale_factor: float) -> list[tuple[int, int]]:
    """Static (height, width) per level, mirroring the reference's rounding."""
    sizes = []
    for lvl in range(n_levels):
        s = scale_factor ** lvl
        sizes.append((int(round(h / s)), int(round(w / s))))
    return sizes


def scale_factors(n_levels: int, scale_factor: float):
    """Per-level scale and sigma2 tables (Frame.cc:95-107 equivalents)."""
    import numpy as np

    scales = np.array([scale_factor ** i for i in range(n_levels)], np.float32)
    return scales, scales ** 2


def build_pyramid(image: jax.Array, n_levels: int, scale_factor: float) -> list[jax.Array]:
    """Grayscale image (H, W) float32 -> list of per-level images.

    Level-to-level resize (not always-from-level-0), as the reference does,
    which slightly low-passes higher levels — this matters for FAST parity.
    """
    h, w = image.shape
    sizes = level_sizes(h, w, n_levels, scale_factor)
    levels = [image]
    for lvl in range(1, n_levels):
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, sizes[lvl], method="linear", antialias=False)
        )
    return levels
