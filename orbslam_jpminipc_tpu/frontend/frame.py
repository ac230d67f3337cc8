"""Frame: per-image feature container.

Replaces src/Frame.cc (351 LoC): the constructor-extracts + undistorts +
grid-bins design becomes one jitted extraction program plus a padded
NamedTuple. The reference's 64x48 keypoint grid (Frame.h:35-36) exists only
to accelerate CPU area queries — the TPU matchers mask the dense distance
matrix instead, so no grid is kept.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import camera as cam
from ..ops import extractor


@dataclasses.dataclass
class Frame:
    frame_id: int
    timestamp: float
    xy: np.ndarray        # (N, 2) raw keypoint positions (level-0 scale)
    xy_un: np.ndarray     # (N, 2) undistorted positions
    level: np.ndarray     # (N,) int32
    angle: np.ndarray     # (N,) float32
    response: np.ndarray  # (N,)
    desc: np.ndarray      # (N, 32) uint8
    valid: np.ndarray     # (N,) bool
    # pose (world->cam), set by tracking
    R: np.ndarray | None = None
    t: np.ndarray | None = None
    # map point association per feature (-1 = none), set by tracking
    point: np.ndarray | None = None
    point_gen: np.ndarray | None = None  # map-slot generation at association
    outlier: np.ndarray | None = None

    def __post_init__(self):
        if self.point is None:
            self.point = np.full(len(self.valid), -1, np.int32)
        if self.point_gen is None:
            self.point_gen = np.zeros(len(self.valid), np.int32)
        if self.outlier is None:
            self.outlier = np.zeros(len(self.valid), bool)

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())


@jax.jit
def _undistort(xy, K4, dist):
    return cam.undistort_points(xy, K4, dist, iters=8)


def build_frame(
    image: np.ndarray, cfg: SlamConfig, frame_id: int = 0, timestamp: float = 0.0,
    n_features: int | None = None,
) -> Frame:
    """Extract features and undistort keypoints (Frame.cc:56-123)."""
    feats = extractor.extract(
        jnp.asarray(image, jnp.float32),
        n_features=n_features or cfg.n_features,
        n_levels=cfg.n_levels,
        scale_factor=cfg.scale_factor,
        fast_th=cfg.fast_threshold,
        fast_min_th=cfg.fast_min_threshold,
        use_harris_score=cfg.use_harris_score,
    )
    xy = np.asarray(feats.xy)
    if np.any(cfg.dist4 != 0):
        xy_un = np.asarray(_undistort(feats.xy, jnp.array(cfg.K4), jnp.array(cfg.dist4)))
    else:
        xy_un = xy
    return Frame(
        frame_id=frame_id,
        timestamp=timestamp,
        xy=xy,
        xy_un=xy_un,
        level=np.asarray(feats.level),
        angle=np.asarray(feats.angle),
        response=np.asarray(feats.response),
        desc=np.asarray(feats.desc),
        valid=np.asarray(feats.valid),
    )


def predict_scale_level(dist: np.ndarray, max_dist: np.ndarray, scale_factor: float,
                        n_levels: int) -> np.ndarray:
    """Pyramid-level prediction from distance within the scale band
    (MapPoint::PredictScale usage in Frame::isInFrustum, Frame.cc:137-198)."""
    ratio = np.maximum(max_dist, 1e-9) / np.maximum(dist, 1e-9)
    level = np.ceil(np.log(np.maximum(ratio, 1e-9)) / np.log(scale_factor))
    return np.clip(level, 0, n_levels - 1).astype(np.int32)
