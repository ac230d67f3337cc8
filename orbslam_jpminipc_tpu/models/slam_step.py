"""The flagship per-frame tracking step as one fused jittable program.

This is the hot path of the whole framework (SURVEY.md §3.1, the per-frame
call stack of Tracking::GrabImage): project the local map into the frame,
match by masked Hamming argmin on the MXU, and refine the 6-DoF pose with
the 4-round chi2-regating optimizer — one XLA program, no host round-trips.
The System's Tracker composes the same kernels with host bookkeeping; this
fused form is what the benchmark and the driver's compile check run.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.camera import frustum_check
from ..ops import matching
from ..solvers import pose_opt


@jax.jit
def tracking_step(
    R0, t0,                # predicted pose (world->cam)
    map_xyz,               # (M, 3) local map points
    map_desc,              # (M, 32) uint8
    map_normal,            # (M, 3)
    map_min_dist,          # (M,)
    map_max_dist,          # (M,)
    map_valid,             # (M,)
    frame_xy,              # (N, 2) undistorted keypoints
    frame_desc,            # (N, 32) uint8
    frame_level,           # (N,) int32
    frame_valid,           # (N,)
    inv_sigma2,            # (L,) per-level information
    scale_factors,         # (L,)
    K4,                    # (4,)
    bounds,                # (4,) image bounds
):
    """Frustum-cull + project + match + pose-optimize. Returns
    (R, t, n_inliers, match_idx, match_mask)."""
    ok, uv, _, view_cos, dist = frustum_check(
        map_xyz, R0, t0, K4, bounds, map_normal, map_min_dist, map_max_dist
    )
    ok = ok & map_valid
    n_levels = scale_factors.shape[0]
    ratio = jnp.maximum(map_max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    pred_level = jnp.clip(
        jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factors[1])),
        0, n_levels - 1,
    ).astype(jnp.int32)
    radius = jnp.where(view_cos > 0.998, 2.5, 4.0)

    m = matching.search_by_projection(
        map_desc, uv, pred_level, ok,
        frame_desc, frame_xy, frame_level, frame_valid,
        scale_factors, radius,
        max_dist=100, nn_ratio=0.8, level_window=(-1, 1),
    )
    # scatter matches to frame features
    n = frame_xy.shape[0]
    feat_pt = jnp.full((n,), -1, jnp.int32)
    feat_pt = feat_pt.at[m.idx].set(
        jnp.where(m.mask, jnp.arange(map_xyz.shape[0], dtype=jnp.int32), -1)
    )
    has = feat_pt >= 0
    xw = map_xyz[jnp.clip(feat_pt, 0, map_xyz.shape[0] - 1)]
    w = inv_sigma2[jnp.clip(frame_level, 0, n_levels - 1)]
    res = pose_opt.optimize_pose(R0, t0, xw, frame_xy, w, has, K4)
    return res.R, res.t, res.n_inliers, m.idx, m.mask


def example_tracking_args(n_map: int = 4096, n_feat: int = 1024, seed: int = 0):
    """Realistic-shape example inputs for compile checks / benchmarks."""
    rng = np.random.default_rng(seed)
    M, N, L = n_map, n_feat, 8
    xyz = np.stack(
        [rng.uniform(-2, 2, M), rng.uniform(-1.5, 1.5, M), rng.uniform(1, 3, M)], 1
    ).astype(np.float32)
    normal = xyz / np.linalg.norm(xyz, axis=1, keepdims=True)
    scale_factors = (1.2 ** np.arange(L)).astype(np.float32)
    return (
        jnp.eye(3), jnp.zeros(3),
        jnp.array(xyz),
        jnp.array(rng.integers(0, 256, (M, 32)).astype(np.uint8)),
        jnp.array(normal.astype(np.float32)),
        jnp.array(np.full(M, 0.5, np.float32)),
        jnp.array(np.full(M, 6.0, np.float32)),
        jnp.ones(M, bool),
        jnp.array(rng.uniform(0, 640, (N, 2)).astype(np.float32)),
        jnp.array(rng.integers(0, 256, (N, 32)).astype(np.uint8)),
        jnp.array(rng.integers(0, L, N).astype(np.int32)),
        jnp.ones(N, bool),
        jnp.array((1.0 / scale_factors ** 2).astype(np.float32)),
        jnp.array(scale_factors),
        jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32),
        jnp.array([0.0, 640.0, 0.0, 480.0], jnp.float32),
    )
