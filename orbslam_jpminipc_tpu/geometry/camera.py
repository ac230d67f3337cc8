"""Pinhole camera model with radial-tangential distortion.

Replaces the reference's scattered OpenCV camera math: projection in
src/Frame.cc:137-198 (isInFrustum), cv::undistortPoints use at
src/Frame.cc:289-319, and the per-edge fx/fy/cx/cy projection of
g2o EdgeSE3ProjectXYZ (types_six_dof_expmap.cpp:384-421).

All functions are batched over leading dims and jit/vmap-safe.
Intrinsics are a 4-vector ``K4 = [fx, fy, cx, cy]``; distortion a 4-vector
``dist = [k1, k2, p1, p2]`` (set to zeros for an undistorted model).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def project(xc: jax.Array, K4: jax.Array) -> jax.Array:
    """Project camera-frame points (..., 3) to pixels (..., 2). No distortion.

    Matching the reference convention, projection of already-undistorted
    keypoints uses the pinhole model only (distortion is removed once per
    frame at keypoint extraction, Frame.cc:289-319).
    """
    fx, fy, cx, cy = K4[..., 0], K4[..., 1], K4[..., 2], K4[..., 3]
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = fx * xc[..., 0] * inv_z + cx
    v = fy * xc[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1)


def unproject(uv: jax.Array, K4: jax.Array) -> jax.Array:
    """Pixels (..., 2) -> normalized camera rays (..., 3) with z=1."""
    fx, fy, cx, cy = K4[..., 0], K4[..., 1], K4[..., 2], K4[..., 3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def distort_normalized(xy: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply radial-tangential distortion to normalized coords (..., 2)."""
    k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(uv: jax.Array, K4: jax.Array, dist: jax.Array, iters: int = 8) -> jax.Array:
    """Undistort pixel keypoints (cv::undistortPoints equivalent).

    Fixed-point iteration on normalized coordinates (the standard OpenCV
    scheme), fixed `iters` so it stays jit-friendly. Returns pixel coords in
    the *same* K (the reference re-projects with the original camera matrix,
    Frame.cc:304-313).
    """
    fx, fy, cx, cy = K4[..., 0], K4[..., 1], K4[..., 2], K4[..., 3]
    k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        icdist = 1.0 / (1.0 + k1 * r2 + k2 * r2 * r2)
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([(xd - dx) * icdist, (yd - dy) * icdist], axis=-1)

    xy = jax.lax.fori_loop(0, iters, body, jnp.stack([xd, yd], axis=-1))
    u = xy[..., 0] * fx + cx
    v = xy[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def project_distorted(xc: jax.Array, K4: jax.Array, dist: jax.Array) -> jax.Array:
    """Project camera-frame points applying the full distortion model."""
    z = xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xy = jnp.stack([xc[..., 0] * inv_z, xc[..., 1] * inv_z], axis=-1)
    xyd = distort_normalized(xy, dist)
    fx, fy, cx, cy = K4[..., 0], K4[..., 1], K4[..., 2], K4[..., 3]
    return jnp.stack([xyd[..., 0] * fx + cx, xyd[..., 1] * fy + cy], axis=-1)


def in_image(uv: jax.Array, bounds: jax.Array) -> jax.Array:
    """Mask of points inside [min_x, max_x, min_y, max_y] image bounds."""
    return (
        (uv[..., 0] >= bounds[0])
        & (uv[..., 0] < bounds[1])
        & (uv[..., 1] >= bounds[2])
        & (uv[..., 1] < bounds[3])
    )


def frustum_check(
    xw: jax.Array,
    R: jax.Array,
    t: jax.Array,
    K4: jax.Array,
    bounds: jax.Array,
    normal: jax.Array,
    min_dist: jax.Array,
    max_dist: jax.Array,
    view_cos_limit: float = 0.5,
):
    """Batched Frame::isInFrustum (Frame.cc:137-198).

    Args:
      xw: (..., 3) world points; R, t: world->camera; normal: (..., 3) mean
      viewing directions; min/max_dist: scale-invariance distance band.

    Returns (visible_mask, uv, inv_z, view_cos, dist) — everything tracking
    needs to run the projection search and predict the pyramid level.
    """
    xc = jnp.einsum("ij,...j->...i", R, xw) + t
    z = xc[..., 2]
    uv = project(xc, K4)
    Ow = -jnp.einsum("ji,j->i", R, t)
    po = xw - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist, 1e-12)
    ok = (
        (z > 0.0)
        & in_image(uv, bounds)
        & (dist >= min_dist)
        & (dist <= max_dist)
        & (view_cos > view_cos_limit)
    )
    return ok, uv, 1.0 / jnp.maximum(z, 1e-12), view_cos, dist
