"""Epipolar geometry: fundamental/essential matrices from poses, distances.

Replaces LocalMapping::ComputeF12 (src/LocalMapping.cc:474-491) and
ORBmatcher::CheckDistEpipolarLine (src/ORBmatcher.cc:136-153) with batched
closed forms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import hat


def K_matrix(K4: jax.Array) -> jax.Array:
    fx, fy, cx, cy = K4[..., 0], K4[..., 1], K4[..., 2], K4[..., 3]
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, cx], -1),
            jnp.stack([z, fy, cy], -1),
            jnp.stack([z, z, o], -1),
        ],
        axis=-2,
    )


def fundamental_from_poses(R1, t1, R2, t2, K4) -> jax.Array:
    """F12 mapping pixels of view 1 to epipolar lines in view 2? No —
    F such that x2^T F x1 = 0, from world->camera poses of the two views.

    Matches ComputeF12 semantics: relative pose 1->2 via
    R12 = R1 R2^T, t12 = -R12 t2 + t1 gives F12 = K^-T [t12]x R12 K^-1 with
    x1^T F12 x2 = 0 (the reference's convention, LocalMapping.cc:474-491).
    """
    R12 = R1 @ jnp.swapaxes(R2, -1, -2)
    t12 = -jnp.einsum("...ij,...j->...i", R12, t2) + t1
    K = K_matrix(K4)
    Kinv = jnp.linalg.inv(K)
    return jnp.swapaxes(Kinv, -1, -2) @ hat(t12) @ R12 @ Kinv


def epipolar_dist2(uv1: jax.Array, uv2: jax.Array, F12: jax.Array) -> jax.Array:
    """Squared point-to-epipolar-line distance of x2 to line F12^T x1.

    Mirrors CheckDistEpipolarLine (ORBmatcher.cc:136-153): the line in image 2
    is l = F12^T x1 (given the reference's x1^T F12 x2 = 0 convention).
    """
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    a = x1[..., 0] * F12[..., 0, 0] + x1[..., 1] * F12[..., 1, 0] + F12[..., 2, 0]
    b = x1[..., 0] * F12[..., 0, 1] + x1[..., 1] * F12[..., 1, 1] + F12[..., 2, 1]
    c = x1[..., 0] * F12[..., 0, 2] + x1[..., 1] * F12[..., 1, 2] + F12[..., 2, 2]
    num = a * uv2[..., 0] + b * uv2[..., 1] + c
    den = a * a + b * b
    return num * num / jnp.maximum(den, 1e-12)
