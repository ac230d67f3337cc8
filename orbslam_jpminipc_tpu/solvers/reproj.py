"""Reprojection residuals, analytic Jacobians, and Huber weights.

The measurement model of the whole optimizer suite. Mirrors g2o's
EdgeSE3ProjectXYZ (Thirdparty/g2o/g2o/types/sba/types_six_dof_expmap.cpp:
384-421 — ORB-SLAM's own addition to g2o, with per-edge fx/fy/cx/cy and
hand-derived 2x3 / 2x6 Jacobians), recast as batched closed forms.

Conventions: residual e = uv_obs - project(R x + t) (g2o's sign), pose
tangent xi = [omega, upsilon] with LEFT-multiplicative update
T <- exp(xi) T, so dp/domega = -[p]_x, dp/dupsilon = I for p = R x + t.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.se3 import hat

CHI2_MONO = 5.991  # 2-dof 95% gate
HUBER_DELTA = jnp.sqrt(CHI2_MONO)


def residuals(R, t, xw, uv, K4):
    """e = uv - project(R xw + t). Shapes: xw (..., 3), uv (..., 2)."""
    p = jnp.einsum("...ij,...j->...i", R, xw) + t
    z = p[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = K4[0] * p[..., 0] * inv_z + K4[2]
    v = K4[1] * p[..., 1] * inv_z + K4[3]
    e = uv - jnp.stack([u, v], axis=-1)
    return e, p


def jac_pixel_wrt_point_cam(p, K4):
    """d(projection)/dp for camera-frame point p: (..., 2, 3).

    NOTE this is the Jacobian of the PROJECTION; the residual Jacobian is
    its negation (e = uv - proj).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    inv_z2 = inv_z * inv_z
    fx, fy = K4[0], K4[1]
    zr = jnp.zeros_like(x)
    row0 = jnp.stack([fx * inv_z, zr, -fx * x * inv_z2], axis=-1)
    row1 = jnp.stack([zr, fy * inv_z, -fy * y * inv_z2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def jacobians(R, t, xw, K4):
    """Residual Jacobians: (J_pose (..., 2, 6), J_point (..., 2, 3), p_cam).

    J_pose columns ordered [omega, upsilon]; J_point is wrt the WORLD point.
    """
    p = jnp.einsum("...ij,...j->...i", R, xw) + t
    Jproj = jac_pixel_wrt_point_cam(p, K4)  # (..., 2, 3)
    # dp/dxi = [-hat(p) | I]; de/dxi = -Jproj @ dp/dxi
    Jw = jnp.einsum("...ij,...jk->...ik", Jproj, hat(p))   # = -Jproj @ (-hat p)
    Jv = -Jproj
    Jpose = jnp.concatenate([Jw, Jv], axis=-1)  # (..., 2, 6)
    Jpoint = -jnp.einsum("...ij,...jk->...ik", Jproj, R)
    return Jpose, Jpoint, p


def huber_weight(chi2, delta=HUBER_DELTA):
    """IRLS weight of the Huber kernel at squared error chi2
    (g2o robust_kernel_impl.cpp Huber: w = delta/|e| beyond the knee)."""
    e = jnp.sqrt(jnp.maximum(chi2, 1e-18))
    return jnp.where(e <= delta, 1.0, delta / e)
