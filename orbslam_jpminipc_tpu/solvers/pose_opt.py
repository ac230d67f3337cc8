"""Pose-only optimization: one SE3 vertex, fixed points, 4-round regating.

Replaces Optimizer::PoseOptimization (src/Optimizer.cc:154-285): a g2o graph
with a single VertexSE3Expmap, unary edges to fixed map points, Huber kernel
sqrt(5.991), solved 4 rounds x (10,10,7,5) LM iterations with chi^2 outlier
re-leveling between rounds (gates {9.21, 7.378, 5.991, 5.991}) and the robust
kernel dropped after round 2 — here as fixed-shape masked arrays inside one
jitted lax loop nest (no dynamic edge removal: outliers are masks).

Returns the refined pose and the final inlier mask (the reference returns
nInitialCorrespondences - nBad, Tracking uses >= 10 as success).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, compose
from .reproj import residuals, jacobians, huber_weight
from .linalg3 import solve6_spd

_CHI2_GATES = (9.210, 7.378, 5.991, 5.991)
_ROUND_ITERS = (10, 10, 7, 5)


class PoseOptResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inliers: jax.Array   # (N,) bool
    n_inliers: jax.Array
    chi2: jax.Array      # final total chi2 over inliers


def _gauss_newton_step(R, t, xw, uv, K4, w, lam):
    """One damped GN step over active (weighted) observations."""
    e, _ = residuals(R, t, xw, uv, K4)
    Jp, _, _ = jacobians(R, t, xw, K4)
    # weighted normal equations: H = sum J^T w J, b = sum J^T w e
    Jw = Jp * w[..., None, None]
    H = jnp.einsum("nij,nik->jk", Jw, Jp)
    b = jnp.einsum("nij,ni->j", Jw, e)
    H = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6, dtype=H.dtype)
    # closed-form blockwise solve: tiny LU factorizations lower to slow
    # scalar loops on TPU, and this 6x6 solve sits on the sequential
    # critical path of every GN iteration
    delta = -solve6_spd(H, b)
    dR, dt = exp_se3(delta)
    return compose(dR, dt, R, t)


@functools.partial(jax.jit, static_argnames=("use_huber_rounds",))
def optimize_pose(
    R0: jax.Array,
    t0: jax.Array,
    xw: jax.Array,          # (N, 3) fixed map points
    uv: jax.Array,          # (N, 2) observed (undistorted) keypoints
    inv_sigma2: jax.Array,  # (N,) per-observation information weight
    valid: jax.Array,       # (N,) bool — has a map point match
    K4: jax.Array,
    use_huber_rounds: int = 2,
) -> PoseOptResult:
    """4-round pose refinement with chi2 regating (Optimizer.cc:242-276)."""
    inlier = valid

    def chi2_of(R, t):
        e, p = residuals(R, t, xw, uv, K4)
        c = jnp.sum(e * e, axis=-1) * inv_sigma2
        return c, p[..., 2] > 0

    R, t = R0, t0
    for rnd in range(4):
        gate = _CHI2_GATES[rnd]
        use_huber = rnd < use_huber_rounds

        def lm_body(_, Rt):
            R, t = Rt
            c, _ = chi2_of(R, t)
            w = inv_sigma2 * jnp.where(inlier, 1.0, 0.0)
            if use_huber:
                w = w * huber_weight(c)
            return _gauss_newton_step(R, t, xw, uv, K4, w, jnp.float32(1e-3))

        R, t = jax.lax.fori_loop(0, _ROUND_ITERS[rnd], lm_body, (R, t))
        # re-level: recompute inliers from scratch (outliers can return)
        c, pos = chi2_of(R, t)
        inlier = valid & (c <= gate) & pos

    c, _ = chi2_of(R, t)
    return PoseOptResult(
        R=R,
        t=t,
        inliers=inlier,
        n_inliers=jnp.sum(inlier),
        chi2=jnp.sum(jnp.where(inlier, c, 0.0)),
    )
