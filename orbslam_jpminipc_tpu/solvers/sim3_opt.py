"""Sim3 refinement between two keyframes from matched 3D points.

Replaces Optimizer::OptimizeSim3 (src/Optimizer.cc:1721-1917): a single
VertexSim3Expmap with paired fixed points, forward EdgeSim3ProjectXYZ
(e = uv1 - proj(S12 . x2)) and inverse EdgeInverseSim3ProjectXYZ
(e = uv2 - proj(S12^-1 . x1)), Huber sqrt(10), 5 iterations -> prune
chi2 > 10 -> 10 more iterations. g2o falls back to numeric Jacobians for
these edges (types_seven_dof_expmap.h:129-172, linearizeOplus commented
out); here the 4x7 Jacobian comes from jax.jacfwd of the residual —
exact forward-mode autodiff, vmapped over pairs.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3 as s3
from ..geometry import camera as cam
from .reproj import huber_weight

_CHI2_SIM3 = 10.0
_HUBER_SIM3 = jnp.sqrt(10.0)


class Sim3OptResult(NamedTuple):
    s12: jax.Array
    R12: jax.Array
    t12: jax.Array
    inliers: jax.Array
    n_inliers: jax.Array


@functools.partial(jax.jit, static_argnames=("fix_scale", "iters1", "iters2"))
def optimize_sim3(
    s12_0, R12_0, t12_0,
    x1: jax.Array,      # (N, 3) points in camera-1 frame
    x2: jax.Array,      # (N, 3) matched points in camera-2 frame
    uv1: jax.Array,     # (N, 2)
    uv2: jax.Array,     # (N, 2)
    inv_sigma2_1: jax.Array,
    inv_sigma2_2: jax.Array,
    valid: jax.Array,
    K4: jax.Array,
    fix_scale: bool = False,
    iters1: int = 5,
    iters2: int = 10,
) -> Sim3OptResult:
    def residual(xi, s0, R0, t0, x1p, x2p, uv1p, uv2p):
        s, R, t = s3.retract(s0, R0, t0, xi, fix_scale=fix_scale)
        si, Ri, ti = s3.inverse(s, R, t)
        e1 = uv1p - cam.project(s3.transform(s, R, t, x2p), K4)
        e2 = uv2p - cam.project(s3.transform(si, Ri, ti, x1p), K4)
        return jnp.concatenate([e1, e2])

    res_j = jax.vmap(residual, in_axes=(None, None, None, None, 0, 0, 0, 0))
    jac_j = jax.vmap(
        jax.jacfwd(residual), in_axes=(None, None, None, None, 0, 0, 0, 0)
    )

    def chi2_pair(s, R, t):
        zero = jnp.zeros(7, x1.dtype)
        e = res_j(zero, s, R, t, x1, x2, uv1, uv2)  # (N, 4)
        c1 = jnp.sum(e[:, :2] ** 2, axis=1) * inv_sigma2_1
        c2 = jnp.sum(e[:, 2:] ** 2, axis=1) * inv_sigma2_2
        return c1, c2, e

    def gn_rounds(state, n_iters, active):
        def body(_, st):
            s, R, t = st
            zero = jnp.zeros(7, x1.dtype)
            e = res_j(zero, s, R, t, x1, x2, uv1, uv2)
            J = jac_j(zero, s, R, t, x1, x2, uv1, uv2)  # (N, 4, 7)
            c1 = jnp.sum(e[:, :2] ** 2, axis=1) * inv_sigma2_1
            c2 = jnp.sum(e[:, 2:] ** 2, axis=1) * inv_sigma2_2
            w1 = inv_sigma2_1 * huber_weight(c1, _HUBER_SIM3) * active
            w2 = inv_sigma2_2 * huber_weight(c2, _HUBER_SIM3) * active
            w = jnp.concatenate([jnp.stack([w1, w1], 1), jnp.stack([w2, w2], 1)], axis=1)  # (N,4)
            Jw = J * w[:, :, None]
            H = jnp.einsum("nij,nik->jk", Jw, J)
            b = jnp.einsum("nij,ni->j", Jw, e)
            H = H + 1e-3 * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7, dtype=H.dtype)
            delta = -jnp.linalg.solve(H, b)
            return s3.retract(s, R, t, delta, fix_scale=fix_scale)

        return jax.lax.fori_loop(0, n_iters, body, state)

    active0 = valid.astype(x1.dtype)
    state = gn_rounds((s12_0, R12_0, t12_0), iters1, active0)
    c1, c2, _ = chi2_pair(*state)
    inlier = valid & (c1 < _CHI2_SIM3) & (c2 < _CHI2_SIM3)
    state = gn_rounds(state, iters2, inlier.astype(x1.dtype))
    c1, c2, _ = chi2_pair(*state)
    inlier = valid & (c1 < _CHI2_SIM3) & (c2 < _CHI2_SIM3)
    s, R, t = state
    return Sim3OptResult(
        s12=s, R12=R, t12=t, inliers=inlier, n_inliers=jnp.sum(inlier)
    )
