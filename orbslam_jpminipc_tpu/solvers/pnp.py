"""Batched PnP RANSAC for relocalization.

Replaces src/PnPsolver.cc (994 LoC, EPnP + adaptive RANSAC). The reference
draws sequential 4-point EPnP minimal sets (PnPsolver.cc:137-230) with the
full EPnP machinery (control points, barycentric coordinates, 12x12 SVD,
beta cases, Gauss-Newton). Here RANSAC is one batched program over all
hypotheses using 6-point DLT minimal sets: the 2n x 12 projection system is
solved by a batched 12x12 eigendecomposition, the rotation factor is
orthonormalized by SVD, and cheirality fixes the sign. SURVEY.md §7.7
sanctions DLT minimal sets in place of EPnP when accuracy holds — the
final accuracy comes from the pose_opt refinement ladder that follows
relocalization either way (Tracking.cc:988-1027).

Inlier gating matches the reference: squared reprojection error against
per-point 5.991 * sigma2(octave) (PnPsolver.cc:280-311 mvMaxError).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from .epnp import epnp_pose


class PnPResult(NamedTuple):
    success: jax.Array
    R: jax.Array          # (3, 3) world->camera
    t: jax.Array          # (3,)
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array


def _dlt_pose(xw: jax.Array, rays: jax.Array, w: jax.Array):
    """Weighted DLT pose from 2D-3D: xw (..., M, 3), rays (..., M, 2)
    normalized image coords, w (..., M) weights. Returns (R, t, ok)."""
    x, y, z = xw[..., 0], xw[..., 1], xw[..., 2]
    u, v = rays[..., 0], rays[..., 1]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    r1 = jnp.stack([x, y, z, o, zr, zr, zr, zr, -u * x, -u * y, -u * z, -u], axis=-1)
    r2 = jnp.stack([zr, zr, zr, zr, x, y, z, o, -v * x, -v * y, -v * z, -v], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)  # (..., 2M, 12)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0]
    P = p.reshape(*p.shape[:-1], 3, 4)
    # cheirality sign on the PROJECTIVE matrix first: the projective depth
    # w_i = P_row3 . [x; 1] must be positive for points in front.
    xh = jnp.concatenate([xw, jnp.ones_like(xw[..., :1])], axis=-1)
    depth = jnp.einsum("...j,...mj->...m", P[..., 2, :], xh)
    sign = jnp.where(jnp.sum(jnp.sign(depth) * w, axis=-1) < 0, -1.0, 1.0)
    P = P * sign[..., None, None]
    M = P[..., :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack(
        [jnp.ones_like(detUV), jnp.ones_like(detUV), detUV], axis=-1
    )
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.mean(S, axis=-1)
    t = P[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    ok = (
        jnp.isfinite(R).all(axis=(-2, -1))
        & jnp.isfinite(t).all(axis=-1)
        & (detUV > 0)  # genuine poses orthonormalize without reflection
    )
    return R, t, ok


def solve_pnp(
    key: jax.Array,
    xw: jax.Array,        # (N, 3) world points
    uv: jax.Array,        # (N, 2) observed pixels (undistorted)
    mask: jax.Array,      # (N,) bool
    K4: jax.Array,
    max_err2: jax.Array,  # (N,) per-point chi2 gates (5.991 * sigma2)
    n_hyp: int = 256,
    min_inliers: int = 10,
    min_set: int = 4,
) -> PnPResult:
    """All-hypotheses EPnP RANSAC with inlier refit.

    EPnP minimal sets of 4 (the reference's mRansacMinSet,
    PnPsolver.cc:93-129) vmapped over n_hyp hypotheses. The reference's
    adaptive iteration count (:93-129) bounded work on a CPU; the batched
    program runs a fixed superset of hypotheses in one launch, which is
    both cheaper per hypothesis and strictly more thorough."""
    n = xw.shape[0]
    scores = jax.random.uniform(key, (n_hyp, n))
    scores = jnp.where(mask[None, :], scores, -1.0)
    _, sets = jax.lax.top_k(scores, min_set)

    w_min = jnp.ones((n_hyp, min_set), xw.dtype)
    R_h, t_h, ok_h = epnp_pose(xw[sets], uv[sets], w_min, K4)

    # score hypotheses by inliers over all points (CheckInliers :280-311)
    xc = jnp.einsum("hij,nj->hni", R_h, xw) + t_h[:, None, :]
    uv_proj = cam.project(xc, K4)
    err2 = jnp.sum((uv_proj - uv[None]) ** 2, axis=-1)
    inl = (err2 <= max_err2[None]) & (xc[..., 2] > 0) & mask[None] & ok_h[:, None]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # refit EPnP on the best hypothesis's inliers (PnPsolver::Refine
    # :232-277 — the reference also re-runs compute_pose on the inlier set)
    w_all = inl[best].astype(xw.dtype)
    R_r, t_r, ok_r = epnp_pose(xw[None], uv[None], w_all[None], K4)
    R_r, t_r, ok_r = R_r[0], t_r[0], ok_r[0]
    xc_r = jnp.einsum("ij,nj->ni", R_r, xw) + t_r
    err2_r = jnp.sum((cam.project(xc_r, K4) - uv) ** 2, axis=-1)
    inl_r = (err2_r <= max_err2) & (xc_r[..., 2] > 0) & mask & ok_r

    use_refined = jnp.sum(inl_r) >= counts[best]
    R_f = jnp.where(use_refined, R_r, R_h[best])
    t_f = jnp.where(use_refined, t_r, t_h[best])
    in_f = jnp.where(use_refined, inl_r, inl[best])
    n_f = jnp.sum(in_f)
    return PnPResult(
        success=n_f >= min_inliers, R=R_f, t=t_f, inliers=in_f, n_inliers=n_f
    )
