"""Sim3 RANSAC from 3D-3D correspondences: batched Horn closed form.

Replaces src/Sim3Solver.cc (420 LoC). The reference iterates RANSAC
sequentially, each iteration running Horn's 1987 absolute-orientation
closed form (computeT, Sim3Solver.cc:226-332: centroids, M = Pr1 Pr2^T,
the 4x4 N matrix whose top eigenvector is the rotation quaternion, scale
from the rotated-cloud projection, two-way reprojection gating with
chi2 <= 9.210 sigma^2, CheckInliers :335-359). Here ALL hypotheses are one
batched eigendecomposition.

Correspondences are in CAMERA coordinates of the two keyframes (the
reference transforms map points into each camera frame first,
Sim3Solver.cc:94-98). The estimated T12 maps camera-2 coords to camera-1:
x1 = s12 R12 x2 + t12.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam


class Sim3Result(NamedTuple):
    success: jax.Array
    s12: jax.Array
    R12: jax.Array
    t12: jax.Array
    inliers: jax.Array   # (N,) bool
    n_inliers: jax.Array


def horn_sim3(p1: jax.Array, p2: jax.Array, fix_scale: bool = False):
    """Closed-form Sim3 aligning point sets: x1 ~ s R x2 + t.

    p1, p2: (..., M, 3) paired points. Returns (s, R, t) batched.
    """
    O1 = jnp.mean(p1, axis=-2, keepdims=True)
    O2 = jnp.mean(p2, axis=-2, keepdims=True)
    Pr1 = p1 - O1
    Pr2 = p2 - O2
    # M = sum_m pr2_m pr1_m^T: with the standard Horn N-matrix below, the
    # top eigenvector is the quaternion of R mapping frame 2 -> frame 1.
    M = jnp.einsum("...mi,...mj->...ij", Pr2, Pr1)
    m = lambda i, j: M[..., i, j]
    N = jnp.stack(
        [
            jnp.stack([m(0, 0) + m(1, 1) + m(2, 2), m(1, 2) - m(2, 1), m(2, 0) - m(0, 2), m(0, 1) - m(1, 0)], -1),
            jnp.stack([m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2), m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)], -1),
            jnp.stack([m(2, 0) - m(0, 2), m(0, 1) + m(1, 0), -m(0, 0) + m(1, 1) - m(2, 2), m(1, 2) + m(2, 1)], -1),
            jnp.stack([m(0, 1) - m(1, 0), m(2, 0) + m(0, 2), m(1, 2) + m(2, 1), -m(0, 0) - m(1, 1) + m(2, 2)], -1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]  # top eigenvector = [w, x, y, z]
    from ..geometry.se3 import mat_from_quat

    R = mat_from_quat(q)
    RPr2 = jnp.einsum("...ij,...mj->...mi", R, Pr2)
    if fix_scale:
        s = jnp.ones(p1.shape[:-2], p1.dtype)
    else:
        num = jnp.sum(Pr1 * RPr2, axis=(-2, -1))
        den = jnp.sum(RPr2 * RPr2, axis=(-2, -1))
        s = num / jnp.maximum(den, 1e-12)
    t = O1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, O2[..., 0, :])
    return s, R, t


def _check_inliers(s, R, t, p1, p2, uv1, uv2, K4, max_err1, max_err2):
    """Two-way reprojection gate (CheckInliers, Sim3Solver.cc:335-359)."""
    # transform p2 into cam1 with T12, project, compare with uv1
    x2in1 = s[..., None, None] * jnp.einsum("...ij,...mj->...mi", R, p2) + t[..., None, :]
    e1 = cam.project(x2in1, K4) - uv1
    # inverse: x1 in cam2
    s_inv = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)
    x1in2 = s_inv[..., None, None] * jnp.einsum("...ij,...mj->...mi", Rt, p1) + t_inv[..., None, :]
    e2 = cam.project(x1in2, K4) - uv2
    ok = (jnp.sum(e1 * e1, axis=-1) < max_err1) & (jnp.sum(e2 * e2, axis=-1) < max_err2)
    return ok


def solve_sim3(
    key: jax.Array,
    p1: jax.Array,        # (N, 3) points in camera-1 frame
    p2: jax.Array,        # (N, 3) matched points in camera-2 frame
    uv1: jax.Array,       # (N, 2) their pixels in image 1
    uv2: jax.Array,       # (N, 2) their pixels in image 2
    mask: jax.Array,      # (N,) bool
    K4: jax.Array,
    max_err1: jax.Array,  # (N,) 9.21 * sigma2(level) gates per point
    max_err2: jax.Array,
    n_hyp: int = 128,
    min_inliers: int = 20,
    fix_scale: bool = False,
) -> Sim3Result:
    """All-hypotheses Sim3 RANSAC (Sim3Solver::iterate, fully batched)."""
    n = p1.shape[0]
    scores = jax.random.uniform(key, (n_hyp, n))
    scores = jnp.where(mask[None, :], scores, -1.0)
    _, sets = jax.lax.top_k(scores, 3)  # (n_hyp, 3)

    s_h, R_h, t_h = horn_sim3(p1[sets], p2[sets], fix_scale=fix_scale)
    ok = _check_inliers(
        s_h, R_h, t_h, p1[None], p2[None], uv1[None], uv2[None], K4,
        max_err1[None], max_err2[None],
    )
    ok = ok & mask[None, :] & (s_h[:, None] > 0)
    counts = jnp.sum(ok, axis=1)
    best = jnp.argmax(counts)
    n_in = counts[best]

    # refine on the best inlier set with one more Horn fit (reference
    # `Refine`-like step; weights = inlier mask)
    w = ok[best].astype(p1.dtype)[:, None]
    nw = jnp.maximum(jnp.sum(w), 3.0)
    # masked Horn: re-center using only inliers
    O1 = jnp.sum(p1 * w, axis=0) / nw
    O2 = jnp.sum(p2 * w, axis=0) / nw
    Pr1 = (p1 - O1) * w
    Pr2 = (p2 - O2) * w
    sr, Rr, tr = horn_sim3(Pr1[None] + O1, Pr2[None] + O2, fix_scale=fix_scale)
    # (adding back the centroid keeps masked rows at the centroid — they
    # contribute zero to M and to the scale sums)
    sr, Rr, tr = sr[0], Rr[0], tr[0]
    ok_r = _check_inliers(sr, Rr, tr, p1, p2, uv1, uv2, K4, max_err1, max_err2) & mask
    n_r = jnp.sum(ok_r)

    use_refined = n_r >= n_in
    s_f = jnp.where(use_refined, sr, s_h[best])
    R_f = jnp.where(use_refined, Rr, R_h[best])
    t_f = jnp.where(use_refined, tr, t_h[best])
    in_f = jnp.where(use_refined, ok_r, ok[best] & mask)
    n_f = jnp.maximum(n_r, n_in)
    return Sim3Result(
        success=n_f >= min_inliers,
        s12=s_f, R12=R_f, t12=t_f,
        inliers=in_f, n_inliers=n_f,
    )
