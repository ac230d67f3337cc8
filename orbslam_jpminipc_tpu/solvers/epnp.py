"""Batched EPnP (Lepetit et al. 2009) — the reference's PnP core.

Replaces the DLT stand-in with the real algorithm of src/PnPsolver.cc:
control points via centroid + PCA (choose_control_points :347-380),
barycentric coordinates (:383-406), the 2N x 12 M matrix (fill_M :408-442),
its null space from the 12x12 MtM eigendecomposition (:449-478), the three
beta approximations over the L_6x10 system (find_betas_approx_{1,2,3}
:639-731), Gauss-Newton refinement of the betas (gauss_newton :812-830),
and the rigid Horn alignment for the final pose (estimate_R_and_t
:541-593). All of it vmapped over RANSAC hypotheses — the reference's
sequential `iterate(n)` loop (:137-230) becomes one batched program.

Weighted form: every per-point quantity carries a weight (1/0 mask), so
the same kernel serves the 4-point minimal sets AND the all-inlier Refine
(:232-277).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _weighted_control_points(xw, w):
    """Centroid + PCA control points (choose_control_points :347-380).

    xw: (..., M, 3), w: (..., M) weights. Returns (..., 4, 3)."""
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c0 = jnp.sum(xw * w[..., None], axis=-2) / wsum
    d = (xw - c0[..., None, :]) * jnp.sqrt(w)[..., None]
    PtP = jnp.einsum("...mi,...mj->...ij", d, d)
    vals, vecs = jnp.linalg.eigh(PtP)          # ascending
    # k_i = sqrt(lambda_i / N): the reference divides by the point count
    k = jnp.sqrt(jnp.maximum(vals, 1e-12) / wsum)
    # descending order like cvSVD's convention (largest first)
    cs = c0[..., None, :] + (k[..., ::-1, None] * jnp.swapaxes(vecs, -1, -2)[..., ::-1, :])
    return jnp.concatenate([c0[..., None, :], cs], axis=-2)  # (..., 4, 3)


def _barycentric(xw, ctrl):
    """alphas (..., M, 4) with sum_j alpha_j c_j = x, sum alpha = 1
    (compute_barycentric_coordinates :383-406)."""
    C = jnp.concatenate(
        [jnp.swapaxes(ctrl, -1, -2),
         jnp.ones_like(ctrl[..., None, :, 0])], axis=-2)  # (..., 4, 4)
    X = jnp.concatenate([xw, jnp.ones_like(xw[..., :1])], axis=-1)  # (..., M, 4)
    # SVD pseudo-inverse, NOT inv: for (near-)coplanar world points the PCA
    # control points collapse (third eigenvalue ~ 0) and C goes singular —
    # the reference inverts CC with CV_SVD (PnPsolver.cc:383-406), which
    # degrades gracefully on planar scenes (walls/floors are the common
    # relocalization case). inv() would return NaNs and kill every
    # hypothesis outright.
    Cinv = jnp.linalg.pinv(C, rtol=1e-6)
    return jnp.einsum("...ij,...mj->...mi", Cinv, X)


def _fill_MtM(alphas, uv, w, K4):
    """MtM (..., 12, 12) from the weighted 2N x 12 M matrix (fill_M)."""
    fu, fv, uc, vc = K4[0], K4[1], K4[2], K4[3]
    u, v = uv[..., 0], uv[..., 1]
    a = alphas  # (..., M, 4)
    # row_u[j*3 + (0,1,2)] = (a_j fu, 0, a_j (uc - u))
    zero = jnp.zeros_like(a)
    ru = jnp.stack([a * fu, zero, a * (uc - u)[..., None]], axis=-1).reshape(
        *a.shape[:-1], 12)
    rv = jnp.stack([zero, a * fv, a * (vc - v)[..., None]], axis=-1).reshape(
        *a.shape[:-1], 12)
    sw = w[..., None]
    MtM = (jnp.einsum("...mi,...mj->...ij", ru * sw, ru)
           + jnp.einsum("...mi,...mj->...ij", rv * sw, rv))
    return MtM


# plain numpy: a module-level jnp constant would be created inside
# whatever trace first imports this module (tracer leak)
_IDX6 = np.array([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])


def _rho(ctrl):
    """Squared distances between the 4 world control points (..., 6)."""
    d = ctrl[..., _IDX6[:, 0], :] - ctrl[..., _IDX6[:, 1], :]
    return jnp.sum(d * d, axis=-1)


def _v_diffs(V):
    """V: (..., 4, 4, 3) null-space vectors as per-control-point 3-vectors
    -> dv (..., 4, 6, 3): differences of control-point coordinates for
    each null vector and each of the 6 pairs."""
    return V[..., :, _IDX6[:, 0], :] - V[..., :, _IDX6[:, 1], :]


def _L6x10(dv):
    """The 6x10 system of beta quadratic terms (compute_L_6x10 :747-784).

    Column order (matching the reference): [b11 b12 b22 b13 b23 b33 b14
    b24 b34 b44]."""
    d1, d2, d3, d4 = dv[..., 0, :, :], dv[..., 1, :, :], dv[..., 2, :, :], dv[..., 3, :, :]
    dot = lambda a, b: jnp.sum(a * b, axis=-1)
    cols = [
        dot(d1, d1), 2 * dot(d1, d2), dot(d2, d2), 2 * dot(d1, d3),
        2 * dot(d2, d3), dot(d3, d3), 2 * dot(d1, d4), 2 * dot(d2, d4),
        2 * dot(d3, d4), dot(d4, d4),
    ]
    return jnp.stack(cols, axis=-1)  # (..., 6, 10)


def _lstsq(A, b, reg=1e-9):
    """Small least squares via normal equations."""
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    Atb = jnp.einsum("...ki,...k->...i", A, b)
    n = AtA.shape[-1]
    return jnp.linalg.solve(AtA + reg * jnp.eye(n, dtype=A.dtype), Atb[..., None])[..., 0]


def _betas_approx_1(L, rho):
    """betas_approx_1: [b11 b12 b13 b14] (:639-664)."""
    A = L[..., (0, 1, 3, 6)]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[..., 0]))
    b1 = jnp.where(x[..., 0] < 0, -b1, b1)
    rest = x[..., 1:] / jnp.where(jnp.abs(b1[..., None]) < 1e-12, 1e-12, b1[..., None])
    return jnp.concatenate([b1[..., None], rest], axis=-1)


def _betas_approx_2(L, rho):
    """betas_approx_2: [b11 b12 b22] (:672-698)."""
    A = L[..., (0, 1, 2)]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[..., 0]))
    b2 = jnp.sqrt(jnp.abs(x[..., 2]))
    # sign consistency via b12
    b2 = jnp.where(x[..., 1] < 0, -b2, b2)
    neg = (x[..., 0] < 0)
    b1 = jnp.where(neg, -b1, b1)  # keeps b1*b1 sign convention of reference
    z = jnp.zeros_like(b1)
    return jnp.stack([b1, b2, z, z], axis=-1)


def _betas_approx_3(L, rho):
    """betas_approx_3: [b11 b12 b22 b13 b23] (:706-731)."""
    A = L[..., (0, 1, 2, 3, 4)]
    x = _lstsq(A, rho)
    b1 = jnp.sqrt(jnp.abs(x[..., 0]))
    b1 = jnp.where(x[..., 0] < 0, -b1, b1)
    b2 = jnp.sqrt(jnp.abs(x[..., 2]))
    b2 = jnp.where(x[..., 1] < 0, -b2, b2)
    safe_b1 = jnp.where(jnp.abs(b1) < 1e-12, 1e-12, b1)
    b3 = x[..., 3] / safe_b1
    z = jnp.zeros_like(b1)
    return jnp.stack([b1, b2, b3, z], axis=-1)


def _gauss_newton(L, rho, betas, iters: int = 5):
    """Refine betas on the 6 control-distance residuals (:812-830)."""
    def body(_, b):
        b1, b2, b3, b4 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        q = jnp.stack([b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3,
                       b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4], axis=-1)
        r = rho - jnp.einsum("...ij,...j->...i", L, q)
        # d(q)/d(b): (..., 10, 4) -> J = L @ dq (..., 6, 4)
        z = jnp.zeros_like(b1)
        two = 2.0
        dq = jnp.stack([
            jnp.stack([two * b1, z, z, z], -1),
            jnp.stack([b2, b1, z, z], -1),
            jnp.stack([z, two * b2, z, z], -1),
            jnp.stack([b3, z, b1, z], -1),
            jnp.stack([z, b3, b2, z], -1),
            jnp.stack([z, z, two * b3, z], -1),
            jnp.stack([b4, z, z, b1], -1),
            jnp.stack([z, b4, z, b2], -1),
            jnp.stack([z, z, b4, b3], -1),
            jnp.stack([z, z, z, two * b4], -1),
        ], axis=-2)  # (..., 10, 4)
        J = jnp.einsum("...ik,...kj->...ij", L, dq)  # (..., 6, 4)
        db = _lstsq(J, r, reg=1e-8)
        return b + db

    return jax.lax.fori_loop(0, iters, body, betas)


def _pose_from_betas(betas, V, alphas, xw, w):
    """Camera-frame control points -> rigid Horn alignment
    (compute_ccs/compute_pcs + estimate_R_and_t :499-593)."""
    # ccs (..., 4, 3) = sum_k beta_k V_k
    ccs = jnp.einsum("...k,...kcj->...cj", betas, V)
    pcs = jnp.einsum("...mc,...cj->...mj", alphas, ccs)  # (..., M, 3)
    # depth sign fix (solve_for_sign :487-497)
    neg = jnp.sum(jnp.where(w > 0, jnp.sign(pcs[..., 2]), 0.0), axis=-1) < 0
    pcs = jnp.where(neg[..., None, None], -pcs, pcs)

    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    pc0 = jnp.sum(pcs * w[..., None], axis=-2) / wsum
    pw0 = jnp.sum(xw * w[..., None], axis=-2) / wsum
    dc = (pcs - pc0[..., None, :]) * w[..., None]
    dw = xw - pw0[..., None, :]
    H = jnp.einsum("...mi,...mj->...ij", dc, dw)   # cam x world
    U, _, Vt = jnp.linalg.svd(H)
    detUV = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV], axis=-1)
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    t = pc0 - jnp.einsum("...ij,...j->...i", R, pw0)
    return R, t


def epnp_pose(xw, uv, w, K4):
    """Weighted batched EPnP. xw: (..., M, 3); uv: (..., M, 2) pixels;
    w: (..., M) weights (0 masks a point out). Returns (R, t, ok) with the
    best of the three beta cases by weighted reprojection error —
    compute_pose (:449-478)."""
    ctrl = _weighted_control_points(xw, w)
    alphas = _barycentric(xw, ctrl)
    MtM = _fill_MtM(alphas, uv, w, K4)
    _, vecs = jnp.linalg.eigh(MtM)           # ascending eigenvalues
    # 4 smallest eigenvectors as (4 vectors, 4 control points, 3)
    V = jnp.swapaxes(vecs[..., :, :4], -1, -2).reshape(*MtM.shape[:-2], 4, 4, 3)
    rho = _rho(ctrl)
    dv = _v_diffs(V)
    L = _L6x10(dv)

    def err_of(betas):
        R, t = _pose_from_betas(betas, V, alphas, xw, w)
        xc = jnp.einsum("...ij,...mj->...mi", R, xw) + t[..., None, :]
        z = jnp.maximum(xc[..., 2], 1e-9)
        up = K4[0] * xc[..., 0] / z + K4[2]
        vp = K4[1] * xc[..., 1] / z + K4[3]
        e = (up - uv[..., 0]) ** 2 + (vp - uv[..., 1]) ** 2
        return jnp.sum(e * w, axis=-1), R, t

    best_e = None
    best_R = best_t = None
    for approx in (_betas_approx_1, _betas_approx_2, _betas_approx_3):
        betas = _gauss_newton(L, rho, approx(L, rho))
        e, R, t = err_of(betas)
        e = jnp.where(jnp.isfinite(e), e, jnp.inf)
        if best_e is None:
            best_e, best_R, best_t = e, R, t
        else:
            take = e < best_e
            best_e = jnp.where(take, e, best_e)
            best_R = jnp.where(take[..., None, None], R, best_R)
            best_t = jnp.where(take[..., None], t, best_t)
    ok = (jnp.isfinite(best_e)
          & jnp.isfinite(best_R).all(axis=(-2, -1))
          & jnp.isfinite(best_t).all(axis=-1))
    return best_R, best_t, ok
