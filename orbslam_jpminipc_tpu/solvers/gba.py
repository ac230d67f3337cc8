"""Scalable global bundle adjustment: implicit-Schur PCG, full LM.

Replaces Optimizer::GlobalBundleAdjustemnt / BundleAdjustment over the WHOLE
map (src/Optimizer.cc:38-152) at full capacity. solvers/ba.py materializes
the dense per-(point, camera) coupling A (P, K, 6, 3) — exact and fast for
the local problem (K <= 48), but ~300 MB and O(P*K) compute at map capacity
(P=16384, K=256) even though each point sees <= MAX_OBS cameras.

This solver never materializes the coupling. Per LM iteration:

  * per-observation residuals/Jacobians and the per-point 3x3 Hessian
    blocks Hll (scatter-add by point), per-camera 6x6 blocks Hcc
    (scatter-add by camera) — all O(O) work on flat padded arrays;
  * the reduced camera system  S = Hcc + lam I - A U A^T  (U = (Hll+lam)^-1)
    is solved by PRECONDITIONED CG with the Schur matvec applied
    implicitly through the observation lists:
        g_o   = Y_o^T x[kf_o]            (O, 3)   gather + 18 flops/obs
        v_p   = segment_sum_p(g_o)       (P, 3)   scatter-add
        u_p   = U_p v_p                  (P, 3)
        h_o   = Y_o u_{pt_o}             (O, 6)   gather + 18 flops/obs
        S x   = (Hcc + lam) x - scatter_add_c(h_o)
    with block-Jacobi preconditioner M = (Hcc + lam I)^-1 (batched 6x6
    inverse). Memory is O(O*18 + K*36 + P*9) — capacity-independent of K*P;
  * LM damping follows g2o's gain-ratio schedule
    (optimization_algorithm_levenberg.cpp:100-160): rho = actual/predicted
    reduction with predicted = 0.5 * delta^T (lam*delta + b); on accept
    lam *= max(1/3, 1-(2 rho-1)^3), ni = 2; on reject lam *= ni, ni *= 2.

Same BAProblem/BAResult interface as solvers/ba.py, so callers can pick the
dense-exact or the scalable path by problem size.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.se3 import exp_se3, compose, orthonormalize
from .linalg3 import inv3
from .reproj import residuals, jacobians, huber_weight, CHI2_MONO
from .ba import BAProblem, BAResult, _robust_chi2


def _blocks(prob: BAProblem, R, t, pts, lam):
    """Per-iteration normal-equation blocks, observation-indexed.

    Returns (Hcc_d (K,6,6) damped, bc (K,6), U (P,3,3) = (Hll+lam)^-1,
    bp (P,3), Y (O,6,3) per-observation coupling Jc^T w Jp)."""
    K = prob.kf_R.shape[0]
    P = prob.points.shape[0]
    Rk = R[prob.obs_kf]
    tk = t[prob.obs_kf]
    xw = pts[prob.obs_pt]
    e, _ = residuals(Rk, tk, xw, prob.obs_uv, prob.K4)
    Jc, Jp, _ = jacobians(Rk, tk, xw, prob.K4)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_w
    w = prob.obs_w * huber_weight(chi2) * prob.obs_valid
    w_c = jnp.where(prob.kf_fixed[prob.obs_kf], 0.0, 1.0)
    Jc = Jc * w_c[:, None, None]

    Jc_w = Jc * w[:, None, None]
    Jp_w = Jp * w[:, None, None]
    Hcc = jnp.zeros((K, 6, 6), Jc.dtype).at[prob.obs_kf].add(
        jnp.einsum("oij,oik->ojk", Jc_w, Jc))
    bc = jnp.zeros((K, 6), Jc.dtype).at[prob.obs_kf].add(
        jnp.einsum("oij,oi->oj", Jc_w, e))
    Hll = jnp.zeros((P, 3, 3), Jp.dtype).at[prob.obs_pt].add(
        jnp.einsum("oij,oik->ojk", Jp_w, Jp))
    bp = jnp.zeros((P, 3), Jp.dtype).at[prob.obs_pt].add(
        jnp.einsum("oij,oi->oj", Jp_w, e))
    Y = jnp.einsum("oij,oik->ojk", Jc_w, Jp)  # (O, 6, 3)

    eye3 = jnp.eye(3, dtype=Hll.dtype)
    eye6 = jnp.eye(6, dtype=Hcc.dtype)
    U = inv3(Hll + lam * eye3[None])
    Hcc_d = Hcc + lam * eye6[None]
    return Hcc_d, bc, U, bp, Y


def _schur_matvec(prob: BAProblem, Hcc_d, U, Y, x):
    """S x = (Hcc + lam) x - A U A^T x, never materializing A (P,K,6,3)."""
    K = Hcc_d.shape[0]
    P = U.shape[0]
    g = jnp.einsum("oij,oi->oj", Y, x[prob.obs_kf])          # (O, 3)
    g = g * prob.obs_valid[:, None]
    v = jnp.zeros((P, 3), g.dtype).at[prob.obs_pt].add(g)
    u = jnp.einsum("pij,pj->pi", U, v)
    h = jnp.einsum("oij,oj->oi", Y, u[prob.obs_pt])          # (O, 6)
    h = h * prob.obs_valid[:, None]
    w = jnp.zeros((K, 6), h.dtype).at[prob.obs_kf].add(h)
    Sx = jnp.einsum("kij,kj->ki", Hcc_d, x) - w
    # fixed cameras: identity rows => their delta stays 0
    Sx = jnp.where(prob.kf_fixed[:, None], x, Sx)
    return Sx


def _pcg(matvec, Minv, b, iters: int):
    """Block-Jacobi preconditioned CG on the (K, 6) camera system."""

    def apply_M(r):
        return jnp.einsum("kij,kj->ki", Minv, r)

    x0 = jnp.zeros_like(b)
    r0 = b  # b - S*0
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(_, state):
        x, r, p, rz = state
        Sp = matvec(p)
        pSp = jnp.sum(p * Sp)
        alpha = rz / jnp.where(jnp.abs(pSp) < 1e-30, 1e-30, pSp)
        x = x + alpha * p
        r = r - alpha * Sp
        z = apply_M(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return x


def _solve_delta_pcg(prob: BAProblem, R, t, pts, lam, cg_iters: int):
    """One damped implicit-Schur solve. Returns (delta_c, delta_p, bc)."""
    K = prob.kf_R.shape[0]
    P = prob.points.shape[0]
    Hcc_d, bc, U, bp, Y = _blocks(prob, R, t, pts, lam)

    # rhs_c = bc - A U bp (observation-indexed)
    ubp = jnp.einsum("pij,pj->pi", U, bp)
    h = jnp.einsum("oij,oj->oi", Y, ubp[prob.obs_pt]) * prob.obs_valid[:, None]
    rhs = bc - jnp.zeros((K, 6), bc.dtype).at[prob.obs_kf].add(h)
    rhs = jnp.where(prob.kf_fixed[:, None], 0.0, rhs)

    eye6 = jnp.eye(6, dtype=Hcc_d.dtype)
    Minv = jnp.linalg.inv(Hcc_d + 1e-8 * eye6[None])
    Minv = jnp.where(prob.kf_fixed[:, None, None], eye6[None], Minv)

    matvec = functools.partial(_schur_matvec, prob, Hcc_d, U, Y)
    delta_c = _pcg(matvec, Minv, -rhs, cg_iters)
    delta_c = jnp.where(prob.kf_fixed[:, None], 0.0, delta_c)

    # back-substitution: delta_p = U (-bp - A^T delta_c)
    g = jnp.einsum("oij,oi->oj", Y, delta_c[prob.obs_kf]) * prob.obs_valid[:, None]
    At_dc = jnp.zeros((P, 3), g.dtype).at[prob.obs_pt].add(g)
    delta_p = jnp.einsum("pij,pj->pi", U, -bp - At_dc)
    delta_p = jnp.where(prob.point_valid[:, None], delta_p, 0.0)
    return delta_c, delta_p, bc, bp


@functools.partial(jax.jit, static_argnames=("iterations", "cg_iters"))
def bundle_adjust_large(prob: BAProblem, iterations: int = 20,
                        cg_iters: int = 64, lam0: float = -1.0) -> BAResult:
    """LM bundle adjustment at map capacity (implicit Schur + PCG).

    lam0 < 0 -> g2o's tau * max(diag) initialization
    (optimization_algorithm_levenberg.cpp:47, tau = 1e-5)."""
    Hcc0, _, _, _, _ = _blocks(prob, prob.kf_R, prob.kf_t, prob.points, 0.0)
    max_diag = jnp.max(jnp.abs(jnp.diagonal(Hcc0, axis1=-2, axis2=-1)))
    lam_init = jnp.where(lam0 < 0, 1e-5 * max_diag, lam0)

    chi0 = _robust_chi2(prob, prob.kf_R, prob.kf_t, prob.points)

    def body(_, state):
        R, t, pts, lam, ni, chi = state
        dc, dp, bc, bp = _solve_delta_pcg(prob, R, t, pts, lam, cg_iters)
        dR, dt = exp_se3(dc)
        R_new, t_new = compose(dR, dt, R, t)
        R_new = orthonormalize(R_new)  # keep f32 products on SO(3)
        pts_new = pts + dp
        chi_new = _robust_chi2(prob, R_new, t_new, pts_new)
        # gain ratio rho = (chi - chi_new) / predicted reduction, predicted
        # = 0.5 delta^T (lam delta - grad). (g2o's scale = delta.(lam delta
        # + b), levenberg.cpp:118, with g2o's b the NEGATIVE gradient; our
        # bc/bp are the positive gradient J^T W e.)
        pred = 0.5 * (jnp.sum(dc * (lam * dc - bc)) +
                      jnp.sum(dp * (lam * dp - bp)))
        rho = (chi - chi_new) / jnp.where(jnp.abs(pred) < 1e-30, 1e-30, pred)
        accept = (rho > 0) & (chi_new < chi) & jnp.isfinite(chi_new)
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        pts = jnp.where(accept, pts_new, pts)
        chi = jnp.where(accept, chi_new, chi)
        factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept, lam * factor, lam * ni)
        lam = jnp.clip(lam, 1e-12, 1e12)
        ni = jnp.where(accept, 2.0, ni * 2.0)
        return R, t, pts, lam, ni, chi

    R, t, pts, _, _, chi = jax.lax.fori_loop(
        0, iterations, body,
        (prob.kf_R, prob.kf_t, prob.points, lam_init, jnp.float32(2.0), chi0),
    )

    e, pcam = residuals(R[prob.obs_kf], t[prob.obs_kf], pts[prob.obs_pt],
                        prob.obs_uv, prob.K4)
    c = jnp.sum(e * e, axis=-1) * prob.obs_w
    outlier = prob.obs_valid & ((c > CHI2_MONO) | (pcam[..., 2] <= 0))
    return BAResult(kf_R=R, kf_t=t, points=pts, chi2=chi, obs_outlier=outlier)
