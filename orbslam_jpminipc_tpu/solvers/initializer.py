"""Two-view map initialization: batched H/F RANSAC + reconstruction.

Replaces src/Initializer.cc (929 LoC). The reference races two threads, one
computing 200 homography hypotheses and one computing 200 fundamental
hypotheses, each a sequential loop of 8-point DLT + SVD (Initializer.cc:
102-107, 224-301). Here BOTH models' 200 hypotheses are computed in one
batched program: minimal-set sampling via per-hypothesis top-k of random
scores, DLT via batched 9x9 eigendecomposition, chi^2 symmetric-transfer
scoring against all matches at once (CheckHomography :303-386,
CheckFundamental :388-466), model selection RH = SH/(SH+SF) > 0.40 (:109-116),
then reconstruction: E decomposition with 4-way cheirality disambiguation
(ReconstructF :468-567, DecomposeE :907-927, CheckRT :796-905) or the
Faugeras 8-hypothesis homography decomposition (ReconstructH :570-730).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam
from ..geometry import triangulate as tri


class InitResult(NamedTuple):
    success: jax.Array     # () bool
    used_h: jax.Array      # () bool — which model was selected
    R: jax.Array           # (3, 3) world(frame1)->frame2
    t: jax.Array           # (3,) unit-norm translation
    points: jax.Array      # (N, 3) triangulated points in frame-1 coords
    good: jax.Array        # (N,) bool — triangulated & all gates passed
    n_good: jax.Array      # () int32


# ---------------------------------------------------------------------------
# Normalization (Initializer.cc:747-793): zero-mean, unit mean-abs-dev.
# ---------------------------------------------------------------------------

def _normalize(uv: jax.Array, mask: jax.Array):
    w = mask.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(uv - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    uvn = (uv - mean) * s
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        uv.dtype,
    )
    return uvn, T


def _sample_minimal_sets(key, mask, n_hyp: int, k: int = 8):
    """(n_hyp, k) distinct indices drawn uniformly from valid matches."""
    n = mask.shape[0]
    scores = jax.random.uniform(key, (n_hyp, n))
    scores = jnp.where(mask[None, :], scores, -1.0)
    _, idx = jax.lax.top_k(scores, k)
    return idx


# ---------------------------------------------------------------------------
# DLT model fits (batched over hypotheses)
# ---------------------------------------------------------------------------

def _fit_h(p1, p2):
    """Homography from >=4 pairs: rows of the 2k x 9 DLT system; solution =
    smallest eigenvector of A^T A (ComputeH21, Initializer.cc:224-264)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    return h.reshape(*h.shape[:-1], 3, 3)


def _fit_f(p1, p2):
    """Fundamental from >=8 pairs + rank-2 projection (ComputeF21,
    Initializer.cc:266-301)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0].reshape(*x1.shape[:-1], 3, 3)
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[..., 2].set(0.0)
    return u @ (s[..., :, None] * vt)


# ---------------------------------------------------------------------------
# chi^2 scoring over all matches (CheckHomography / CheckFundamental)
# ---------------------------------------------------------------------------

_CHI2_H = 5.991
_CHI2_F = 3.841
_TH_SCORE = 5.991


def _score_h(H, Hinv, uv1, uv2, mask, inv_sigma2):
    def transfer(M, src):
        x = jnp.concatenate([src, jnp.ones_like(src[..., :1])], axis=-1)
        y = jnp.einsum("...ij,...nj->...ni", M, x)
        return y[..., :2] / jnp.maximum(jnp.abs(y[..., 2:]), 1e-12) * jnp.sign(y[..., 2:])

    e12 = jnp.sum((transfer(H, uv1) - uv2) ** 2, axis=-1) * inv_sigma2
    e21 = jnp.sum((transfer(Hinv, uv2) - uv1) ** 2, axis=-1) * inv_sigma2
    in12 = e12 < _CHI2_H
    in21 = e21 < _CHI2_H
    score = jnp.sum(
        jnp.where(mask & in12, _TH_SCORE - e12, 0.0)
        + jnp.where(mask & in21, _TH_SCORE - e21, 0.0),
        axis=-1,
    )
    return score, mask & in12 & in21


def _score_f(F, uv1, uv2, mask, inv_sigma2):
    x1 = jnp.concatenate([uv1, jnp.ones_like(uv1[..., :1])], axis=-1)
    x2 = jnp.concatenate([uv2, jnp.ones_like(uv2[..., :1])], axis=-1)
    l2 = jnp.einsum("...ij,...nj->...ni", F, x1)  # line in image 2
    l1 = jnp.einsum("...ji,...nj->...ni", F, x2)  # line in image 1
    d2 = jnp.sum(l2 * x2, axis=-1) ** 2 / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = jnp.sum(l1 * x1, axis=-1) ** 2 / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    e1 = d1 * inv_sigma2
    e2 = d2 * inv_sigma2
    in1 = e1 < _CHI2_F
    in2 = e2 < _CHI2_F
    score = jnp.sum(
        jnp.where(mask & in1, _TH_SCORE - e1, 0.0)
        + jnp.where(mask & in2, _TH_SCORE - e2, 0.0),
        axis=-1,
    )
    return score, mask & in1 & in2


# ---------------------------------------------------------------------------
# CheckRT: triangulate all matches under (R, t), count the good ones
# ---------------------------------------------------------------------------

def _check_rt(R, t, uv1, uv2, mask, K4, th2):
    """Initializer.cc:796-905. Returns (n_good, parallax_deg, points, good)."""
    eye = jnp.eye(3, dtype=R.dtype)
    zero = jnp.zeros((3,), R.dtype)
    P1 = tri.projection_matrix(eye, zero, K4)
    P2 = tri.projection_matrix(R, t, K4)
    xw, ok = tri.triangulate_dlt(uv1, uv2, P1, P2)
    O1 = zero
    O2 = -R.T @ t
    cosp = tri.parallax_cos(xw, O1, O2)
    z1 = xw[..., 2]
    xc2 = jnp.einsum("ij,nj->ni", R, xw) + t
    z2 = xc2[..., 2]
    e1, _ = tri.reprojection_error2(xw, uv1, eye, zero, K4)
    e2, _ = tri.reprojection_error2(xw, uv2, R, t, K4)
    # depth gates apply where parallax is sufficient (cos < 0.99998)
    enough_par = cosp < 0.99998
    good = (
        mask & ok & enough_par
        & (z1 > 0) & (z2 > 0)
        & (e1 < th2) & (e2 < th2)
        & jnp.all(jnp.isfinite(xw), axis=-1)
    )
    n_good = jnp.sum(good)
    # parallax statistic: the 50th-smallest angle among good (or the max)
    deg = jnp.degrees(jnp.arccos(jnp.clip(cosp, -1.0, 1.0)))
    deg_sorted = jnp.sort(jnp.where(good, deg, jnp.inf))
    k = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    par = jnp.where(n_good > 0, deg_sorted[k], 0.0)
    return n_good, par, xw, good


def _decompose_e(E):
    """4 candidate (R, t) from an essential matrix (DecomposeE :907-927)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    return (R1, R2), t


def _reconstruct_f(F, uv1, uv2, inliers, K4, sigma2, min_parallax, min_triangulated):
    K = jnp.array(
        [[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1]], F.dtype
    )
    E = K.T @ F @ K
    (R1, R2), t = _decompose_e(E)
    th2 = 4.0 * sigma2
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    results = [_check_rt(R, tt, uv1, uv2, inliers, K4, th2) for R, tt in cands]
    n = jnp.stack([r[0] for r in results])
    par = jnp.stack([r[1] for r in results])
    pts = jnp.stack([r[2] for r in results])
    good = jnp.stack([r[3] for r in results])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    n_max = jnp.max(n)
    n_inliers = jnp.sum(inliers)
    min_good = jnp.maximum(
        jnp.int32(0.9 * n_inliers), jnp.int32(min_triangulated)
    )
    n_similar = jnp.sum(n > 0.7 * n_max)
    best = jnp.argmax(n)
    ok = (
        (n_max >= min_good)
        & (n_similar == 1)
        & (par[best] > min_parallax)
    )
    return ok, Rs[best], ts[best], pts[best], good[best], n[best]


def _reconstruct_h(H, uv1, uv2, inliers, K4, sigma2, min_parallax, min_triangulated):
    """Faugeras SVD-based decomposition (ReconstructH :570-730): 8 motion
    hypotheses from H = K A K^-1, disambiguated by CheckRT."""
    K = jnp.array(
        [[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1]], H.dtype
    )
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0, None))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' > 0
    aux_stheta = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0, None)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sthetas = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_stheta

    # case d' < 0
    aux_sphi = jnp.sqrt(
        jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0, None)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cphi = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sphis = jnp.array([1.0, -1.0, -1.0, 1.0]) * aux_sphi

    cands_R, cands_t = [], []
    for i in range(4):
        Rp = jnp.array(
            [[ctheta, 0.0, -sthetas[i]], [0.0, 1.0, 0.0], [sthetas[i], 0.0, ctheta]]
        )
        tp = (d1 - d3) * jnp.array([x1s[i], 0.0, -x3s[i]])
        R = s * U @ Rp @ Vt
        t = U @ tp
        cands_R.append(R)
        cands_t.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    for i in range(4):
        Rp = jnp.array(
            [[cphi, 0.0, sphis[i]], [0.0, -1.0, 0.0], [sphis[i], 0.0, -cphi]]
        )
        tp = (d1 + d3) * jnp.array([x1s[i], 0.0, x3s[i]])
        R = s * U @ Rp @ Vt
        t = U @ tp
        cands_R.append(R)
        cands_t.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))

    th2 = 4.0 * sigma2
    results = [
        _check_rt(R, t, uv1, uv2, inliers, K4, th2)
        for R, t in zip(cands_R, cands_t)
    ]
    n = jnp.stack([r[0] for r in results])
    par = jnp.stack([r[1] for r in results])
    pts = jnp.stack([r[2] for r in results])
    good = jnp.stack([r[3] for r in results])
    Rs = jnp.stack(cands_R)
    ts = jnp.stack(cands_t)
    best = jnp.argmax(n)
    n_max = jnp.max(n)
    second = jnp.sort(n)[-2]
    n_inliers = jnp.sum(inliers)
    # reference gates (Initializer.cc:712-729): clear winner (1.75x), enough
    # parallax, >= 90% of inliers triangulated and >= minTriangulated.
    ok = (
        (second < 0.75 * n_max)
        & (par[best] >= min_parallax)
        & (n_max > min_triangulated)
        & (n_max > 0.9 * n_inliers)
    )
    return ok, Rs[best], ts[best], pts[best], good[best], n[best]


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def initialize(
    key: jax.Array,
    uv1: jax.Array,     # (N, 2) undistorted matched keypoints, frame 1
    uv2: jax.Array,     # (N, 2) matched keypoints, frame 2 (aligned with uv1)
    mask: jax.Array,    # (N,) bool — valid match slots
    K4: jax.Array,
    sigma: float = 1.0,
    n_hyp: int = 200,
    min_parallax: float = 1.0,
    min_triangulated: int = 50,
) -> InitResult:
    """Initializer::Initialize (src/Initializer.cc:44-222), fully batched."""
    inv_sigma2 = 1.0 / (sigma * sigma)
    sigma2 = sigma * sigma

    k1, k2 = jax.random.split(key)
    sets = _sample_minimal_sets(k1, mask, n_hyp)  # (n_hyp, 8)

    uv1n, T1 = _normalize(uv1, mask)
    uv2n, T2 = _normalize(uv2, mask)
    p1 = uv1n[sets]  # (n_hyp, 8, 2)
    p2 = uv2n[sets]

    # Homography hypotheses
    Hn = _fit_h(p1, p2)
    T2inv = jnp.linalg.inv(T2)
    H = T2inv @ Hn @ T1  # un-normalized
    Hinv = jnp.linalg.inv(H)
    h_scores, h_in = _score_h(H, Hinv, uv1[None], uv2[None], mask[None], inv_sigma2)
    bh = jnp.argmax(h_scores)
    SH = h_scores[bh]
    H_best = H[bh]
    h_inliers = h_in[bh]

    # Fundamental hypotheses
    Fn = _fit_f(p1, p2)
    F = T2.T @ Fn @ T1
    f_scores, f_in = _score_f(F, uv1[None], uv2[None], mask[None], inv_sigma2)
    bf = jnp.argmax(f_scores)
    SF = f_scores[bf]
    F_best = F[bf]
    f_inliers = f_in[bf]

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40

    ok_h, Rh, th, pts_h, good_h, n_h = _reconstruct_h(
        H_best, uv1, uv2, h_inliers, K4, sigma2, min_parallax, min_triangulated
    )
    ok_f, Rf, tf, pts_f, good_f, n_f = _reconstruct_f(
        F_best, uv1, uv2, f_inliers, K4, sigma2, 1.0, min_triangulated
    )

    pick = lambda a, b: jnp.where(use_h, a, b)
    return InitResult(
        success=jnp.where(use_h, ok_h, ok_f),
        used_h=use_h,
        R=pick(Rh, Rf),
        t=pick(th, tf),
        points=pick(pts_h, pts_f),
        good=pick(good_h, good_f),
        n_good=pick(n_h, n_f),
    )
