"""Tests: Horn Sim3 RANSAC, Sim3 optimization, essential graph, PnP."""
import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from orbslam_jpminipc_tpu.geometry import se3, sim3, camera
from orbslam_jpminipc_tpu.solvers import sim3solver, sim3_opt, essential_graph, pnp

K4 = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)


def make_sim3_pair(rng, n=100, s_true=1.3, outliers=15):
    """Matched 3D points in two camera frames related by a Sim3."""
    p2 = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
        axis=1,
    ).astype(np.float32)
    R = Rotation.from_rotvec([0.1, -0.3, 0.05]).as_matrix().astype(np.float32)
    t = np.array([0.4, -0.2, 0.6], np.float32)
    p1 = s_true * p2 @ R.T + t
    p1 += rng.normal(0, 0.005, p1.shape).astype(np.float32)
    p1[:outliers] = rng.uniform(-3, 3, (outliers, 3)).astype(np.float32) + [0, 0, 5]
    uv1 = np.asarray(camera.project(jnp.array(p1), K4))
    uv2 = np.asarray(camera.project(jnp.array(p2), K4))
    return p1, p2, uv1, uv2, s_true, R, t


class TestSim3Solver:
    def test_recovers_transform(self, rng):
        p1, p2, uv1, uv2, s_t, R_t, t_t = make_sim3_pair(rng)
        n = len(p1)
        res = jax.jit(
            sim3solver.solve_sim3,
            static_argnames=("n_hyp", "min_inliers", "fix_scale"),
        )(
            jax.random.key(0),
            jnp.array(p1), jnp.array(p2), jnp.array(uv1), jnp.array(uv2),
            jnp.ones(n, bool), K4,
            jnp.full(n, 9.21), jnp.full(n, 9.21),
        )
        assert bool(res.success)
        assert abs(float(res.s12) - s_t) < 0.02
        R_err = np.degrees(np.linalg.norm(np.asarray(se3.log_so3(jnp.array(R_t) @ res.R12.T))))
        assert R_err < 1.0, R_err
        assert np.linalg.norm(np.asarray(res.t12) - t_t) < 0.1
        assert int(res.n_inliers) > 70
        # outliers excluded
        assert np.asarray(res.inliers)[:15].mean() < 0.2

    def test_horn_exact_noise_free(self, rng):
        p2 = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        R = Rotation.from_rotvec([0.3, 0.1, -0.2]).as_matrix().astype(np.float32)
        p1 = 2.0 * p2 @ R.T + np.array([1, 2, 3], np.float32)
        s, R_e, t_e = jax.jit(sim3solver.horn_sim3, static_argnames="fix_scale")(
            jnp.array(p1)[None], jnp.array(p2)[None]
        )
        assert abs(float(s[0]) - 2.0) < 1e-3
        np.testing.assert_allclose(np.asarray(R_e[0]), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_e[0]), [1, 2, 3], atol=1e-3)


class TestSim3Opt:
    def test_refines_perturbed_sim3(self, rng):
        p1, p2, uv1, uv2, s_t, R_t, t_t = make_sim3_pair(rng, outliers=0)
        n = len(p1)
        # perturb the true Sim3
        xi = np.concatenate([rng.normal(0, 0.02, 6), [0.03]]).astype(np.float32)
        s0, R0, t0 = sim3.retract(jnp.float32(s_t), jnp.array(R_t), jnp.array(t_t), jnp.array(xi))
        res = sim3_opt.optimize_sim3(
            s0, R0, t0,
            jnp.array(p1), jnp.array(p2), jnp.array(uv1), jnp.array(uv2),
            jnp.ones(n, jnp.float32), jnp.ones(n, jnp.float32),
            jnp.ones(n, bool), K4,
        )
        assert abs(float(res.s12) - s_t) < 0.01
        R_err = np.degrees(np.linalg.norm(np.asarray(se3.log_so3(jnp.array(R_t) @ res.R12.T))))
        assert R_err < 0.3, R_err
        assert int(res.n_inliers) > 90


class TestEssentialGraph:
    def test_closes_synthetic_loop(self, rng):
        """Chain of keyframes with drift; a loop edge to the start should
        distribute the correction (the SLAM analogue of the reference's
        CorrectLoop + OptimizeEssentialGraph)."""
        K = 12
        # ground truth: poses on a circle (world->cam identity rotations for
        # simplicity, translations along x)
        t_true = np.stack([np.linspace(0, 11, K), np.zeros(K), np.zeros(K)], 1).astype(np.float32)
        R_true = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        s_true = np.ones(K, np.float32)
        # drifted estimates: accumulating error
        t_est = t_true.copy()
        drift = np.cumsum(rng.normal(0, 0.05, (K, 3)).astype(np.float32), axis=0)
        t_est += drift
        t_est[0] = t_true[0]

        e_i, e_j, e_s, e_R, e_t = [], [], [], [], []
        # odometry edges from TRUE relative poses (Sji = Sjw * Swi)
        def add_edge(i, j):
            Sjw = (jnp.float32(1.0), jnp.array(R_true[j]), jnp.array(t_true[j]))
            Siw_inv = sim3.inverse(jnp.float32(1.0), jnp.array(R_true[i]), jnp.array(t_true[i]))
            s, R, t = sim3.compose(*Sjw, *Siw_inv)
            e_i.append(i); e_j.append(j)
            e_s.append(float(s)); e_R.append(np.asarray(R)); e_t.append(np.asarray(t))

        for i in range(K - 1):
            add_edge(i, i + 1)
        add_edge(0, K - 1)  # loop edge

        E = len(e_i)
        prob = essential_graph.EssentialGraphProblem(
            s=jnp.array(s_true),
            R=jnp.array(t_est * 0 + R_true) if False else jnp.array(R_true),
            t=jnp.array(t_est),
            fixed=jnp.array([True] + [False] * (K - 1)),
            e_i=jnp.array(e_i, jnp.int32),
            e_j=jnp.array(e_j, jnp.int32),
            e_s=jnp.array(e_s, jnp.float32),
            e_R=jnp.array(np.stack(e_R)),
            e_t=jnp.array(np.stack(e_t), jnp.float32),
            e_valid=jnp.ones(E, bool),
        )
        res = essential_graph.optimize_essential_graph(prob, iterations=20)
        t_err = np.linalg.norm(np.asarray(res.t) - t_true, axis=1)
        drift_err = np.linalg.norm(t_est - t_true, axis=1)
        assert t_err.max() < 0.01, (t_err.max(), drift_err.max())
        assert np.abs(np.asarray(res.s) - 1).max() < 0.01


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        n = 100
        xw = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3, 8, n)],
            axis=1,
        ).astype(np.float32)
        R_t = Rotation.from_rotvec([0.1, -0.2, 0.05]).as_matrix().astype(np.float32)
        t_t = np.array([0.3, -0.1, 0.5], np.float32)
        uv = np.array(camera.project(se3.transform(jnp.array(R_t), jnp.array(t_t), jnp.array(xw)), K4))
        uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
        uv[:20] = rng.uniform(0, 640, (20, 2)).astype(np.float32)  # 20% outliers
        res = jax.jit(
            pnp.solve_pnp, static_argnames=("n_hyp", "min_inliers", "min_set")
        )(
            jax.random.key(0), jnp.array(xw), jnp.array(uv),
            jnp.ones(n, bool), K4, jnp.full(n, 5.991, jnp.float32),
        )
        assert bool(res.success)
        R_err = np.degrees(np.linalg.norm(np.asarray(se3.log_so3(jnp.array(R_t) @ res.R.T))))
        assert R_err < 1.0, R_err
        assert np.linalg.norm(np.asarray(res.t) - t_t) < 0.1
        assert int(res.n_inliers) > 80 - 20

    def test_insufficient_points_fails(self, rng):
        n = 16
        xw = rng.uniform(-1, 1, (n, 3)).astype(np.float32) + [0, 0, 5]
        uv = rng.uniform(0, 640, (n, 2)).astype(np.float32)  # garbage
        res = jax.jit(
            pnp.solve_pnp, static_argnames=("n_hyp", "min_inliers", "min_set")
        )(
            jax.random.key(1), jnp.array(xw), jnp.array(uv),
            jnp.ones(n, bool), K4, jnp.full(n, 5.991, jnp.float32),
        )
        assert not bool(res.success)


class TestEPnP:
    def test_epnp_matches_cv2_oracle(self, rng):
        """epnp_pose vs cv2.solvePnP(SOLVEPNP_EPNP) on clean
        correspondences — same algorithm, same answer (to the GN noise
        floor)."""
        import cv2
        from orbslam_jpminipc_tpu.solvers.epnp import epnp_pose
        import jax.numpy as jnp

        K4 = np.array([500.0, 500.0, 320.0, 240.0], np.float32)
        Kcv = np.array([[500, 0, 320], [0, 500, 240], [0, 0, 1]], np.float64)
        for trial in range(5):
            n = 12
            xw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                           rng.uniform(-1, 1, n)], 1).astype(np.float32)
            rvec = rng.normal(0, 0.4, 3)
            R_true, _ = cv2.Rodrigues(rvec)
            t_true = np.array([0.2, -0.1, 4.0]) + rng.normal(0, 0.2, 3)
            xc = xw @ R_true.T + t_true
            uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                           500 * xc[:, 1] / xc[:, 2] + 240], 1).astype(np.float32)

            R, t, ok = epnp_pose(jnp.asarray(xw)[None], jnp.asarray(uv)[None],
                                 jnp.ones((1, n), jnp.float32), jnp.asarray(K4))
            assert bool(ok[0]), trial
            R, t = np.asarray(R[0]), np.asarray(t[0])
            _, rvec_cv, tvec_cv = cv2.solvePnP(
                xw.astype(np.float64), uv.astype(np.float64), Kcv, None,
                flags=cv2.SOLVEPNP_EPNP)
            R_cv, _ = cv2.Rodrigues(rvec_cv)
            np.testing.assert_allclose(R, R_true, atol=5e-3)
            np.testing.assert_allclose(t, t_true, atol=2e-2)
            np.testing.assert_allclose(R, R_cv, atol=1e-2)

    def test_epnp_ransac_degenerate_near_planar(self, rng):
        """VERDICT r03 #7 stress: near-planar scene + 40% outliers — the
        regime where DLT minimal sets lose conditioning but EPnP's control-
        point parameterization holds."""
        import jax
        import jax.numpy as jnp
        import cv2

        K4 = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)
        n = 80
        xw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       rng.normal(0, 0.02, n)], 1).astype(np.float32)  # near-planar
        rvec = rng.normal(0, 0.3, 3)
        R_true, _ = cv2.Rodrigues(rvec)
        t_true = np.array([0.1, 0.0, 4.0], np.float64)
        xc = xw @ R_true.T + t_true
        uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                       500 * xc[:, 1] / xc[:, 2] + 240], 1).astype(np.float32)
        uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)
        n_out = int(0.4 * n)
        out_idx = rng.choice(n, n_out, replace=False)
        uv[out_idx] = rng.uniform(0, 640, (n_out, 2)).astype(np.float32)

        res = pnp.solve_pnp(
            jax.random.key(0), jnp.asarray(xw), jnp.asarray(uv),
            jnp.ones(n, bool), K4, jnp.full((n,), 5.991 * 4.0, jnp.float32),
        )
        assert bool(res.success)
        assert int(res.n_inliers) >= 0.8 * (n - n_out), int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.t), t_true, atol=0.05)

    def test_epnp_exactly_planar(self, rng):
        """ADVICE r04: EXACTLY coplanar world points (a wall — the common
        relocalization case). The PCA control points collapse (third
        eigenvalue 0), the barycentric 4x4 goes singular, and a plain
        inverse NaNs every hypothesis; the reference's CV_SVD pseudo-
        inverse (PnPsolver.cc:383-406) degrades gracefully — ours must
        too."""
        import jax
        import jax.numpy as jnp
        import cv2

        K4 = jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32)
        n = 60
        xw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                       np.zeros(n)], 1).astype(np.float32)  # z = 0 exactly
        rvec = rng.normal(0, 0.25, 3)
        R_true, _ = cv2.Rodrigues(rvec)
        t_true = np.array([0.05, -0.1, 4.0], np.float64)
        xc = xw @ R_true.T + t_true
        uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                       500 * xc[:, 1] / xc[:, 2] + 240], 1).astype(np.float32)
        uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)

        res = pnp.solve_pnp(
            jax.random.key(1), jnp.asarray(xw), jnp.asarray(uv),
            jnp.ones(n, bool), K4, jnp.full((n,), 5.991 * 4.0, jnp.float32),
        )
        assert bool(res.success), "planar scene must not kill every hypothesis"
        assert int(res.n_inliers) >= 0.8 * n, int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.R), R_true, atol=3e-2)
        np.testing.assert_allclose(np.asarray(res.t), t_true, atol=0.08)
