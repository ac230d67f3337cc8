"""Loop closing: detection, Sim3 computation, and loop correction.

Replaces src/LoopClosing.cc (622 LoC): DetectLoop (:115-242 — min-score
gate, database query, >=3-consecutive consistent-group temporal filter),
ComputeSim3 (:244-414 — per-candidate matching, Sim3 RANSAC, guided
search, Sim3 refinement, >=20 inliers then >=40 total matches), and
CorrectLoop (:416-574 — propagate the corrected Sim3 to the covisible
group, re-map their points, fuse duplicates, build loop connections,
force relocalization-grade consistency via the essential graph).

The reference's stop-the-mapper handshake (RequestStop :420-427)
disappears: stages run deterministically in sequence.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..geometry import sim3 as s3
from ..map.map_state import MapState
from ..map.keyframe_db import KeyFrameDatabase
from ..ops import matching
from ..solvers import sim3solver, sim3_opt, essential_graph
from ..frontend.frame import predict_scale_level

_mutual = jax.jit(matching.mutual_match, static_argnames=("max_dist", "check_rotation"))
_search_proj = jax.jit(
    matching.search_by_projection, static_argnames=("max_dist", "level_window")
)
_solve_sim3 = jax.jit(
    sim3solver.solve_sim3, static_argnames=("n_hyp", "min_inliers", "fix_scale")
)


class LoopCloser:
    def __init__(self, cfg: SlamConfig, state: MapState, kfdb: KeyFrameDatabase):
        self.cfg = cfg
        self.map = state
        self.kfdb = kfdb
        # ConsistentGroup bookkeeping (LoopClosing.h:47, .cc:165-224)
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf_id = -(10 ** 9)
        self.covisibility_consistency_th = 3
        self.rng_key = jax.random.key(cfg.seed + 1)
        self.on_loop_closed = None  # fn(kf) hook

    def _next_key(self):
        self.rng_key, sub = jax.random.split(self.rng_key)
        return sub

    # ------------------------------------------------------------------

    def process(self, kf: int) -> bool:
        cands = self.detect_loop(kf)
        if not cands:
            return False
        ok, loop_kf, s_cl, R_cl, t_cl, loop_points = self.compute_sim3(kf, cands)
        if not ok:
            return False
        self.correct_loop(kf, loop_kf, s_cl, R_cl, t_cl, loop_points)
        if self.on_loop_closed is not None:
            self.on_loop_closed(kf)
        return True

    # ------------------------------------------------------------------
    # DetectLoop (:115-242)
    # ------------------------------------------------------------------

    def detect_loop(self, kf: int) -> list[int]:
        st = self.map
        # don't search right after the last loop (:123-128: 10 KFs)
        if st.next_kf_id < self.last_loop_kf_id + 10:
            return []
        covis = st.covisibility()
        self.kfdb.set_covisibility(covis)
        qbow = self.kfdb.bow[kf]
        candidates = self.kfdb.detect_loop_candidates(kf, qbow, covis[kf])
        if not candidates:
            self.consistent_groups = []
            return []

        # temporal consistency (:165-224): a candidate group must share
        # members with a group seen in N consecutive keyframes
        covis_th = 15
        enough = []
        current_groups: list[tuple[set, int]] = []
        for c in candidates:
            group = {c} | {
                int(k) for k in np.nonzero(covis[c] >= covis_th)[0] if st.kf_valid[k]
            }
            best_consistency = 0
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    best_consistency = max(best_consistency, count + 1)
            current_groups.append((group, best_consistency))
            if best_consistency >= self.covisibility_consistency_th:
                enough.append(c)
        self.consistent_groups = current_groups
        return enough

    # ------------------------------------------------------------------
    # ComputeSim3 (:244-414)
    # ------------------------------------------------------------------

    def compute_sim3(self, kf: int, candidates: list[int]):
        st, cfg = self.map, self.cfg
        for cand in candidates:
            m = _mutual(
                jnp.array(st.kf_desc[kf]), jnp.array(st.kf_angle[kf]),
                jnp.array(st.kf_feat_valid[kf] & (st.kf_point[kf] >= 0)),
                jnp.array(st.kf_desc[cand]), jnp.array(st.kf_angle[cand]),
                jnp.array(st.kf_feat_valid[cand] & (st.kf_point[cand] >= 0)),
                max_dist=50, nn_ratio=0.75, check_rotation=True,
            )
            mask = np.asarray(m.mask)
            if mask.sum() < 20:
                continue
            idx = np.asarray(m.idx)
            p_c = st.kf_point[kf]
            p_l = st.kf_point[cand][idx]
            pair_ok = mask & (p_c >= 0) & (p_l >= 0)
            pair_ok &= st.mp_valid[np.clip(p_c, 0, st.max_mp - 1)]
            pair_ok &= st.mp_valid[np.clip(p_l, 0, st.max_mp - 1)]
            if pair_ok.sum() < 20:
                continue
            # camera-frame coordinates (Sim3Solver.cc:94-98)
            x_c = st.mp_xyz[np.clip(p_c, 0, st.max_mp - 1)] @ st.kf_R[kf].T + st.kf_t[kf]
            x_l = st.mp_xyz[np.clip(p_l, 0, st.max_mp - 1)] @ st.kf_R[cand].T + st.kf_t[cand]
            lev_c = np.clip(st.kf_level[kf], 0, cfg.n_levels - 1)
            lev_l = np.clip(st.kf_level[cand][idx], 0, cfg.n_levels - 1)
            res = _solve_sim3(
                self._next_key(),
                jnp.array(x_c.astype(np.float32)), jnp.array(x_l.astype(np.float32)),
                jnp.array(st.kf_xy[kf]), jnp.array(st.kf_xy[cand][idx]),
                jnp.array(pair_ok), jnp.array(cfg.K4),
                jnp.array((9.21 * cfg.sigma2[lev_c]).astype(np.float32)),
                jnp.array((9.21 * cfg.sigma2[lev_l]).astype(np.float32)),
            )
            if not bool(res.success):
                continue
            # refine (OptimizeSim3, >=20 inliers gate :340-352)
            opt = sim3_opt.optimize_sim3(
                res.s12, res.R12, res.t12,
                jnp.array(x_c.astype(np.float32)), jnp.array(x_l.astype(np.float32)),
                jnp.array(st.kf_xy[kf]), jnp.array(st.kf_xy[cand][idx]),
                jnp.array(cfg.inv_sigma2[lev_c].astype(np.float32)),
                jnp.array(cfg.inv_sigma2[lev_l].astype(np.float32)),
                jnp.array(pair_ok & np.asarray(res.inliers)), jnp.array(cfg.K4),
            )
            if int(opt.n_inliers) < 20:
                continue
            # guided projection of the loop neighborhood's points (:355-399)
            total, loop_points = self._guided_matches(
                kf, cand, float(opt.s12), np.asarray(opt.R12), np.asarray(opt.t12)
            )
            if total >= 40:
                return True, cand, float(opt.s12), np.asarray(opt.R12), np.asarray(opt.t12), loop_points
        return False, -1, 1.0, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), None

    def _guided_matches(self, kf: int, loop_kf: int, s_cl, R_cl, t_cl):
        """Project the loop KF neighborhood's map points into the current
        keyframe through the corrected Scw (SearchBySim3 equivalent)."""
        st, cfg = self.map, self.cfg
        covis = st.covisibility()
        group = {loop_kf} | {
            int(k) for k in np.nonzero(covis[loop_kf] >= 15)[0] if st.kf_valid[k]
        }
        pts = np.unique(st.kf_point[np.array(sorted(group))])
        pts = pts[pts >= 0]
        pts = pts[st.mp_valid[pts]]
        if len(pts) == 0:
            return 0, None
        cap = 4096
        pts = pts[:cap]
        pad = cap - len(pts)
        pts_pad = np.concatenate([pts, np.zeros(pad, np.int64)])
        pvalid = np.concatenate([np.ones(len(pts), bool), np.zeros(pad, bool)])

        # corrected camera coords: x_c = S_cl (R_lw x + t_lw)
        x_l = st.mp_xyz[pts_pad] @ st.kf_R[loop_kf].T + st.kf_t[loop_kf]
        x_c = s_cl * (x_l @ R_cl.T) + t_cl
        z = x_c[:, 2]
        uv = np.stack(
            [cfg.fx * x_c[:, 0] / np.maximum(z, 1e-9) + cfg.cx,
             cfg.fy * x_c[:, 1] / np.maximum(z, 1e-9) + cfg.cy], 1).astype(np.float32)
        pvalid &= z > 0
        dist = np.linalg.norm(x_c, axis=1)
        pred = predict_scale_level(dist, st.mp_max_dist[pts_pad], cfg.scale_factor, cfg.n_levels)
        m = _search_proj(
            jnp.array(st.mp_desc[pts_pad]), jnp.array(uv), jnp.array(pred),
            jnp.array(pvalid),
            jnp.array(st.kf_desc[kf]), jnp.array(st.kf_xy[kf]),
            jnp.array(st.kf_level[kf]), jnp.array(st.kf_feat_valid[kf]),
            jnp.array(cfg.scale_factors),
            radius=7.5, max_dist=100, nn_ratio=1.0, level_window=(-1, 1),
        )
        mask = np.asarray(m.mask)
        idx = np.asarray(m.idx)
        loop_points = (pts_pad[mask], idx[mask])  # (map point, feature in kf)
        return int(mask.sum()), loop_points

    # ------------------------------------------------------------------
    # CorrectLoop (:416-574)
    # ------------------------------------------------------------------

    def correct_loop(self, kf: int, loop_kf: int, s_cl, R_cl, t_cl, loop_points):
        st, cfg = self.map, self.cfg
        covis_before = st.covisibility()

        # corrected Scw of the current KF: S_cl o S_lw (:435-439)
        S_lw = (np.float32(1.0), st.kf_R[loop_kf].copy(), st.kf_t[loop_kf].copy())
        S_cw_corr = _compose_np((s_cl, R_cl, t_cl), S_lw)

        # covisible group of the current KF inherits the correction (:441-510)
        group = [kf] + [
            int(k) for k in np.nonzero(covis_before[kf] >= 15)[0] if st.kf_valid[k] and k != kf
        ]
        old_poses = {}
        new_sim3 = {}
        T_cw_old = (np.float32(1.0), st.kf_R[kf].copy(), st.kf_t[kf].copy())
        T_wc_old = _inverse_np(T_cw_old)
        for k in group:
            S_kw_old = (np.float32(1.0), st.kf_R[k].copy(), st.kf_t[k].copy())
            old_poses[k] = S_kw_old
            if k == kf:
                S_kw_new = S_cw_corr
            else:
                S_kc = _compose_np(S_kw_old, T_wc_old)   # relative, pre-correction
                S_kw_new = _compose_np(S_kc, S_cw_corr)
            new_sim3[k] = S_kw_new
            # write back SE3 = [R, t/s] (:489-498)
            s, R, t = S_kw_new
            st.kf_R[k] = R
            st.kf_t[k] = t / s
        # correct the group's points through their KF correction (:458-487)
        corrected_pts = set()
        for k in group:
            pts = st.kf_point[k]
            pts = pts[pts >= 0]
            pts = [int(p) for p in pts if st.mp_valid[p] and p not in corrected_pts]
            if not pts:
                continue
            pts = np.array(pts)
            s_old, R_old, t_old = old_poses[k]
            s_new, R_new, t_new = new_sim3[k]
            x_cam = s_old * (st.mp_xyz[pts] @ R_old.T) + t_old
            s_i, R_i, t_i = _inverse_np((s_new, R_new, t_new))
            st.mp_xyz[pts] = (s_i * (x_cam @ R_i.T) + t_i).astype(np.float32)
            corrected_pts.update(int(p) for p in pts)

        # fuse the guided loop matches into the current KF (:514-534)
        if loop_points is not None:
            mps, feats = loop_points
            for mp, f in zip(mps, feats):
                mp, f = int(mp), int(f)
                if not st.mp_valid[mp]:
                    continue
                existing = int(st.kf_point[kf, f])
                if existing >= 0 and st.mp_valid[existing] and existing != mp:
                    st.replace_point(existing, mp)
                else:
                    st.add_observation(mp, kf, f)

        # essential-graph optimization over ALL keyframes (:560)
        self._essential_graph(kf, loop_kf, covis_before, new_sim3)

        # loop edges (:563-565)
        st.kf_loop_edges[kf].add(loop_kf)
        st.kf_loop_edges[loop_kf].add(kf)
        self.last_loop_kf_id = st.next_kf_id

    def _essential_graph(self, kf: int, loop_kf: int, covis_before, corrected: dict):
        st, cfg = self.map, self.cfg
        K = st.max_kf
        valid = st.kf_valid.copy()

        # vertex estimates: corrected poses where available, else current
        s_v = np.ones(K, np.float32)
        R_v = st.kf_R.copy()
        t_v = st.kf_t.copy()
        for k, (s, R, t) in corrected.items():
            s_v[k] = s
            R_v[k] = R
            t_v[k] = t

        # measurement source: poses BEFORE correction for structural edges
        old_s = np.ones(K, np.float32)
        old_R = st.kf_R.copy()
        old_t = st.kf_t.copy()
        # note: group KFs already hold corrected SE3; rebuild their
        # pre-correction poses from the stored old_poses via `corrected`
        # structure is approximate here — edges among corrected KFs use the
        # corrected relative pose, which equals the pre-correction relative
        # pose by construction (rigid propagation), so this is exact.

        e_i, e_j, e_s, e_R, e_t = [], [], [], [], []

        def add_edge(i, j, meas=None):
            if meas is None:
                # Sji from current stored poses
                S_j = (old_s[j], old_R[j], old_t[j])
                S_i_inv = _inverse_np((old_s[i], old_R[i], old_t[i]))
                meas = _compose_np(S_j, S_i_inv)
            e_i.append(i)
            e_j.append(j)
            e_s.append(meas[0])
            e_R.append(meas[1])
            e_t.append(meas[2])

        seen = set()
        for k in np.nonzero(valid)[0]:
            k = int(k)
            parent = int(st.kf_parent[k])
            if parent >= 0 and valid[parent]:
                key = (min(k, parent), max(k, parent))
                if key not in seen:
                    seen.add(key)
                    add_edge(k, parent)
            for le in st.kf_loop_edges[k]:
                key = (min(k, le), max(k, le))
                if valid[le] and key not in seen:
                    seen.add(key)
                    add_edge(k, int(le))
            # strong covisibility edges (weight >= 100, Optimizer.cc:1496)
            for n in np.nonzero(covis_before[k] >= 100)[0]:
                n = int(n)
                key = (min(k, n), max(k, n))
                if valid[n] and key not in seen:
                    seen.add(key)
                    add_edge(k, n)
        # the new loop edge with its measured Sim3
        S_c = corrected[kf]
        S_l_inv = _inverse_np((1.0, st.kf_R[loop_kf], st.kf_t[loop_kf]))
        add_edge(loop_kf, kf, _compose_np(S_c, S_l_inv))

        E = len(e_i)
        cap = 1 << int(np.ceil(np.log2(max(E, 64))))
        pad = cap - E
        prob = essential_graph.EssentialGraphProblem(
            s=jnp.array(s_v), R=jnp.array(R_v), t=jnp.array(t_v),
            fixed=jnp.array(~valid | (np.arange(K) == loop_kf)),
            e_i=jnp.array(np.concatenate([e_i, np.zeros(pad)]).astype(np.int32)),
            e_j=jnp.array(np.concatenate([e_j, np.zeros(pad)]).astype(np.int32)),
            e_s=jnp.array(np.concatenate([e_s, np.ones(pad)]).astype(np.float32)),
            e_R=jnp.array(
                np.concatenate([np.stack(e_R), np.tile(np.eye(3), (pad, 1, 1))]).astype(np.float32)
            ),
            e_t=jnp.array(
                np.concatenate([np.stack(e_t), np.zeros((pad, 3))]).astype(np.float32)
            ),
            e_valid=jnp.array(np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])),
        )
        res = essential_graph.optimize_essential_graph(prob, iterations=20)
        s_new = np.asarray(res.s)
        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)

        # correct every point through its reference KF (Optimizer.cc:1701-1718)
        for p in np.nonzero(st.mp_valid)[0]:
            p = int(p)
            ref = int(st.mp_ref_kf[p])
            if ref < 0 or not valid[ref]:
                continue
            s_o, R_o, t_o = s_v[ref], R_v[ref], t_v[ref]
            x_cam = s_o * (R_o @ st.mp_xyz[p]) + t_o
            s_n, R_n, t_n = s_new[ref], R_new[ref], t_new[ref]
            si, Ri, ti = _inverse_np((s_n, R_n, t_n))
            st.mp_xyz[p] = (si * (Ri @ x_cam) + ti).astype(np.float32)
        # recover SE3 poses [R, t/s]
        for k in np.nonzero(valid)[0]:
            k = int(k)
            st.kf_R[k] = R_new[k]
            st.kf_t[k] = (t_new[k] / s_new[k]).astype(np.float32)


def _compose_np(a, b):
    sa, Ra, ta = a
    sb, Rb, tb = b
    return (
        np.float32(sa * sb),
        (Ra @ Rb).astype(np.float32),
        (sa * (Ra @ tb) + ta).astype(np.float32),
    )


def _inverse_np(a):
    s, R, t = a
    si = 1.0 / s
    Ri = R.T
    return np.float32(si), Ri.astype(np.float32), (-si * (Ri @ t)).astype(np.float32)
