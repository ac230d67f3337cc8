"""Local mapping: keyframe insertion, triangulation, fusion, local BA.

Replaces src/LocalMapping.cc (639 LoC): ProcessNewKeyFrame (:145-195),
MapPointCulling (:197-225), CreateNewMapPoints (:227-393, epipolar search
against 20 covisible keyframes + 6 validity gates), SearchInNeighbors
(:395-472, two-way fusion), local BA (:84), KeyFrameCulling (:546-600).
The reference's 5 Hz polling thread with abort flags becomes a
deterministic per-keyframe call from the System.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SlamConfig
from ..frontend.frame import Frame, predict_scale_level
from ..geometry import se3, epipolar, triangulate
from ..map import culling
from ..map.map_state import MapState
from ..map.keyframe_db import KeyFrameDatabase
from ..ops import matching
from ..solvers import ba

_tri_search = jax.jit(
    matching.search_for_triangulation, static_argnames=("max_dist", "check_rotation")
)
_fuse = jax.jit(matching.fuse_search, static_argnames=("max_dist",))
_triangulate = jax.jit(triangulate.triangulate_dlt)
_F12 = jax.jit(epipolar.fundamental_from_poses)


class LocalMapper:
    def __init__(self, cfg: SlamConfig, state: MapState, kfdb: KeyFrameDatabase | None = None):
        self.cfg = cfg
        self.map = state
        self.kfdb = kfdb
        self.probation: list[int] = []  # recently created points under culling

    # ------------------------------------------------------------------

    def insert_keyframe(self, frame: Frame) -> int:
        """ProcessNewKeyFrame (:145-195): create the KF, bind tracked
        points, refresh attributes, covisibility and the database."""
        st = self.map
        kf = st.add_keyframe(
            frame.R, frame.t, frame.xy_un, frame.level, frame.angle, frame.desc,
            frame.valid, frame_id=frame.frame_id, timestamp=frame.timestamp,
        )
        tracked = np.nonzero((frame.point >= 0) & ~frame.outlier)[0]
        gen_ok = st.mp_gen[frame.point[tracked]] == frame.point_gen[tracked]
        tracked = tracked[gen_ok]
        from ..native import add_observations_native

        if add_observations_native(st, kf, tracked, frame.point[tracked]) is None:
            for f in tracked:
                mp = int(frame.point[f])
                if st.mp_valid[mp]:
                    st.add_observation(mp, kf, int(f))
        st.update_point_attributes(frame.point[tracked], self.cfg.scale_factors)
        covis = st.covisibility()
        st.update_spanning_tree(kf, covis[kf])
        if self.kfdb is not None:
            self.kfdb.add(kf, st.kf_desc[kf], st.kf_feat_valid[kf])
        return kf

    # ------------------------------------------------------------------

    def process(self, frame: Frame) -> int:
        kf = self.insert_keyframe(frame)
        self.probation = culling.cull_recent_points(self.map, self.probation, kf_age_id := self.map.next_kf_id - 1)
        self.create_new_points(kf)
        self.fuse_neighbors(kf)
        self.local_ba(kf)
        self.cull_keyframes(kf)
        return kf

    def cull_keyframes(self, kf: int) -> list[int]:
        """Redundant-KF culling over the covisible neighbors (:546-600)."""
        covis = self.map.covisibility()
        neighbors = np.nonzero(covis[kf] >= 15)[0]
        erased = culling.cull_redundant_keyframes(self.map, neighbors[neighbors != kf])
        # culled KFs leave the place-recognition index too (KeyFrame.cc:586-587
        # -> KeyFrameDatabase::erase), so they stop competing as candidates
        if self.kfdb is not None:
            for k in erased:
                self.kfdb.erase(k)
        return erased

    # ------------------------------------------------------------------
    # triangulation of new points (CreateNewMapPoints :227-393)
    # ------------------------------------------------------------------

    def _scene_median_depth(self, kf: int) -> float:
        pts = self.map.kf_point[kf]
        pts = pts[pts >= 0]
        if len(pts) == 0:
            return 1.0
        xc = self.map.mp_xyz[pts] @ self.map.kf_R[kf].T + self.map.kf_t[kf]
        return float(np.median(xc[:, 2]))

    def create_new_points(self, kf: int, max_neighbors: int = 20):
        st, cfg = self.map, self.cfg
        covis = st.covisibility()
        row = covis[kf].copy()
        row[kf] = 0
        row[~st.kf_valid] = 0
        neighbors = np.argsort(-row)[:max_neighbors]
        neighbors = neighbors[row[neighbors] >= 15]

        R1, t1 = st.kf_R[kf], st.kf_t[kf]
        O1 = -R1.T @ t1
        ratio_factor = 1.5 * cfg.scale_factor

        for kn in neighbors:
            kn = int(kn)
            R2, t2 = st.kf_R[kn], st.kf_t[kn]
            O2 = -R2.T @ t2
            baseline = np.linalg.norm(O2 - O1)
            med_depth = self._scene_median_depth(kn)
            if baseline / max(med_depth, 1e-9) < 0.01:  # :256-260
                continue
            F12 = _F12(jnp.array(R1), jnp.array(t1), jnp.array(R2), jnp.array(t2),
                       jnp.array(cfg.K4))
            # epipole of camera 1 in image 2
            xc = R2 @ O1 + t2
            ex = cfg.fx * xc[0] / max(xc[2], 1e-9) + cfg.cx
            ey = cfg.fy * xc[1] / max(xc[2], 1e-9) + cfg.cy
            m = _tri_search(
                jnp.array(st.kf_desc[kf]), jnp.array(st.kf_xy[kf]),
                jnp.array(st.kf_angle[kf]), jnp.array(st.kf_level[kf]),
                jnp.array(st.kf_point[kf] >= 0), jnp.array(st.kf_feat_valid[kf]),
                jnp.array(st.kf_desc[kn]), jnp.array(st.kf_xy[kn]),
                jnp.array(st.kf_angle[kn]), jnp.array(st.kf_level[kn]),
                jnp.array(st.kf_point[kn] >= 0), jnp.array(st.kf_feat_valid[kn]),
                F12, jnp.array(cfg.sigma2), jnp.array([ex, ey], jnp.float32),
                jnp.array(cfg.scale_factors),
            )
            mask = np.asarray(m.mask)
            if mask.sum() == 0:
                continue
            idx = np.asarray(m.idx)
            uv1 = st.kf_xy[kf]
            uv2 = st.kf_xy[kn][idx]
            P1 = triangulate.projection_matrix(jnp.array(R1), jnp.array(t1), jnp.array(cfg.K4))
            P2 = triangulate.projection_matrix(jnp.array(R2), jnp.array(t2), jnp.array(cfg.K4))
            xw, ok = _triangulate(jnp.array(uv1), jnp.array(uv2), P1, P2)
            xw = np.asarray(xw)
            ok = np.asarray(ok) & mask

            # validity gates (:299-374)
            xc1 = xw @ R1.T + t1
            xc2 = xw @ R2.T + t2
            ok &= (xc1[:, 2] > 0) & (xc2[:, 2] > 0)
            par = np.asarray(triangulate.parallax_cos(jnp.array(xw), jnp.array(O1), jnp.array(O2)))
            ok &= par < 0.9998
            e1 = np.stack(
                [cfg.fx * xc1[:, 0] / np.maximum(xc1[:, 2], 1e-9) + cfg.cx,
                 cfg.fy * xc1[:, 1] / np.maximum(xc1[:, 2], 1e-9) + cfg.cy], 1) - uv1
            e2 = np.stack(
                [cfg.fx * xc2[:, 0] / np.maximum(xc2[:, 2], 1e-9) + cfg.cx,
                 cfg.fy * xc2[:, 1] / np.maximum(xc2[:, 2], 1e-9) + cfg.cy], 1) - uv2
            s1 = cfg.sigma2[np.clip(st.kf_level[kf], 0, cfg.n_levels - 1)]
            s2 = cfg.sigma2[np.clip(st.kf_level[kn][idx], 0, cfg.n_levels - 1)]
            ok &= (e1 ** 2).sum(1) < 5.991 * s1
            ok &= (e2 ** 2).sum(1) < 5.991 * s2
            # scale-consistency (:356-372)
            d1 = np.linalg.norm(xw - O1, axis=1)
            d2 = np.linalg.norm(xw - O2, axis=1)
            ratio_dist = d2 / np.maximum(d1, 1e-9)
            sf1 = cfg.scale_factors[np.clip(st.kf_level[kf], 0, cfg.n_levels - 1)]
            sf2 = cfg.scale_factors[np.clip(st.kf_level[kn][idx], 0, cfg.n_levels - 1)]
            ratio_octave = sf1 / sf2
            ok &= (ratio_dist < ratio_octave * ratio_factor) & (
                ratio_dist * ratio_factor > ratio_octave
            )
            feats1 = np.nonzero(ok)[0]
            if len(feats1) == 0:
                continue
            n_free = int((~st.mp_valid).sum())
            if n_free < len(feats1):
                feats1 = feats1[:n_free]
            ids = st.add_points(
                xw[feats1], st.kf_desc[kf][feats1], ref_kf=kf,
                first_kf_id=st.next_kf_id - 1,
            )
            for mp_id, f1 in zip(ids, feats1):
                st.add_observation(int(mp_id), kf, int(f1))
                st.add_observation(int(mp_id), kn, int(idx[f1]))
                self.probation.append((int(mp_id), int(st.mp_gen[mp_id])))
            st.update_point_attributes(ids, cfg.scale_factors)

    # ------------------------------------------------------------------
    # duplicate fusion (SearchInNeighbors :395-472)
    # ------------------------------------------------------------------

    def fuse_neighbors(self, kf: int, n_neighbors: int = 20):
        st, cfg = self.map, self.cfg
        covis = st.covisibility()
        row = covis[kf].copy()
        row[kf] = 0
        row[~st.kf_valid] = 0
        first_ring = np.argsort(-row)[:n_neighbors]
        first_ring = [int(k) for k in first_ring if row[k] >= 15]
        targets = set(first_ring)
        for k1 in first_ring:  # second ring (:408-419)
            row2 = covis[k1].copy()
            row2[~st.kf_valid] = 0
            row2[k1] = 0
            for k2 in np.argsort(-row2)[:5]:
                if row2[k2] >= 15 and int(k2) != kf:
                    targets.add(int(k2))

        # direction 1: current KF's points into neighbors
        for kn in targets:
            self._fuse_into(kf, kn)
        # direction 2: neighbors' points into current KF
        for kn in targets:
            self._fuse_into(kn, kf)
        # refresh attributes of the current KF's points
        pts = st.kf_point[kf]
        st.update_point_attributes(np.unique(pts[pts >= 0]), cfg.scale_factors)

    def _fuse_into(self, src_kf: int, dst_kf: int):
        """Project src's points into dst; merge with matched keypoints
        (ORBmatcher::Fuse, ORBmatcher.cc:1016-1134)."""
        st, cfg = self.map, self.cfg
        pts = st.kf_point[src_kf]
        q = pts.copy()
        valid_q = q >= 0
        mpid = np.clip(q, 0, st.max_mp - 1)
        valid_q &= st.mp_valid[mpid]
        xw = st.mp_xyz[mpid]
        R, t = st.kf_R[dst_kf], st.kf_t[dst_kf]
        xc = xw @ R.T + t
        z = xc[:, 2]
        uv = np.stack(
            [cfg.fx * xc[:, 0] / np.maximum(z, 1e-9) + cfg.cx,
             cfg.fy * xc[:, 1] / np.maximum(z, 1e-9) + cfg.cy], 1).astype(np.float32)
        valid_q &= z > 0
        O = -R.T @ t
        dist = np.linalg.norm(xw - O, axis=1)
        valid_q &= (dist >= 0.8 * st.mp_min_dist[mpid]) & (dist <= 1.2 * st.mp_max_dist[mpid])
        pred = predict_scale_level(dist, st.mp_max_dist[mpid], cfg.scale_factor, cfg.n_levels)
        m = _fuse(
            jnp.array(st.mp_desc[mpid]), jnp.array(uv), jnp.array(pred), jnp.array(valid_q),
            jnp.array(st.kf_desc[dst_kf]), jnp.array(st.kf_xy[dst_kf]),
            jnp.array(st.kf_level[dst_kf]), jnp.array(st.kf_feat_valid[dst_kf]),
            jnp.array(cfg.scale_factors),
        )
        mask = np.asarray(m.mask)
        idx = np.asarray(m.idx)
        for f_src in np.nonzero(mask)[0]:
            mp = int(q[f_src])
            f_dst = int(idx[f_src])
            existing = int(st.kf_point[dst_kf, f_dst])
            if existing >= 0 and st.mp_valid[existing]:
                # merge: keep the point with more observations (:1083-1091)
                if st.n_observations(existing) >= st.n_observations(mp):
                    st.replace_point(mp, existing)
                else:
                    st.replace_point(existing, mp)
            else:
                st.add_observation(mp, dst_kf, f_dst)

    # ------------------------------------------------------------------
    # local bundle adjustment (Optimizer::LocalBundleAdjustment :287-536)
    # ------------------------------------------------------------------

    def build_local_ba_problem(self, kf: int):
        st, cfg = self.map, self.cfg
        covis = st.covisibility()
        row = covis[kf].copy()
        row[kf] = 0
        row[~st.kf_valid] = 0
        local = [kf] + [int(k) for k in np.argsort(-row) if row[k] > 0][: cfg.local_ba_kf - 1]
        local_set = set(local)
        # local points = points seen by local KFs
        pts = np.unique(st.kf_point[np.array(local)])
        pts = pts[pts >= 0]
        pts = pts[st.mp_valid[pts]]
        # fixed KFs: other observers of local points
        fixed = set()
        for p in pts:
            for k in st.mp_obs_kf[p]:
                if k >= 0 and int(k) not in local_set:
                    fixed.add(int(k))
                    if len(fixed) >= cfg.local_ba_fixed:
                        break
            if len(fixed) >= cfg.local_ba_fixed:
                break
        all_kfs = local + sorted(fixed)
        kf_index = {k: i for i, k in enumerate(all_kfs)}
        K = cfg.local_ba_kf + cfg.local_ba_fixed
        P = min(cfg.max_mp, 1 << int(np.ceil(np.log2(max(len(pts), 1) + 1))))
        P = max(P, 256)

        kf_R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        kf_t = np.zeros((K, 3), np.float32)
        kf_fixed = np.ones(K, bool)
        for i, k in enumerate(all_kfs):
            kf_R[i] = st.kf_R[k]
            kf_t[i] = st.kf_t[k]
            kf_fixed[i] = (k in fixed) or (k == 0)  # KF0 is the gauge

        points = np.zeros((P, 3), np.float32)
        point_valid = np.zeros(P, bool)
        points[: len(pts)] = st.mp_xyz[pts]
        point_valid[: len(pts)] = True
        pt_index = {p: i for i, p in enumerate(pts.tolist())}

        O = cfg.local_ba_obs
        obs_kf = np.zeros(O, np.int32)
        obs_pt = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_w = np.ones(O, np.float32)
        obs_valid = np.zeros(O, bool)
        kf_index_dense = np.full(st.max_kf, -1, np.int32)
        for k, i in kf_index.items():
            kf_index_dense[k] = i
        from ..native import build_ba_obs_native

        native = build_ba_obs_native(st, pts, kf_index_dense, O)
        if native is not None:
            okf, opt, ofe, osp, osk = native
            n = len(okf)
            obs_kf[:n] = okf
            obs_pt[:n] = opt
            obs_uv[:n] = st.kf_xy[osk, ofe]
            lv = np.clip(st.kf_level[osk, ofe], 0, cfg.n_levels - 1)
            obs_w[:n] = cfg.inv_sigma2[lv]
            obs_valid[:n] = True
            obs_src = list(zip(osp.tolist(), osk.tolist(), ofe.tolist()))
        else:
            obs_src = []  # (mp, kf, feat) for writeback/erasure
            n = 0
            for p in pts:
                pi = pt_index[int(p)]
                for s in np.nonzero(st.mp_obs_kf[p] >= 0)[0]:
                    k = int(st.mp_obs_kf[p, s])
                    if k not in kf_index or n >= O:
                        continue
                    f = int(st.mp_obs_feat[p, s])
                    obs_kf[n] = kf_index[k]
                    obs_pt[n] = pi
                    obs_uv[n] = st.kf_xy[k, f]
                    obs_w[n] = cfg.inv_sigma2[min(int(st.kf_level[k, f]), cfg.n_levels - 1)]
                    obs_valid[n] = True
                    obs_src.append((int(p), k, f))
                    n += 1

        prob = ba.BAProblem(
            kf_R=jnp.array(kf_R), kf_t=jnp.array(kf_t), kf_fixed=jnp.array(kf_fixed),
            points=jnp.array(points), point_valid=jnp.array(point_valid),
            obs_kf=jnp.array(obs_kf), obs_pt=jnp.array(obs_pt),
            obs_uv=jnp.array(obs_uv), obs_w=jnp.array(obs_w),
            obs_valid=jnp.array(obs_valid), K4=jnp.array(cfg.K4),
        )
        return prob, all_kfs, pts, obs_src

    def local_ba(self, kf: int):
        st = self.map
        prob, all_kfs, pts, obs_src = self.build_local_ba_problem(kf)
        if len(obs_src) < 20:
            return
        res = ba.two_stage_local_ba(prob)
        # writeback (Optimizer.cc:504-534)
        kf_R = np.asarray(res.kf_R)
        kf_t = np.asarray(res.kf_t)
        for i, k in enumerate(all_kfs):
            if not bool(np.asarray(prob.kf_fixed)[i]):
                st.kf_R[k] = kf_R[i]
                st.kf_t[k] = kf_t[i]
        new_pts = np.asarray(res.points)
        st.mp_xyz[pts] = new_pts[: len(pts)]
        # erase outlier observations (:453-470 + :496-520)
        out = np.asarray(res.obs_outlier)
        for o, (p, k, f) in enumerate(obs_src):
            if out[o]:
                st.remove_observation(p, k)
        st.update_point_attributes(pts[st.mp_valid[pts]], self.cfg.scale_factors)
