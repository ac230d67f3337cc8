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
from ..frontend.frame import Frame
from ..geometry import epipolar, triangulate
from ..map import culling
from ..map.map_state import MapState
from ..map.keyframe_db import KeyFrameDatabase
from ..ops import matching
from ..solvers import ba
from ..utils.pack import packed_call


# fixed fuse-target capacity (first + second covisibility ring, strongest
# first) — one compiled program for SearchInNeighbors
FUSE_TARGETS = 32


@packed_call
def _fuse_batch(q_desc, q_xyz, q_min, q_max, q_valid,
                t_desc, t_xy, t_level, t_valid, Rs, ts,
                K4, scale_factors):
    """Batched ORBmatcher::Fuse search (ORBmatcher.cc:1016-1134): project
    each row's query point set into its row's target keyframe and match.
    Projection, depth-band gating and scale prediction all happen on device;
    the host only consumes the (T, F) match table for the merge bookkeeping.
    """
    n_levels = scale_factors.shape[0]
    log_sf = jnp.log(scale_factors[1])

    def per_target(qd, qx, qmin, qmax, qv, td, txy, tl, tv, R, t):
        xc = qx @ R.T + t
        z = xc[:, 2]
        uv = jnp.stack([
            K4[0] * xc[:, 0] / jnp.maximum(z, 1e-9) + K4[2],
            K4[1] * xc[:, 1] / jnp.maximum(z, 1e-9) + K4[3],
        ], axis=1)
        O = -R.T @ t
        dist = jnp.linalg.norm(qx - O, axis=-1)
        valid = qv & (z > 0)
        valid &= (dist >= 0.8 * qmin) & (dist <= 1.2 * qmax)
        ratio = jnp.maximum(qmax, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_sf)
        pred = jnp.clip(pred, 0, n_levels - 1).astype(jnp.int32)
        return matching.fuse_search(
            qd, uv, pred, valid, td, txy, tl, tv, scale_factors
        )

    return jax.vmap(per_target)(
        q_desc, q_xyz, q_min, q_max, q_valid,
        t_desc, t_xy, t_level, t_valid, Rs, ts,
    )

# fixed neighbor capacity: all of CreateNewMapPoints is ONE compiled program
TRI_NEIGHBORS = 20


@packed_call
def _tri_batch(desc1, xy1, angle1, level1, has1, valid1, R1, t1,
               descs2, xys2, angles2, levels2, has2, valids2, Rs2, ts2,
               K4, sigma2, scale_factors):
    """Triangulation against all covisible neighbors in one program.

    Replaces the reference's per-neighbor loop (CreateNewMapPoints,
    LocalMapping.cc:227-393: ComputeF12 + SearchForTriangulation + cv SVD
    triangulation + 6 validity gates) with a vmap over a padded neighbor
    axis — one dispatch and one host transfer per keyframe instead of ~20.

    Returns (ok (B, F) bool, idx (B, F) int32, xw (B, F, 3)).
    """
    O1 = -R1.T @ t1
    ratio_factor = 1.5 * scale_factors[1]

    def per_neighbor(desc2, xy2, angle2, level2, h2, v2, R2, t2):
        F12 = epipolar.fundamental_from_poses(R1, t1, R2, t2, K4)
        O2 = -R2.T @ t2
        # epipole of camera 1 in image 2 (LocalMapping.cc:262-266)
        xc_e = R2 @ O1 + t2
        ep = jnp.stack([
            K4[0] * xc_e[0] / jnp.maximum(xc_e[2], 1e-9) + K4[2],
            K4[1] * xc_e[1] / jnp.maximum(xc_e[2], 1e-9) + K4[3],
        ])
        m = matching.search_for_triangulation(
            desc1, xy1, angle1, level1, has1, valid1,
            desc2, xy2, angle2, level2, h2, v2,
            F12, sigma2, ep, scale_factors,
        )
        uv1, uv2 = xy1, xy2[m.idx]
        P1 = triangulate.projection_matrix(R1, t1, K4)
        P2 = triangulate.projection_matrix(R2, t2, K4)
        xw, ok_dlt = triangulate.triangulate_dlt(uv1, uv2, P1, P2)
        ok = m.mask & ok_dlt
        # validity gates (:299-374)
        e1, pos1 = triangulate.reprojection_error2(xw, uv1, R1, t1, K4)
        e2, pos2 = triangulate.reprojection_error2(xw, uv2, R2, t2, K4)
        ok &= pos1 & pos2
        ok &= triangulate.parallax_cos(xw, O1, O2) < 0.9998
        n_levels = sigma2.shape[0]
        s1 = sigma2[jnp.clip(level1, 0, n_levels - 1)]
        s2 = sigma2[jnp.clip(level2[m.idx], 0, n_levels - 1)]
        ok &= (e1 < 5.991 * s1) & (e2 < 5.991 * s2)
        # scale consistency (:356-372)
        d1 = jnp.linalg.norm(xw - O1, axis=-1)
        d2 = jnp.linalg.norm(xw - O2, axis=-1)
        ratio_dist = d2 / jnp.maximum(d1, 1e-9)
        sf1 = scale_factors[jnp.clip(level1, 0, n_levels - 1)]
        sf2 = scale_factors[jnp.clip(level2[m.idx], 0, n_levels - 1)]
        ratio_octave = sf1 / sf2
        ok &= (ratio_dist < ratio_octave * ratio_factor) & (
            ratio_dist * ratio_factor > ratio_octave
        )
        return ok, m.idx, xw

    return jax.vmap(per_neighbor)(
        descs2, xys2, angles2, levels2, has2, valids2, Rs2, ts2
    )


_two_stage_packed = packed_call(
    lambda *arrs: ba.two_stage_local_ba(ba.BAProblem(*arrs))
)


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

    # the per-keyframe mapping pipeline, stage by stage. The System either
    # runs all stages synchronously (deterministic default) or spreads them
    # across subsequent frames (cfg.async_mapping) — the TPU-native
    # equivalent of the reference's mapper thread lagging the tracker
    # (LocalMapping::Run polls its queue at 5 Hz, LocalMapping.cc:52-127)
    STAGES = ("cull_points", "triangulate", "fuse", "ba", "cull_kf")

    def run_stage(self, kf: int, stage: str):
        if stage == "cull_points":
            self.probation = culling.cull_recent_points(
                self.map, self.probation, self.map.next_kf_id - 1
            )
        elif stage == "triangulate":
            self.create_new_points(kf)
        elif stage == "fuse":
            self.fuse_neighbors(kf)
        elif stage == "ba":
            self.local_ba(kf)
        elif stage == "cull_kf":
            self.cull_keyframes(kf)
        else:  # pragma: no cover
            raise ValueError(stage)

    def process(self, frame: Frame) -> int:
        kf = self.insert_keyframe(frame)
        for stage in self.STAGES:
            self.run_stage(kf, stage)
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

    def create_new_points(self, kf: int, max_neighbors: int = TRI_NEIGHBORS):
        st, cfg = self.map, self.cfg
        covis = st.covisibility()
        row = covis[kf].copy()
        row[kf] = 0
        row[~st.kf_valid] = 0
        neighbors = np.argsort(-row)[:max_neighbors]
        neighbors = neighbors[row[neighbors] >= 15]

        R1, t1 = st.kf_R[kf], st.kf_t[kf]
        O1 = -R1.T @ t1

        # baseline / median-depth gate per neighbor (:256-260) — host math
        active = []
        for kn in neighbors:
            kn = int(kn)
            O2 = -st.kf_R[kn].T @ st.kf_t[kn]
            baseline = np.linalg.norm(O2 - O1)
            if baseline / max(self._scene_median_depth(kn), 1e-9) >= 0.01:
                active.append(kn)
        if not active:
            return

        # pad the neighbor axis to the static capacity; pad rows carry
        # valids2=False so they cannot produce matches
        B = TRI_NEIGHBORS
        nb = (active + [active[0]] * B)[:B]
        sel = np.array(nb)
        valids2 = np.zeros((B, st.n_feat), bool)
        valids2[: len(active)] = st.kf_feat_valid[sel[: len(active)]]

        ok, idx, xw = _tri_batch(
            st.kf_desc[kf], st.kf_xy[kf],
            st.kf_angle[kf], st.kf_level[kf],
            st.kf_point[kf] >= 0, st.kf_feat_valid[kf],
            R1, t1,
            st.kf_desc[sel], st.kf_xy[sel],
            st.kf_angle[sel], st.kf_level[sel],
            st.kf_point[sel] >= 0, valids2,
            st.kf_R[sel], st.kf_t[sel],
            cfg.K4, cfg.sigma2, cfg.scale_factors,
        )
        ok = np.asarray(ok)
        idx = np.asarray(idx)
        xw = np.asarray(xw)

        # sequential claim: a feature triangulated against an earlier (more
        # covisible) neighbor is excluded from later ones, mirroring the
        # reference's in-loop has-point updates
        claimed = st.kf_point[kf] >= 0
        new_ids = []
        from ..native import add_observations_native

        for b, kn in enumerate(active):
            feats1 = np.nonzero(ok[b] & ~claimed)[0]
            if len(feats1) == 0:
                continue
            n_free = int((~st.mp_valid).sum())
            if n_free < len(feats1):
                feats1 = feats1[:n_free]
                if len(feats1) == 0:
                    break
            ids = st.add_points(
                xw[b][feats1], st.kf_desc[kf][feats1], ref_kf=kf,
                first_kf_id=st.next_kf_id - 1,
            )
            if add_observations_native(st, kf, feats1, ids) is None:
                for mp_id, f1 in zip(ids, feats1):
                    st.add_observation(int(mp_id), kf, int(f1))
            if add_observations_native(st, kn, idx[b][feats1], ids) is None:
                for mp_id, f1 in zip(ids, feats1):
                    st.add_observation(int(mp_id), kn, int(idx[b][f1]))
            self.probation.extend(
                (int(i), int(st.mp_gen[i])) for i in ids
            )
            claimed[feats1] = True
            new_ids.append(ids)
        if new_ids:
            st.update_point_attributes(np.concatenate(new_ids), cfg.scale_factors)

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
        targets = list(first_ring)
        seen = set(first_ring)
        for k1 in first_ring:  # second ring (:408-419)
            row2 = covis[k1].copy()
            row2[~st.kf_valid] = 0
            row2[k1] = 0
            for k2 in np.argsort(-row2)[:5]:
                k2 = int(k2)
                if row2[k2] >= 15 and k2 != kf and k2 not in seen:
                    targets.append(k2)
                    seen.add(k2)
        targets = targets[:FUSE_TARGETS]
        if not targets:
            return
        T = FUSE_TARGETS
        sel = np.array((targets + [targets[0]] * T)[:T])
        n_act = len(targets)

        def point_rows(kfs):
            """Per-row query point data from each row's KF point slots."""
            q = st.kf_point[kfs]                       # (T, F)
            mpid = np.clip(q, 0, st.max_mp - 1)
            valid = (q >= 0) & st.mp_valid[mpid]
            return (q, st.mp_desc[mpid], st.mp_xyz[mpid],
                    st.mp_min_dist[mpid], st.mp_max_dist[mpid], valid)

        kf_row = np.full(T, kf)
        # direction 1: current KF's points into each target
        q1, d1, x1, mn1, mx1, v1 = point_rows(kf_row)
        v1[n_act:] = False
        m1_mask, m1_idx = self._run_fuse_batch(d1, x1, mn1, mx1, v1, sel)
        for i in range(n_act):
            self._merge_fuse(q1[i], int(sel[i]), m1_mask[i], m1_idx[i])
        # direction 2: each target's points into the current KF — queries
        # built AFTER direction 1's merges so replaced points query with
        # their merged descriptor/position (the reference interleaves
        # search and merge, SearchInNeighbors :421-470)
        q2, d2, x2, mn2, mx2, v2 = point_rows(sel)
        v2[n_act:] = False
        m2_mask, m2_idx = self._run_fuse_batch(d2, x2, mn2, mx2, v2, kf_row)
        for i in range(n_act):
            self._merge_fuse(q2[i], kf, m2_mask[i], m2_idx[i])
        # refresh attributes of the current KF's points
        pts = st.kf_point[kf]
        st.update_point_attributes(np.unique(pts[pts >= 0]), cfg.scale_factors)

    def _run_fuse_batch(self, q_desc, q_xyz, q_min, q_max, q_valid, dst_kfs):
        st, cfg = self.map, self.cfg
        m = _fuse_batch(
            q_desc, q_xyz, q_min, q_max, q_valid,
            st.kf_desc[dst_kfs], st.kf_xy[dst_kfs],
            st.kf_level[dst_kfs], st.kf_feat_valid[dst_kfs],
            st.kf_R[dst_kfs], st.kf_t[dst_kfs],
            cfg.K4, cfg.scale_factors,
        )
        return np.asarray(m.mask), np.asarray(m.idx)

    def _merge_fuse(self, q_ids, dst_kf: int, mask, idx):
        """Merge bookkeeping after a fuse search (ORBmatcher.cc:1083-1091).
        The batched searches all saw the pre-fuse map snapshot, so stale
        rows (point already replaced by an earlier merge) are re-checked."""
        st = self.map
        for f_src in np.nonzero(mask)[0]:
            mp = int(q_ids[f_src])
            if mp < 0 or not st.mp_valid[mp]:
                continue
            f_dst = int(idx[f_src])
            existing = int(st.kf_point[dst_kf, f_dst])
            if existing == mp:
                continue
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
        if len(pts) > cfg.local_ba_points:
            # keep the best-anchored points (most observations), not slot order
            nobs = (st.mp_obs_kf[pts] >= 0).sum(axis=1)
            pts = pts[np.argpartition(-nobs, cfg.local_ba_points - 1)[: cfg.local_ba_points]]
            pts.sort()
        # fixed KFs: other observers of local points (Optimizer.cc:328-345
        # includes ALL of them; at our fixed capacity keep the KFs anchoring
        # the MOST local observations, not the first ones encountered)
        obs_flat = st.mp_obs_kf[pts].ravel()
        obs_flat = obs_flat[obs_flat >= 0]
        counts = np.bincount(obs_flat, minlength=st.max_kf)
        for k in local:
            counts[k] = 0
        cand = np.nonzero(counts)[0]
        if len(cand) > cfg.local_ba_fixed:
            cand = cand[np.argpartition(-counts[cand], cfg.local_ba_fixed - 1)[
                : cfg.local_ba_fixed]]
        fixed = set(int(k) for k in cand)
        all_kfs = local + sorted(fixed)
        kf_index = {k: i for i, k in enumerate(all_kfs)}
        K = cfg.local_ba_kf + cfg.local_ba_fixed
        # ONE static point capacity: every local BA call hits the same
        # compiled program (shape bucketing would recompile the LM loop for
        # each map-size bucket — ~30 s apiece through the TPU compile path)
        P = cfg.local_ba_points

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
            kf_R=kf_R, kf_t=kf_t, kf_fixed=kf_fixed,
            points=points, point_valid=point_valid,
            obs_kf=obs_kf, obs_pt=obs_pt,
            obs_uv=obs_uv, obs_w=obs_w,
            obs_valid=obs_valid, K4=cfg.K4,
        )
        return prob, all_kfs, pts, obs_src

    def local_ba(self, kf: int):
        st = self.map
        prob, all_kfs, pts, obs_src = self.build_local_ba_problem(kf)
        if len(obs_src) < 20:
            return
        # the whole fixed-shape problem ships as ONE host->device transfer
        res = _two_stage_packed(*prob)
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
