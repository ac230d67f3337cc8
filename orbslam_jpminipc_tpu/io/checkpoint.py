"""World checkpoint/resume.

Replaces the fork's SaveLoadWorld subsystem (include/SaveLoadWorld.h, 2539
lines of hand-rolled binary records with 0xEB90 framing, id->pointer
re-linking and covisibility rebuild, loaded at src/main.cc:143 and saved at
:249). The SoA map design makes this trivial: the world IS a dict of dense
arrays, saved as one compressed npz; loading restores the arrays and the
tracker starts LOST so it relocalizes into the loaded map — the same
resume contract as the reference (src/main.cc:171-177).
"""
from __future__ import annotations

import json

import numpy as np

from ..map.map_state import MapState

_ARRAY_FIELDS = [
    "kf_R", "kf_t", "kf_valid", "kf_frame_id", "kf_timestamp", "kf_xy",
    "kf_level", "kf_angle", "kf_desc", "kf_feat_valid", "kf_point",
    "kf_parent", "mp_xyz", "mp_valid", "mp_desc", "mp_normal",
    "mp_min_dist", "mp_max_dist", "mp_ref_kf", "mp_first_kf", "mp_visible",
    "mp_found", "mp_obs_kf", "mp_obs_feat", "mp_gen",
]


def save_world(path: str, state: MapState, kfdb=None):
    """Serialize the entire world (and optionally the BoW database)."""
    payload = {f: getattr(state, f) for f in _ARRAY_FIELDS}
    payload["loop_edges"] = np.frombuffer(
        json.dumps([sorted(s) for s in state.kf_loop_edges]).encode(), np.uint8
    )
    payload["meta"] = np.array(
        [state.max_kf, state.max_mp, state.n_feat, state.max_obs,
         state.next_kf_id, state.next_mp_id],
        np.int64,
    )
    if kfdb is not None:
        payload["kfdb_bow_ids"] = kfdb.bow_ids
        payload["kfdb_bow_vals"] = kfdb.bow_vals
        payload["kfdb_bow_n"] = kfdb.bow_n
        payload["kfdb_present"] = kfdb.present
    np.savez_compressed(path, **payload)


def load_world(path: str, kfdb=None) -> MapState:
    """Reconstruct a MapState (and refill the BoW database if given)."""
    z = np.load(path, allow_pickle=False)
    max_kf, max_mp, n_feat, max_obs, next_kf, next_mp = (int(x) for x in z["meta"])
    state = MapState.create(max_kf, max_mp, n_feat, max_obs)
    for f in _ARRAY_FIELDS:
        getattr(state, f)[...] = z[f]
    state.next_kf_id = next_kf
    state.next_mp_id = next_mp
    edges = json.loads(bytes(z["loop_edges"]).decode())
    state.kf_loop_edges = [set(e) for e in edges]
    if kfdb is not None and "kfdb_bow" in z and "kfdb_bow_ids" not in z:
        # legacy dense-format checkpoint: rebuild sparse vectors from the
        # dense (MAX_KF, n_words) matrix instead of silently loading an
        # empty database (which would disable loop closure/relocalization)
        dense = z["kfdb_bow"]
        present = z.get("kfdb_present")
        S = kfdb.bow_ids.shape[1]
        for kf in range(min(dense.shape[0], kfdb.present.shape[0])):
            if present is not None and not present[kf]:
                continue
            ids = np.nonzero(dense[kf])[0]
            if len(ids) == 0:
                continue
            vals = dense[kf, ids].astype(np.float32)
            if len(ids) > S:
                # keep top-S by weight, ids re-sorted: the vectorized
                # database scan requires ascending word ids per row
                keep = np.sort(np.argsort(-vals)[:S])
                ids, vals = ids[keep], vals[keep]
            vals = vals / max(vals.sum(), 1e-12)
            kfdb.present[kf] = True
            kfdb.bow_n[kf] = len(ids)
            kfdb.bow_ids[kf, :len(ids)] = ids
            kfdb.bow_vals[kf, :len(ids)] = vals
    elif kfdb is not None and "kfdb_bow_ids" in z:
        saved = z["kfdb_bow_ids"]
        if saved.shape != kfdb.bow_ids.shape:
            raise ValueError(
                f"checkpoint BoW capacity {saved.shape} does not match the "
                f"database {kfdb.bow_ids.shape}; construct the "
                f"KeyFrameDatabase with matching max_kf/max_words_per_kf"
            )
        kfdb.bow_ids[...] = z["kfdb_bow_ids"]
        kfdb.bow_vals[...] = z["kfdb_bow_vals"]
        kfdb.bow_n[...] = z["kfdb_bow_n"]
        kfdb.present[...] = z["kfdb_present"]
    return state


def save_slam(path: str, slam):
    slam.mapper.drain_attrs()  # flush deferred attribute writebacks
    save_world(path, slam.map, slam.kfdb)


def load_slam(path: str, slam):
    """Load a world into an existing Slam instance and put the tracker in
    LOST so the next frame relocalizes into the loaded map (the reference's
    resume behavior, src/main.cc:171-177)."""
    from ..frontend.tracking import TrackState

    state = load_world(path, slam.kfdb)
    slam.map = state
    slam.tracker.map = state
    slam.mapper.map = state
    slam.mapper.dmap.sync_all(state)
    if slam.loop_closer is not None:
        slam.loop_closer.map = state
    slam.tracker.state = TrackState.LOST
    slam.tracker.velocity = None
    slam.tracker.last_frame = None
    if slam.tracker.fused is not None:
        slam.tracker.fused.invalidate()
    # drop split-stage work dispatched against the PRE-load map (mirrors
    # Slam.reset): a deferred merge drained after the load would apply
    # device results computed on the old map into the fresh one
    slam.mapper.probation = []
    slam.mapper._tri_pending = None
    slam.mapper._fuse_pending = None
    slam.mapper._ba_pending = None
    slam.mapper._ba_stage1 = None
    slam.mapper._ba2_pending = None
    slam.mapper._attrs_pending = []
    slam.mapper._attrs_inflight = None
    slam.pending = []
    # in-flight pipelined tracking records were dispatched against the
    # pre-load device state: drop them (the fused-epoch bump above marks
    # them stale, but a mid-run load must not reprocess pre-load frames
    # into the loaded map) and forget the pre-load completed result
    slam._inflight.clear()
    slam._last_result = (TrackState.LOST, None)
    return slam
