"""Accuracy evaluation harness — the per-round ATE record.

BASELINE.md's north star is ATE-RMSE parity with the TRO'15 numbers on TUM
sequences. No TUM data is downloadable in this environment, so the default
benchmark is the hard loop-bearing synthetic suite (known ground truth,
genuine covisibility break on the `loop` trajectory); pass `--tum <dir>` to
evaluate a real TUM RGB-D sequence directory when one is available.

Prints one JSON line per sequence:
  {"metric": "ate_rmse[_<seq>]", "value": N, "unit": "m",
   "extent_m": E, "ate_pct_extent": P, "frames_tracked": T, ...}

`ate_pct_extent` (ATE as % of trajectory extent) is the cross-dataset
yardstick: the TRO'15 fr1/xyz bound (~0.9 cm on a ~0.46 m-extent
trajectory) is ~2% of extent.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_sequence(seq, cfg, vocab, frames, gt_poses=None, verbose=True,
                 warmup=True):
    from orbslam_jpminipc_tpu.pipeline.system import Slam
    from orbslam_jpminipc_tpu.io.trajectory import ate_rmse

    slam = Slam(cfg, vocab=vocab)
    if warmup:
        # compile every program BEFORE the measured run (bench.py warms up
        # too): without this the fps column mixes XLA compile spikes into
        # the accuracy record and is useless for perf triage
        t_w = time.time()
        slam.warmup()
        if verbose:
            print(f"  warmup: {time.time()-t_w:.1f}s", file=sys.stderr)
    n = min(frames, len(seq))
    states = []
    t0 = time.time()
    for i in range(n):
        img, ts, _ = seq.get(i)
        state, _ = slam.process(img, ts)
        states.append((ts, state.name))
        if verbose and i % 40 == 0:
            print(f"  [{i}/{n}] {state.name} kfs={slam.n_keyframes} "
                  f"pts={slam.n_points} loops={slam.n_loops_closed}",
                  file=sys.stderr)
    wall = time.time() - t0
    slam.finish()  # drain tail mapping/loop stages (reference joins threads)

    result = {
        "frames": n,
        "frames_tracked": len(slam.trajectory),
        "keyframes": slam.n_keyframes,
        "points": slam.n_points,
        "loops_closed": slam.n_loops_closed,
        "fps": round(n / wall, 2),
    }
    if gt_poses is not None:
        est_c, gt_c = [], []
        for ts, R, t in slam.trajectory:
            key = round(ts, 6)
            if key in gt_poses:
                Rg, tg = gt_poses[key]
                gt_c.append(-Rg.T @ tg)
                est_c.append(-R.T @ t)
        if len(est_c) > 10:
            gt_c = np.stack(gt_c)
            est_c = np.stack(est_c)
            extent = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
            ate = ate_rmse(est_c, gt_c)
            result.update(
                ate_rmse=round(ate, 4),
                extent_m=round(extent, 3),
                ate_pct_extent=round(100.0 * ate / max(extent, 1e-9), 2),
            )
        # keyframe-trajectory ATE (the reference dumps keyframes only,
        # main.cc:226-245, and TRO'15 evaluates that trajectory)
        kf_est, kf_gt = [], []
        for ts, R, t in slam.keyframe_trajectory():
            key = round(ts, 6)
            if key in gt_poses:
                Rg, tg = gt_poses[key]
                kf_gt.append(-Rg.T @ tg)
                kf_est.append(-R.T @ t)
        if len(kf_est) > 3:
            result["kf_ate_rmse"] = round(
                ate_rmse(np.stack(kf_est), np.stack(kf_gt)), 4
            )
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    # the synthetic trajectories are phase-parameterized: more frames =
    # slower motion. 300/400 frames puts per-frame motion in the TUM fr1
    # regime (~1-2 cm/frame) that the BASELINE numbers refer to.
    ap.add_argument("--seqs", default="xyz:300,loop:400,orbit:300",
                    help="synthetic sequences as name:frames,...")
    ap.add_argument("--tum", default=None, help="TUM sequence directory")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="write the aggregate results JSON to this path")
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args(argv)

    from orbslam_jpminipc_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from orbslam_jpminipc_tpu.config import SlamConfig
    from orbslam_jpminipc_tpu.io.dataset import SyntheticSequence, TumDataset
    from orbslam_jpminipc_tpu.vocab.vocabulary import load_vocabulary
    import os

    voc_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "orbslam_jpminipc_tpu", "data", "vocab_tree64k.npz",
    )
    vocab = load_vocabulary(voc_path)

    if args.tum:
        cfg = SlamConfig(n_features=args.n_features)
        seq = TumDataset(args.tum)
        res = run_sequence(seq, cfg, vocab, args.frames, warmup=not args.no_warmup)
        print(json.dumps({"metric": "tum_run", **res}))
        return

    all_results = {}
    for spec in args.seqs.split(","):
        name, _, nf = spec.partition(":")
        n = int(nf) if nf else args.frames
        cfg = SlamConfig(
            fx=500.0, fy=500.0, cx=320.0, cy=240.0,
            k1=0.0, k2=0.0, p1=0.0, p2=0.0, n_features=args.n_features,
        )
        seq = SyntheticSequence(n_frames=n, trajectory=name, seed=args.seed)
        gt = {
            round(float(seq.timestamps[i]), 6): seq.poses[i]
            for i in range(len(seq))
        }
        res = run_sequence(seq, cfg, vocab, n, gt_poses=gt, warmup=not args.no_warmup)
        # headline = keyframe-trajectory ATE: the reference dumps keyframes
        # only (main.cc:226-245) and the TRO'15 numbers evaluate that
        print(json.dumps({"metric": f"kf_ate_rmse_{name}", "unit": "m",
                          "value": res.get("kf_ate_rmse", res.get("ate_rmse")),
                          **res}))
        all_results[name] = res
    # calibration: the device link's blocking-wait floor during this run
    # (varies ~0.1..25+ ms with tunnel conditions) — makes the fps column
    # interpretable across runs; see utils/tunnel.py
    from orbslam_jpminipc_tpu.utils.tunnel import sync_floor_ms

    all_results["tunnel_sync_floor_ms"] = sync_floor_ms()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(all_results, f, indent=1)


if __name__ == "__main__":
    main()
