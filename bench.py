"""Benchmark: flagship per-frame SLAM pipeline on real TPU hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: end-to-end tracked frames/s per chip for the FULL per-frame
pipeline — 8-level ORB pyramid extraction (1000 features) + the fused
tracking step (frustum cull + MXU Hamming matching + 4-round pose
optimization, 4096-point local map) — measured in streaming mode: each
frame's predicted pose is the previous frame's optimized pose (a true
sequential dependency chain on device), host blocks once at the end.
Baseline: the reference's real-time claim of 30 fps tracking on a desktop
CPU (BASELINE.md; src/Tracking.cc:72-74 default camera rate).

Secondary metrics (stderr): ORB extraction latency, tracking-step latency,
local-BA ms/iteration.
"""
import json
import sys
import time

import numpy as np


def stream_time(fn, n=30, reps=4, warmup=2):
    """Best-of-reps amortized ms/call: dispatch n dependent/independent calls,
    block once at the end (steady-state streaming throughput)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from orbslam_jpminipc_tpu.models.slam_step import (
        tracking_step, example_tracking_args,
    )
    from orbslam_jpminipc_tpu.ops.extractor import extract

    args = example_tracking_args(n_map=4096, n_feat=1024)
    args = jax.device_put(args, dev)
    (R0, t0, map_xyz, map_desc, map_normal, map_min, map_max, map_valid,
     _fxy, _fd, _fl, _fv, inv_sigma2, scale_factors, K4, bounds) = args

    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.array(rng.integers(0, 255, (480, 640)).astype(np.float32)), dev
    )

    n_feat = 1024

    def pad_to(x, n):
        pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    # --- full frame pipeline, chained on the optimized pose ---
    state = {"R": R0, "t": t0}

    def frame():
        f = extract(img, n_features=1000, n_levels=8)
        out = tracking_step(
            state["R"], state["t"],
            map_xyz, map_desc, map_normal, map_min, map_max, map_valid,
            pad_to(f.xy, n_feat), pad_to(f.desc, n_feat),
            pad_to(f.level, n_feat), pad_to(f.valid, n_feat),
            inv_sigma2, scale_factors, K4, bounds,
        )
        state["R"], state["t"] = out[0], out[1]
        return out

    dt = stream_time(frame, n=30)
    fps = 1000.0 / dt
    print(f"frame pipeline (extract+track): {dt:.3f} ms -> {fps:.1f} fps",
          file=sys.stderr)

    # secondary: ORB extraction alone
    dt_ex = stream_time(lambda: extract(img, n_features=1000, n_levels=8), n=20)
    print(f"orb_extract: {dt_ex:.3f} ms", file=sys.stderr)

    # secondary: fused tracking step alone
    dt_tr = stream_time(lambda: tracking_step(*args), n=30)
    print(f"tracking_step: {dt_tr:.3f} ms", file=sys.stderr)

    # secondary: local BA per-iteration cost (24 KFs, 4096 points, 16k obs)
    try:
        from orbslam_jpminipc_tpu.solvers.ba import BAProblem, bundle_adjust

        rng = np.random.default_rng(1)
        K, P, O = 24, 4096, 16384
        prob = BAProblem(
            kf_R=jnp.tile(jnp.eye(3)[None], (K, 1, 1)),
            kf_t=jnp.array(rng.normal(0, 0.1, (K, 3)).astype(np.float32)),
            kf_fixed=jnp.array([True] + [False] * (K - 1)),
            points=jnp.array(
                np.stack([rng.uniform(-2, 2, P), rng.uniform(-2, 2, P), rng.uniform(2, 6, P)], 1
                ).astype(np.float32)
            ),
            point_valid=jnp.ones(P, bool),
            obs_kf=jnp.array(rng.integers(0, K, O).astype(np.int32)),
            obs_pt=jnp.array(rng.integers(0, P, O).astype(np.int32)),
            obs_uv=jnp.array(rng.uniform(0, 640, (O, 2)).astype(np.float32)),
            obs_w=jnp.ones(O, jnp.float32),
            obs_valid=jnp.ones(O, bool),
            K4=jnp.array([500.0, 500.0, 320.0, 240.0], jnp.float32),
        )
        prob = jax.device_put(prob, dev)
        dt_ba = stream_time(lambda: bundle_adjust(prob, iterations=10), n=5)
        print(f"local_ba (24 KF / 4096 pts / 16k obs): {dt_ba/10:.3f} ms/iter",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"local_ba failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "frame_pipeline_fps_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
