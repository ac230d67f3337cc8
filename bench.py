"""Benchmark: flagship per-frame tracking step on real TPU hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: tracked frames/s per chip for the fused tracking step
(frustum + MXU Hamming matching + 4-round pose optimization) at the
reference's working sizes (1000-feature frames, 4096-point local map).
Baseline: the reference's real-time claim of 30 fps tracking on a desktop
CPU (BASELINE.md; src/Tracking.cc:72-74 default camera rate).

Secondary metrics (stderr): ORB extraction latency, local-BA ms/iteration.
"""
import json
import sys
import time

import numpy as np


def time_it(fn, warmup=3, iters=20):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from orbslam_jpminipc_tpu.models.slam_step import (
        tracking_step, example_tracking_args,
    )

    args = example_tracking_args(n_map=4096, n_feat=1024)
    args = jax.device_put(args, dev)

    def step():
        out = tracking_step(*args)
        out[0].block_until_ready()

    dt = time_it(step)
    fps = 1.0 / dt
    print(f"tracking_step: {dt*1e3:.3f} ms -> {fps:.1f} fps", file=sys.stderr)

    # secondary: ORB extraction (full 8-level pyramid, 640x480)
    try:
        from orbslam_jpminipc_tpu.ops.extractor import extract

        rng = np.random.default_rng(0)
        img = jnp.array(rng.integers(0, 255, (480, 640)).astype(np.float32))
        img = jax.device_put(img, dev)

        def ex():
            f = extract(img, n_features=1000, n_levels=8)
            f.xy.block_until_ready()

        dt_ex = time_it(ex, warmup=2, iters=10)
        print(f"orb_extract: {dt_ex*1e3:.3f} ms", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"orb_extract failed: {e}", file=sys.stderr)

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

        def ba10():
            r = bundle_adjust(prob, iterations=10)
            r.kf_R.block_until_ready()

        dt_ba = time_it(ba10, warmup=2, iters=5)
        print(f"local_ba (24 KF / 4096 pts / 16k obs): {dt_ba*1e3/10:.3f} ms/iter", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"local_ba failed: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "tracking_step_fps_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
