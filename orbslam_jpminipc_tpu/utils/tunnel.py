"""Runtime calibration of the device link's completion-wait floor.

On a tunneled/remote TPU (and on any PJRT backend with polled
completions) a blocking wait on in-flight work has a latency floor that
varies with infrastructure conditions — measured anywhere from ~0.1 ms
to ~25+ ms on the same machine hours apart. Benchmarks and accuracy
artifacts record this floor so their wall-clock numbers are
interpretable across runs: an e2e fps figure taken at a 25 ms sync
floor is a different experiment from one taken at 0.1 ms.
"""
from __future__ import annotations

import time


def sync_floor_ms(reps: int = 10) -> float:
    """Median-ish cost of one dispatch + blocking completion wait on a
    trivial program, AFTER a device->host fetch has put the client into
    its steady (polled) regime — i.e. the floor the frame loop actually
    experiences mid-run."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(8, jnp.float32)
    f(x).block_until_ready()
    jax.device_get(f(x))  # enter the post-fetch regime
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return round(samples[len(samples) // 2] * 1e3, 3)
