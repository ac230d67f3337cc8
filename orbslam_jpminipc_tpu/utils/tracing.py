"""Per-stage tracing: structured timing + state logs.

Replaces the fork's hand-rolled per-thread text logs (fstrack ->
tmp/logTrack.txt, src/Tracking.cc:160-184; fslocalmap ->
src/LocalMapping.cc:46-59; fsloopclose -> src/LoopClosing.cc:55-71) with
one structured tracer: per-stage wall timings, counters, and an optional
JSONL stream — plus a hook into jax.profiler for device-level traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


MAX_SAMPLES = 65536  # bound per-stage sample memory for long sessions


class StageTracer:
    def __init__(self, jsonl_path: str | None = None):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.samples = defaultdict(list)  # per-stage ms samples (p50/p95)
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self.enabled = True

    @contextlib.contextmanager
    def stage(self, name: str, **fields):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            s = self.samples[name]
            if len(s) >= MAX_SAMPLES:
                # reservoir-style decimation: drop every other sample so the
                # list stays bounded over hours-long sessions while keeping
                # a uniform subsample for the percentiles
                del s[::2]
            s.append(dt * 1e3)
            if self._jsonl is not None:
                self._jsonl.write(
                    json.dumps({"stage": name, "ms": round(dt * 1e3, 3), **fields}) + "\n"
                )

    def reset(self):
        """Drop accumulated samples (e.g. between a compile-warmup segment
        and the measured run — the tracer is global, so warmup spikes would
        otherwise pollute the reported percentiles)."""
        self.totals.clear()
        self.counts.clear()
        self.samples.clear()

    def log(self, event: str, **fields):
        if self._jsonl is not None:
            self._jsonl.write(json.dumps({"event": event, **fields}) + "\n")
            self._jsonl.flush()

    def summary(self) -> dict:
        import numpy as np

        out = {}
        for name in sorted(self.totals):
            s = np.array(self.samples[name]) if self.samples[name] else np.zeros(1)
            out[name] = {
                "total_s": round(self.totals[name], 3),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 3),
                "p50_ms": round(float(np.percentile(s, 50)), 3),
                "p95_ms": round(float(np.percentile(s, 95)), 3),
            }
        return out

    @contextlib.contextmanager
    def device_trace(self, logdir: str):
        """Wrap a region in a jax.profiler trace (TensorBoard-compatible)."""
        import jax

        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


_tracer = StageTracer()


def get_tracer() -> StageTracer:
    return _tracer
