"""Pipeline stages: local mapping, loop closing, and the System orchestrator.

The reference runs Tracking / LocalMapping / LoopClosing as three
mutex-synchronized boost threads over one shared mutable map
(src/main.cc:165-218). Here the same stages are deterministic host
functions over the SoA map state, invoked by the System orchestrator —
tracking per frame, mapping per new keyframe, loop closing per keyframe —
with all heavy math in jitted fixed-shape kernels. The reference's
interrupt flags (mbAbortBA, RequestStop) become fixed iteration budgets
(SURVEY.md §2.3 P3).
"""
