"""The flagship per-frame model: the fused WORKING-path tracking program.

The early r01 prototype (`slam_step.py`, a single match/optimize pass) was
superseded by `frontend/fused_track.make_fused_step` — extraction + two
match/optimize passes + lax.cond recovery over the device-resident
local-map slice. That program is what `__graft_entry__.entry()` exports
and what bench.py measures; this module re-exports it as the model entry.
"""
from ..frontend.fused_track import (  # noqa: F401
    MAX_SLICE, FusedContext, FusedOut, make_fused_step, pack_slice,
)
