"""Multi-chip distribution: map-partitioned bundle adjustment.

The reference is single-process with zero distributed backend (SURVEY.md
§2.3). The TPU-native scaling axis is MAP PARTITIONING (BASELINE.json
config 5): map points and their observations are sharded across devices,
each device Schur-reduces its own point blocks, and the reduced camera
system — whose size is only O(keyframes) — is combined with one psum over
ICI and solved replicated. Implemented with shard_map over a jax.sharding
Mesh; the same program runs on a virtual CPU mesh for tests and on real
TPU slices unchanged.
"""
from .sharded_ba import shard_ba_problem, sharded_bundle_adjust  # noqa: F401
from .sharded_pose_graph import (  # noqa: F401
    shard_essential_graph, sharded_optimize_essential_graph,
)
