"""Dataset input, trajectory output, evaluation, and checkpointing.

Replaces the reference's ROS I/O surface: image input topic
(src/Tracking.cc:166), the TUM-format keyframe trajectory dump
(src/main.cc:226-245), and the fork's SaveLoadWorld checkpoint subsystem
(include/SaveLoadWorld.h). ROS is replaced by direct dataset readers (TUM
directories and a synthetic renderer with exact ground truth, used by
tests and benchmarks since this environment has no dataset downloads).
"""
