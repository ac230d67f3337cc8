"""Geometry core: Lie groups (SO3/SE3/Sim3), camera model, triangulation.

Pure jax.numpy, fully batched; every function works under vmap/jit. This layer
replaces the reference's Eigen/g2o group types (se3quat.h, sim3/sim3.h) and the
OpenCV projection helpers — redesigned as functional array ops rather than
classes with mutable state.
"""
from . import se3, sim3, camera, triangulate, epipolar  # noqa: F401
