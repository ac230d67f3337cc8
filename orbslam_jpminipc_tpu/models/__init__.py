"""Flagship jitted step functions — the compile-check entry points."""
from .slam_step import tracking_step, example_tracking_args  # noqa: F401
