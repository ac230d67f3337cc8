"""Utilities: stage tracing/timing and structured logging."""
from .tracing import StageTracer, get_tracer  # noqa: F401
