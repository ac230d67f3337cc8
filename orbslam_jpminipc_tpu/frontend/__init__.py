"""Per-frame front-end: Frame construction and the tracking state machine."""
from .frame import Frame, build_frame  # noqa: F401
