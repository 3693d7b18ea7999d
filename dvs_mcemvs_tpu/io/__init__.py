"""Dataset I/O: calibration registry, event readers, pose readers, writers."""

from . import calib, events, outputs, poses  # noqa: F401
