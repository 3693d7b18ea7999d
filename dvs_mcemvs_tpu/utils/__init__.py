"""Utilities: synthetic scene/event generation, logging helpers."""

from . import synthetic  # noqa: F401
