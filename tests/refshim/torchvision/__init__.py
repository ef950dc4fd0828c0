"""Minimal torchvision shim: only ops.focal_loss (see refshim/README.md)."""

from . import ops  # noqa: F401
