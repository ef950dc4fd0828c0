"""Minimal pure-torch stand-in for the torch_geometric API surface used by
/root/reference model code. See tests/refshim/README.md."""

from . import data, nn, transforms, utils  # noqa: F401

__version__ = "2.3.0-refshim"
