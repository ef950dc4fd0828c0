from . import mesh, multihost

__all__ = ["mesh", "multihost"]
