from . import checkpoint, driver, optim, system

__all__ = ["checkpoint", "driver", "optim", "system"]
