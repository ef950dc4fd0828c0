from . import meters, metrics, validate

__all__ = ["meters", "metrics", "validate"]
