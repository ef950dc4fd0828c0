from . import focal_loss  # noqa: F401
from .focal_loss import sigmoid_focal_loss  # noqa: F401
