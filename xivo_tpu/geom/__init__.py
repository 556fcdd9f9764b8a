from . import so3, se3
from .se3 import SE3

__all__ = ["so3", "se3", "SE3"]
