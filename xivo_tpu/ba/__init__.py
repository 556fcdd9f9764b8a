from .core import BAProblem, ba_iteration, solve

__all__ = ["BAProblem", "ba_iteration", "solve"]
