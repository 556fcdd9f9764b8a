from .ba import make_distributed_solver, shard_problem
from .retrieval import make_sharded_matcher

__all__ = ["make_distributed_solver", "shard_problem",
           "make_sharded_matcher"]
