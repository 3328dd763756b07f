from .scenarios import BatchedSolver, make_mesh, shard_batch, tile_problem

__all__ = ["BatchedSolver", "make_mesh", "shard_batch", "tile_problem"]
