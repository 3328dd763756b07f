from .scenarios import (BatchedSolver, init_distributed, make_host_mesh,
                        make_mesh, shard_batch, tile_problem)

__all__ = ["BatchedSolver", "init_distributed", "make_host_mesh",
           "make_mesh", "shard_batch", "tile_problem"]
