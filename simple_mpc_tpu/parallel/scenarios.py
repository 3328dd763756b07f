"""Scenario data-parallelism — sharded batches of independent MPC solves.

The reference is single-process (SURVEY.md §2b: only OpenMP inside Aligator's
parallel LQ).  The TPU build's scale-out axis is *scenarios*: many
independent OCPs (different initial states / contact plans / references)
solved as one SPMD program over a `jax.sharding.Mesh`.  Per-scenario work is
embarrassingly parallel — cross-device traffic is limited to O(1) metric
reductions (`psum` of convergence scalars), so host scaling is linear by
construction (BASELINE.md north star).

Design: a "scenario batch" is the same `Problem` pytree with every leaf
gaining a leading batch axis, sharded `P('dp')` over the mesh.  The solver's
jitted `run` is vmapped; XLA partitions the batch dimension and compiles one
per-device program.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the scenario-batch axis.  Multi-host pods get
    their devices enumerated by jax.devices() — DCN/ICI routing is XLA's."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def tile_problem(problem, batch: int):
    """Replicate a Problem pytree to a leading (B, ...) scenario batch."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), problem
    )


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Place every leaf with its leading batch dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(place, tree)


class BatchedSolver:
    """Sharded scenario-batch front-end over a ProxDDPSolver.

    `run(problems, xs_b, us_b)` solves B independent problems in one SPMD
    program; convergence metrics are reduced with `psum`-backed jnp ops so
    the host reads O(1) scalars.
    """

    def __init__(self, solver, mesh: Optional[Mesh] = None, axis: str = "dp"):
        self.solver = solver
        self.mesh = mesh
        self.axis = axis

    @partial(jax.jit, static_argnums=(0,))
    def _run_batch(self, problems, xs_b, us_b, lams_b):
        return jax.vmap(
            lambda p, xs, us, lams: self.solver.run(p, xs, us, lams)
        )(problems, xs_b, us_b, lams_b)

    @partial(jax.jit, static_argnums=(0,))
    def _run_batch_cold(self, problems, xs_b, us_b):
        return jax.vmap(lambda p, xs, us: self.solver.run(p, xs, us))(
            problems, xs_b, us_b
        )

    def run(self, problems, xs_b, us_b, lams_b=None):
        if self.mesh is not None:
            problems = shard_batch(problems, self.mesh, self.axis)
            xs_b = shard_batch(xs_b, self.mesh, self.axis)
            us_b = shard_batch(us_b, self.mesh, self.axis)
            if lams_b is not None:
                lams_b = shard_batch(lams_b, self.mesh, self.axis)
        if lams_b is None:
            return self._run_batch_cold(problems, xs_b, us_b)
        return self._run_batch(problems, xs_b, us_b, lams_b)

    def summary(self, results):
        """O(1) cross-scenario reductions (the psum'd metrics)."""
        return dict(
            max_prim=jnp.max(results.prim_res),
            max_dual=jnp.max(results.dual_res),
            mean_merit=jnp.mean(results.merit),
        )
