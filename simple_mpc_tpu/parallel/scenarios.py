"""Scenario data-parallelism — sharded batches of independent MPC solves.

The reference is single-process (SURVEY.md §2b: only OpenMP inside Aligator's
parallel LQ).  The TPU build's scale-out axis is *scenarios*: many
independent OCPs (different initial states / contact plans / references)
solved as one SPMD program over a `jax.sharding.Mesh`.  Per-scenario work is
embarrassingly parallel — cross-device traffic is limited to O(1) metric
reductions (in-graph `pmax`/`pmean` collectives riding ICI within a slice
and DCN across hosts), so host scaling is linear by construction
(BASELINE.md north star).

Design: a "scenario batch" is the same `Problem` pytree with every leaf
gaining a leading batch axis, sharded over the mesh's batch axes.  The
solver's jitted `run` is wrapped in `jax.shard_map`: each device vmaps over
its local shard, and the convergence summary is reduced IN-GRAPH with
collectives so the host reads O(1) replicated scalars — the NCCL/MPI-
equivalent layer the reference never had.

Multi-host launch: call `init_distributed()` on every host before any JAX
op (wires `jax.distributed.initialize`; coordinator address/process counts
come from the args or the standard env vars), then build the mesh with
`make_mesh()` / `make_host_mesh()` — `jax.devices()` then enumerates the
global device set and XLA routes the reduction over ICI within each slice
and DCN across hosts.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host (DCN) runtime.  Must run on every host
    before the first JAX operation.  With no arguments, JAX reads the
    cluster layout from the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    """1-D device mesh over the scenario-batch axis.  Multi-host pods get
    their devices enumerated by jax.devices() — DCN/ICI routing is XLA's."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_host_mesh(host_axis: str = "host", batch_axis: str = "dp") -> Mesh:
    """2-D ('host', 'dp') mesh: hosts major, per-host devices minor, so a
    scenario batch sharded over BOTH axes puts cross-host traffic on DCN
    only for the O(1) summary reduction (SURVEY.md §2b items 1-3)."""
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // n_proc
    arr = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(arr, (host_axis, batch_axis))


def tile_problem(problem, batch: int):
    """Replicate a Problem pytree to a leading (B, ...) scenario batch."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), problem
    )


def shard_batch(tree, mesh: Mesh, axes=None):
    """Place every leaf with its leading batch dim sharded over the mesh
    (over all mesh axes by default)."""
    axes = tuple(mesh.axis_names) if axes is None else axes
    sharding = NamedSharding(mesh, P(axes))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


class BatchedSolver:
    """Sharded scenario-batch front-end over a ProxDDPSolver.

    `run(problems, xs_b, us_b)` solves B independent problems in one SPMD
    program via `jax.shard_map`: each device vmaps the solver over its
    local shard.  `run_summarized` additionally reduces the convergence
    metrics IN-GRAPH (`lax.pmax`/`lax.pmean` over every mesh axis) so the
    host reads O(1) replicated scalars — cross-host communication is just
    this reduction, keeping host scaling linear.
    """

    def __init__(self, solver, mesh: Optional[Mesh] = None, axis: str = "dp"):
        self.solver = solver
        self.mesh = mesh
        # all mesh axes shard the scenario batch ('host' major, 'dp' minor)
        self.axes = tuple(mesh.axis_names) if mesh is not None else (axis,)

    # -- local (per-shard) computation ---------------------------------
    def _local_run(self, problems, xs_b, us_b, lams_b):
        if lams_b is None:
            return jax.vmap(
                lambda p, xs, us: self.solver.run(p, xs, us)
            )(problems, xs_b, us_b)
        return jax.vmap(
            lambda p, xs, us, lams: self.solver.run(p, xs, us, lams)
        )(problems, xs_b, us_b, lams_b)

    def _shard_specs(self, with_summary: bool):
        spec = P(self.axes)
        out_res = spec
        if with_summary:
            return spec, (out_res, P())
        return spec, out_res

    @partial(jax.jit, static_argnums=(0, 4))
    def _run_sharded(self, problems, xs_b, us_b, cold, lams_b):
        in_spec, out_spec = self._shard_specs(False)

        def body(problems, xs_b, us_b, lams_b):
            return self._local_run(problems, xs_b, us_b,
                                   None if cold else lams_b)

        lams_arg = (jax.tree_util.tree_map(jnp.zeros_like, (xs_b, xs_b, xs_b))
                    if lams_b is None else lams_b)
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(in_spec, in_spec, in_spec, in_spec),
            out_specs=out_spec, check_vma=False,
        )(problems, xs_b, us_b, lams_arg)

    @partial(jax.jit, static_argnums=(0, 4))
    def _run_summarized(self, problems, xs_b, us_b, cold, lams_b):
        in_spec, out_spec = self._shard_specs(True)

        def body(problems, xs_b, us_b, lams_b):
            res = self._local_run(problems, xs_b, us_b,
                                  None if cold else lams_b)
            # in-graph O(1) reductions over EVERY mesh axis (ICI + DCN)
            summary = dict(
                max_prim=jax.lax.pmax(jnp.max(res.prim_res), self.axes),
                max_dual=jax.lax.pmax(jnp.max(res.dual_res), self.axes),
                mean_merit=jax.lax.pmean(jnp.mean(res.merit), self.axes),
                any_diverged=jax.lax.pmax(
                    jnp.max(res.diverged.astype(jnp.int32)), self.axes),
            )
            return res, summary

        lams_arg = (jax.tree_util.tree_map(jnp.zeros_like, (xs_b, xs_b, xs_b))
                    if lams_b is None else lams_b)
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(in_spec, in_spec, in_spec, in_spec),
            out_specs=out_spec, check_vma=False,
        )(problems, xs_b, us_b, lams_arg)

    @partial(jax.jit, static_argnums=(0,))
    def _run_batch(self, problems, xs_b, us_b, lams_b):
        return self._local_run(problems, xs_b, us_b, lams_b)

    # Donated warm-loop variant: in the receding-horizon throughput loop the
    # previous call's xs/us/lams buffers are dead as soon as the new Results
    # exist, so XLA may write the outputs in place (fewer HBM allocations +
    # copies per tick).  The passed-in xs_b/us_b/lams_b are CONSUMED.
    @partial(jax.jit, static_argnums=(0,), donate_argnums=(2, 3, 4))
    def _run_batch_donated(self, problems, xs_b, us_b, lams_b):
        return self._local_run(problems, xs_b, us_b, lams_b)

    @partial(jax.jit, static_argnums=(0,))
    def _run_batch_cold(self, problems, xs_b, us_b):
        return self._local_run(problems, xs_b, us_b, None)

    def _place(self, problems, xs_b, us_b, lams_b):
        problems = shard_batch(problems, self.mesh, self.axes)
        xs_b = shard_batch(xs_b, self.mesh, self.axes)
        us_b = shard_batch(us_b, self.mesh, self.axes)
        if lams_b is not None:
            lams_b = shard_batch(lams_b, self.mesh, self.axes)
        return problems, xs_b, us_b, lams_b

    def run(self, problems, xs_b, us_b, lams_b=None):
        if self.mesh is None:
            if lams_b is None:
                return self._run_batch_cold(problems, xs_b, us_b)
            return self._run_batch(problems, xs_b, us_b, lams_b)
        problems, xs_b, us_b, lams_b = self._place(problems, xs_b, us_b, lams_b)
        return self._run_sharded(problems, xs_b, us_b, lams_b is None, lams_b)

    def run_donated(self, problems, xs_b, us_b, lams_b):
        """Warm-loop `run` that donates xs_b/us_b/lams_b to the outputs
        (they are invalid afterwards).  Use in tight receding-horizon loops
        where the previous iterate is discarded every call; requires warm
        lams and no mesh (the sharded path manages placement itself)."""
        if self.mesh is not None:
            return self.run(problems, xs_b, us_b, lams_b)
        return self._run_batch_donated(problems, xs_b, us_b, lams_b)

    def run_summarized(self, problems, xs_b, us_b, lams_b=None):
        """(results, summary) with the summary reduced by in-graph
        collectives (requires a mesh)."""
        if self.mesh is None:
            res = self.run(problems, xs_b, us_b, lams_b)
            return res, self.summary(res)
        problems, xs_b, us_b, lams_b = self._place(problems, xs_b, us_b, lams_b)
        return self._run_summarized(problems, xs_b, us_b, lams_b is None,
                                    lams_b)

    def summary(self, results):
        """Post-hoc reduction over gathered results (single-process
        convenience; the multi-host path is run_summarized's in-graph
        collectives)."""
        return dict(
            max_prim=jnp.max(results.prim_res),
            max_dual=jnp.max(results.dual_res),
            mean_merit=jnp.mean(results.merit),
            any_diverged=jnp.max(
                jnp.asarray(results.diverged).astype(jnp.int32)),
        )
