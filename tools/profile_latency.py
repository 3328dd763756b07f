"""B=1 latency anatomy on the chip: tunnel round-trip floor, solver-only
tick, fused tick, serial vs parallel Riccati."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.configs import make_go2_kinodynamics
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

T = int(os.environ.get("T", 100))
REPS = int(os.environ.get("REPS", 30))

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
print(f"device: {dev}  T={T}", file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)
    problem = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, ocp.problem)
    xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None], (T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None],
                  (T, 1))

problem, xs, us = (jax.device_put(a, dev) for a in (problem, xs, us))


@jax.jit
def noop(x):
    return x + 1.0


def timeit(name, fn, *args):
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} p50={np.median(ts)*1e3:8.2f} ms  "
          f"min={np.min(ts)*1e3:8.2f} ms")


one = jax.device_put(jnp.ones(()), dev)
timeit("noop round trip", noop, one)

for tag, kw in [("serial bf16", dict(lin_dtype="bfloat16")),
                ("serial f32", dict()),
                ("parallel bf16", dict(lin_dtype="bfloat16", parallel=True)),
                ("alphas3 bf16", dict(lin_dtype="bfloat16",
                                      alphas=(0.0, 1.0, 0.5)))]:
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1, **kw))

    def run(problem, xs, us, s=solver):
        r = s.run(problem, xs, us)
        return r.prim_res

    try:
        timeit(f"solver B=1 tick ({tag})", run, problem, xs, us)
    except Exception as e:
        print(f"{tag} failed: {e!r}")
