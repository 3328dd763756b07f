"""Compare serial-scan vs associative-scan Riccati backward on the chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.configs import make_go2_kinodynamics
from simple_mpc_tpu.parallel import tile_problem
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

B = int(os.environ.get("B", 128))
T = int(os.environ.get("T", 100))
REPS = int(os.environ.get("REPS", 10))

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)
    problems = tile_problem(ocp.problem, B)
    xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None, None],
                  (B, T, 1))

solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
solver_par = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1,
                                               parallel=True))
problems, xs, us = (jax.device_put(a, dev) for a in (problems, xs, us))
mu = jnp.asarray(3e-4, jnp.float32)
lam_eq = jax.device_put(jnp.zeros((B, T, ocp.n_eq), jnp.float32), dev)
lam_in = jax.device_put(jnp.zeros((B, T, ocp.n_in), jnp.float32), dev)
lam_term = jax.device_put(jnp.zeros((B, ocp.n_term_eq), jnp.float32), dev)


@jax.jit
def lin_fn(problems, xs, us, lam_eq, lam_in):
    return jax.vmap(lambda p, x, u, le, li: solver._linearize_traj_soa(
        p, x, u, le, li, mu))(problems, xs, us, lam_eq, lam_in)


def make_backward(s):
    @jax.jit
    def bw(lin):
        ndx = s.space.ndx
        Vx = jnp.zeros((B, ndx), jnp.float32)
        Vxx = jnp.tile(jnp.eye(ndx, dtype=jnp.float32)[None], (B, 1, 1))
        reg = jnp.asarray(1e-6, jnp.float32)
        with jax.default_matmul_precision("float32"):
            return jax.vmap(lambda l, vx, vxx: s._backward(l, vx, vxx, reg)
                            )(lin, Vx, Vxx)
    return bw


def timeit(name, fn, *args):
    r = fn(*args)
    np.asarray(r[0])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(r[0][:, :2])  # tiny sync transfer
        ts.append(time.perf_counter() - t0)
    print(f"{name:26s} p50={np.median(ts)*1e3:9.2f} ms")
    return r


lin = lin_fn(problems, xs, us, lam_eq, lam_in)
lin = jax.tree_util.tree_map(lambda a: a.block_until_ready(), lin)
r_s = timeit("backward serial", make_backward(solver), lin)
r_p = timeit("backward parallel", make_backward(solver_par), lin)
ks_err = float(jnp.max(jnp.abs(r_s[0] - r_p[0])))
Ks_err = float(jnp.max(jnp.abs(r_s[1] - r_p[1])))
print(f"ks err {ks_err:.3e}  Ks err {Ks_err:.3e}")
