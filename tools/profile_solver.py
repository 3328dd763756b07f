"""Phase-level timing of one batched ProxDDP iteration on the real chip.

Times: stage linearization, terminal linearize, backward scan, line-search
trajectory evals, and the full fused run(), separately jitted, to find where
the per-iteration budget goes.
"""
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
REPS = int(os.environ.get("REPS", 5))

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)
    problem = ocp.problem
    problems = tile_problem(problem, B)
    xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None, None],
                  (B, T, 1))

solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
problems = jax.device_put(problems, dev)
xs = jax.device_put(xs, dev)
us = jax.device_put(us, dev)

mu = jnp.asarray(3e-4, jnp.float32)
lam_eq = jnp.zeros((B, T, ocp.n_eq), jnp.float32)
lam_in = jnp.zeros((B, T, ocp.n_in), jnp.float32)
lam_term = jnp.zeros((B, ocp.n_term_eq), jnp.float32)
lam_eq, lam_in, lam_term = map(lambda a: jax.device_put(a, dev),
                               (lam_eq, lam_in, lam_term))


def timeit(name, fn, *args):
    r = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, r)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), jax.tree_util.tree_leaves(r)[:1])
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} p50={np.median(ts)*1e3:9.2f} ms")
    return r


@jax.jit
def lin_only(problems, xs, us, lam_eq, lam_in):
    def one(problem, xs, us, le, li):
        if solver._use_soa:
            return solver._linearize_traj_soa(problem, xs, us, le, li, mu)
        sp = problem.stage_params
        return jax.vmap(
            lambda x, u, xn, p, a, b: solver._linearize_stage(x, u, xn, p, a, b, mu)
        )(xs[:-1], us, xs[1:], sp, le, li)
    return jax.vmap(one)(problems, xs, us, lam_eq, lam_in)


@jax.jit
def forward_only(problems, xs, us, lin, ks, Ks):
    alphas = jnp.asarray([0.0, 1.0, 0.5, 0.25, 0.1, 0.03, 0.01], xs.dtype)

    def one(problem, xs, us, lin, ks, Ks):
        dx0 = solver.space.difference(xs[0], problem.x0)
        return jax.vmap(
            lambda a: solver._candidate(xs, us, lin, ks, Ks, dx0, a))(alphas)
    return jax.vmap(one)(problems, xs, us, lin, ks, Ks)


@jax.jit
def eval_only(problems, xs, us, lam_eq, lam_in):
    def one(problem, xs, us, le, li):
        return solver._eval_traj(problem, xs, us, le, li, mu)
    return jax.vmap(one)(problems, xs, us, lam_eq, lam_in)


@jax.jit
def backward_only(lin):
    ndx = solver.space.ndx
    Vx = jnp.zeros((B, ndx), jnp.float32)
    Vxx = jnp.tile(jnp.eye(ndx, dtype=jnp.float32)[None], (B, 1, 1))
    reg = jnp.asarray(1e-6, jnp.float32)
    return jax.vmap(lambda l, vx, vxx: solver._backward(l, vx, vxx, reg))(lin, Vx, Vxx)


@jax.jit
def full_run(problems, xs, us, lams):
    return jax.vmap(lambda p, x, u, l: solver.run(p, x, u, l))(
        problems, xs, us, lams)


lin = timeit("linearize (B,T stages)", lin_only, problems, xs, us, lam_eq, lam_in)
timeit("eval_traj (1 alpha)", eval_only, problems, xs, us, lam_eq, lam_in)
bw = timeit("backward scan", backward_only, lin)
timeit("forward x7 alphas", forward_only, problems, xs, us, lin, bw[0], bw[1])
lams = (lam_eq, lam_in, lam_term)
timeit("full run (1 iter)", full_run, problems, xs, us, lams)
