"""On-device phase timing: every phase jitted to return ONLY scalars, so
host transfer over the tunneled backend never contaminates the numbers."""
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
ALPHAS = os.environ.get("ALPHAS")

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]
print(f"device: {dev}  B={B} T={T}", file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)
    problems = tile_problem(ocp.problem, B)
    xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None, None],
                  (B, T, 1))

kw = {}
if ALPHAS:
    kw["alphas"] = tuple(float(a) for a in ALPHAS.split(","))
if os.environ.get("LIN_DTYPE"):  # e.g. LIN_DTYPE=bfloat16 = the benched config
    kw["lin_dtype"] = os.environ["LIN_DTYPE"]
solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1, **kw))
problems, xs, us = (jax.device_put(a, dev) for a in (problems, xs, us))
mu = jnp.asarray(3e-4, jnp.float32)
lam_eq = jax.device_put(jnp.zeros((B, T, ocp.n_eq), jnp.float32), dev)
lam_in = jax.device_put(jnp.zeros((B, T, ocp.n_in), jnp.float32), dev)
lam_term = jax.device_put(jnp.zeros((B, ocp.n_term_eq), jnp.float32), dev)

P = jax.default_matmul_precision("float32")


@jax.jit
def f_lin(problems, xs, us, lam_eq, lam_in):
    with P:
        lin = jax.vmap(lambda p, x, u, le, li: solver._linearize_traj_soa(
            p, x, u, le, li, mu))(problems, xs, us, lam_eq, lam_in)
        return sum(jnp.sum(v) for v in lin.values())


@jax.jit
def f_lin_bwd(problems, xs, us, lam_eq, lam_in, lam_term):
    with P:
        lin = jax.vmap(lambda p, x, u, le, li: solver._linearize_traj_soa(
            p, x, u, le, li, mu))(problems, xs, us, lam_eq, lam_in)
        VxT, VxxT = jax.vmap(lambda x, p, lt: solver._linearize_term(
            x, p, lt, mu))(xs[:, -1], problems.term_params, lam_term)
        ks, Ks, dual = jax.vmap(lambda l, a, b: solver._backward(
            l, a, b, jnp.asarray(1e-6, jnp.float32)))(lin, VxT, VxxT)
        return jnp.sum(ks) + jnp.sum(Ks) + jnp.sum(dual)


@jax.jit
def f_eval1(problems, xs, us, lam_eq, lam_in):
    with P:
        c, g, h, gap = jax.vmap(lambda p, x, u, le, li: solver._eval_traj(
            p, x, u, le, li, mu))(problems, xs, us, lam_eq, lam_in)
        return jnp.sum(c) + jnp.sum(g) + jnp.sum(h) + jnp.sum(gap)


@jax.jit
def f_full(problems, xs, us, lams):
    r = solver.run(problems, xs, us, lams)
    return r.prim_res.sum() + r.dual_res.sum() + jnp.sum(r.us)


run_v = jax.jit(jax.vmap(lambda p, x, u, le, li, lt: solver._run_impl(
    p, x, u, (le, li, lt), None, None)))


def timeit(name, fn, *args):
    s = fn(*args); np.asarray(s)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(*args)
        np.asarray(s)
        ts.append(time.perf_counter() - t0)
    print(f"{name:30s} p50={np.median(ts)*1e3:9.2f} ms")


timeit("linearize(SoA)", f_lin, problems, xs, us, lam_eq, lam_in)
timeit("lin+term+backward", f_lin_bwd, problems, xs, us, lam_eq, lam_in, lam_term)
timeit("eval_traj x1", f_eval1, problems, xs, us, lam_eq, lam_in)


@jax.jit
def f_full2(problems, xs, us, lam_eq, lam_in, lam_term):
    r = run_v(problems, xs, us, lam_eq, lam_in, lam_term)
    return r.prim_res.sum() + r.dual_res.sum() + jnp.sum(r.us)


timeit("full run (1 iter)", f_full2, problems, xs, us, lam_eq, lam_in, lam_term)
