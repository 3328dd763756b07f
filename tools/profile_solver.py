"""Component-level timing of the ProxDDP iteration on the flagship config.

Times (on the real chip, batched): full run, linearize-only, backward-only,
line-search eval-only — to find where the 1-iteration solve time goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_platforms", "axon,cpu")
except Exception:
    pass
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timeit(fn, *a, n=5, label=""):
    r = fn(*a)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    sync(r)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:36s} {dt*1e3:9.2f} ms")
    return r


def main():
    B = int(os.environ.get("B", 128))
    T = int(os.environ.get("T", 100))
    from simple_mpc_tpu.configs import make_go2_kinodynamics
    from simple_mpc_tpu.parallel import tile_problem
    from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    with jax.default_device(cpu):
        ocp, mh, x0 = make_go2_kinodynamics(T)
        problem = ocp.problem
        problems = tile_problem(problem, B)
        xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
        us = jnp.tile(
            jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None, None],
            (B, T, 1))
    problems = jax.device_put(
        jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, problems), tpu)
    xs = jax.device_put(xs, tpu)
    us = jax.device_put(us, tpu)

    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
    mu = jnp.float32(3.5e-4)

    lam_eq = jnp.zeros((B, T, ocp.n_eq), jnp.float32)
    lam_in = jnp.zeros((B, T, ocp.n_in), jnp.float32)
    lam_term = jnp.zeros((B, ocp.n_term_eq), jnp.float32)

    print(f"B={B} T={T} ndx={ocp.space.ndx} nu={ocp.nu} "
          f"n_eq={ocp.n_eq} n_in={ocp.n_in}")

    @jax.jit
    def full(problems, xs, us):
        return jax.vmap(lambda p, x, u: solver.run(p, x, u))(problems, xs, us)

    @jax.jit
    def lin_only(problems, xs, us, lam_eq, lam_in):
        def one(problem, xs, us, le, li):
            with jax.default_matmul_precision("float32"):
                return jax.vmap(
                    lambda x, u, xn, p, e, i: solver._linearize_stage(
                        x, u, xn, p, e, i, mu)
                )(xs[:-1], us, xs[1:], problem.stage_params, le, li)
        return jax.vmap(one)(problems, xs, us, lam_eq, lam_in)

    @jax.jit
    def eval_only(problems, xs, us, lam_eq, lam_in):
        def one(problem, xs, us, le, li):
            with jax.default_matmul_precision("float32"):
                return solver._eval_traj(problem, xs, us, le, li, mu)
        return jax.vmap(one)(problems, xs, us, lam_eq, lam_in)

    lin = timeit(lin_only, problems, xs, us, lam_eq, lam_in, label="linearize (all stages)")
    timeit(eval_only, problems, xs, us, lam_eq, lam_in, label="eval_traj (1 alpha)")

    reg = jnp.float32(1e-5)
    Vx_T = jnp.zeros((B, ocp.space.ndx), jnp.float32)
    Vxx_T = jnp.tile(jnp.eye(ocp.space.ndx, dtype=jnp.float32)[None], (B, 1, 1))

    @jax.jit
    def backward_only(lin, Vx_T, Vxx_T):
        with jax.default_matmul_precision("float32"):
            return jax.vmap(lambda l, vx, vxx: solver._backward(l, vx, vxx, reg))(
                lin, Vx_T, Vxx_T)

    bw = timeit(backward_only, lin, Vx_T, Vxx_T, label="backward serial scan")

    from simple_mpc_tpu.solver.parallel_riccati import parallel_backward

    @jax.jit
    def backward_par(lin, Vx_T, Vxx_T):
        with jax.default_matmul_precision("float32"):
            return jax.vmap(lambda l, vx, vxx: parallel_backward(l, vx, vxx, reg))(
                lin, Vx_T, Vxx_T)

    timeit(backward_par, lin, Vx_T, Vxx_T, label="backward parallel scan")

    ks, Ks, _ = bw

    @jax.jit
    def rollout_only(xs, us, lin, ks, Ks):
        def one(xs, us, lin, ks, Ks):
            dx0 = jnp.zeros(ocp.space.ndx, jnp.float32)
            with jax.default_matmul_precision("float32"):
                return solver._candidate(xs, us, lin, ks, Ks, dx0, jnp.float32(1.0))
        return jax.vmap(one)(xs, us, lin, ks, Ks)

    timeit(rollout_only, xs, us, lin, ks, Ks, label="linear rollout (1 alpha)")
    timeit(full, problems, xs, us, label="FULL solver.run (1 iter)")


if __name__ == "__main__":
    main()
