"""Sub-phase timing of _linearize_traj_soa on the chip: q/v/u JVP blocks
and the Gauss-Newton einsums, all scalar-returning (no transfer bias)."""
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
print(f"device: {dev}  B={B} T={T}", file=sys.stderr)

with jax.default_device(cpu):
    ocp, mh, x0 = make_go2_kinodynamics(T)
    problems = tile_problem(ocp.problem, B)
    xs = jnp.tile(jnp.asarray(x0, jnp.float32)[None, None], (B, T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0), jnp.float32)[None, None],
                  (B, T, 1))

solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
problems, xs, us = (jax.device_put(a, dev) for a in (problems, xs, us))
mu = jnp.asarray(3e-4, jnp.float32)
lam_eq = jax.device_put(jnp.zeros((B, T, ocp.n_eq), jnp.float32), dev)
lam_in = jax.device_put(jnp.zeros((B, T, ocp.n_in), jnp.float32), dev)

space = solver.space
ndx, nu = space.ndx, ocp.nu
split = space.tangent_split
dtype = jnp.float32
P = jax.default_matmul_precision("float32")


def _parts(problem, xs, us, le, li):
    X, U, Xn = xs[:-1].T, us.T, xs[1:].T
    Pp = solver._transpose_params(problem.stage_params)
    LE, LI = le.T, li.T

    def bundle(dq, dv, du):
        Xp = space.integrate_parts_soa(X, dq, dv)
        r_all, w_all, _, _, xnext = solver._stage_bundle_soa(
            Xp, U + du, Pp, LE, LI, mu)
        d = space.difference_soa(Xn, xnext)
        return r_all, d, w_all

    zq = jnp.zeros((split, T), dtype)
    zv = jnp.zeros((ndx - split, T), dtype)
    zu = jnp.zeros((nu, T), dtype)

    def basis(n):
        return jnp.broadcast_to(jnp.eye(n, dtype=dtype)[..., None], (n, n, T))

    return bundle, zq, zv, zu, basis


def make_block(which):
    @jax.jit
    def f(problems, xs, us, lam_eq, lam_in):
        with P:
            def one(problem, xs, us, le, li):
                bundle, zq, zv, zu, basis = _parts(problem, xs, us, le, li)
                if which == "q":
                    (r0, d0, w0), lin = jax.linearize(
                        lambda a: bundle(a, zv, zu), zq)
                    Jr, Jd, _ = jax.vmap(lin)(basis(split))
                elif which == "v":
                    _, lin = jax.linearize(
                        lambda a: bundle(zq, a, zu)[:2], zv)
                    Jr, Jd = jax.vmap(lin)(basis(ndx - split))
                else:
                    _, lin = jax.linearize(
                        lambda a: bundle(zq, zv, a)[:2], zu)
                    Jr, Jd = jax.vmap(lin)(basis(nu))
                return jnp.sum(Jr) + jnp.sum(Jd)

            return jnp.sum(jax.vmap(one)(problems, xs, us, lam_eq, lam_in))
    return f


@jax.jit
def f_jvps_only(problems, xs, us, lam_eq, lam_in):
    with P:
        def one(problem, xs, us, le, li):
            bundle, zq, zv, zu, basis = _parts(problem, xs, us, le, li)
            (r0, d0, w0), lin_q = jax.linearize(lambda a: bundle(a, zv, zu), zq)
            _, lin_v = jax.linearize(lambda a: bundle(zq, a, zu)[:2], zv)
            _, lin_u = jax.linearize(lambda a: bundle(zq, zv, a)[:2], zu)
            Jr_q, Jd_q, _ = jax.vmap(lin_q)(basis(split))
            Jr_v, Jd_v = jax.vmap(lin_v)(basis(ndx - split))
            Jr_u, Jd_u = jax.vmap(lin_u)(basis(nu))
            return (jnp.sum(Jr_q) + jnp.sum(Jr_v) + jnp.sum(Jr_u)
                    + jnp.sum(Jd_q) + jnp.sum(Jd_v) + jnp.sum(Jd_u))

        return jnp.sum(jax.vmap(one)(problems, xs, us, lam_eq, lam_in))


@jax.jit
def f_full(problems, xs, us, lam_eq, lam_in):
    with P:
        lin = jax.vmap(lambda p, x, u, le, li: solver._linearize_traj_soa(
            p, x, u, le, li, mu))(problems, xs, us, lam_eq, lam_in)
        return sum(jnp.sum(v) for v in lin.values())


def timeit(name, fn):
    s = fn(problems, xs, us, lam_eq, lam_in); np.asarray(s)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(problems, xs, us, lam_eq, lam_in)
        np.asarray(s)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} p50={np.median(ts)*1e3:9.2f} ms")


timeit("jvp block q (18 dirs)", make_block("q"))
timeit("jvp block v (18 dirs)", make_block("v"))
timeit("jvp block u (24 dirs)", make_block("u"))
timeit("all jvps, no einsums", f_jvps_only)
timeit("full linearize", f_full)
