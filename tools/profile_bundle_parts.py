"""Which part of the stage bundle dominates the JVP cost?  Times q+v JVP
blocks with pieces of the bundle ablated (scalar-returning)."""
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


def make_fn(mode):
    @jax.jit
    def f(problems, xs, us, lam_eq, lam_in):
        with P:
            def one(problem, xs, us, le, li):
                X, U, Xn = xs[:-1].T, us.T, xs[1:].T
                Pp = solver._transpose_params(problem.stage_params)
                LE, LI = le.T, li.T

                if mode == "bf16":
                    X16 = X.astype(jnp.bfloat16)
                    U16 = U.astype(jnp.bfloat16)
                    Xn16 = Xn.astype(jnp.bfloat16)
                    P16 = jax.tree_util.tree_map(
                        lambda a: a.astype(jnp.bfloat16)
                        if a.dtype == jnp.float32 else a, Pp)
                    LE16, LI16 = LE.astype(jnp.bfloat16), LI.astype(jnp.bfloat16)

                    def bundle(dq, dv, du):
                        Xp = space.integrate_parts_soa(
                            X16, dq.astype(jnp.bfloat16),
                            dv.astype(jnp.bfloat16))
                        r_all, w_all, _, _, xnext = solver._stage_bundle_soa(
                            Xp, U16 + du.astype(jnp.bfloat16), P16, LE16,
                            LI16, mu.astype(jnp.bfloat16))
                        d = space.difference_soa(Xn16, xnext)
                        return r_all, d

                    zq = jnp.zeros((split, T), dtype)
                    zv = jnp.zeros((ndx - split, T), dtype)
                    zu = jnp.zeros((nu, T), dtype)

                    def basis(n):
                        return jnp.broadcast_to(
                            jnp.eye(n, dtype=dtype)[..., None], (n, n, T))

                    _, lin_q = jax.linearize(lambda a: bundle(a, zv, zu), zq)
                    _, lin_v = jax.linearize(lambda a: bundle(zq, a, zu), zv)
                    oq = jax.vmap(lin_q)(basis(split))
                    ov = jax.vmap(lin_v)(basis(ndx - split))
                    return (sum(jnp.sum(x.astype(jnp.float32)) for x in oq)
                            + sum(jnp.sum(x.astype(jnp.float32)) for x in ov))

                def bundle(dq, dv, du):
                    Xp = space.integrate_parts_soa(X, dq, dv)
                    r_all, w_all, _, _, xnext = solver._stage_bundle_soa(
                        Xp, U + du, Pp, LE, LI, mu)
                    if mode == "nogap":
                        return (r_all,)
                    if mode == "gap_linear":
                        # first-order gap: skip the log/exp difference chain
                        d = (xnext - Xn)[: ndx]
                        return r_all, d
                    d = space.difference_soa(Xn, xnext)
                    return r_all, d

                zq = jnp.zeros((split, T), dtype)
                zv = jnp.zeros((ndx - split, T), dtype)
                zu = jnp.zeros((nu, T), dtype)

                def basis(n):
                    return jnp.broadcast_to(
                        jnp.eye(n, dtype=dtype)[..., None], (n, n, T))

                _, lin_q = jax.linearize(lambda a: bundle(a, zv, zu), zq)
                _, lin_v = jax.linearize(lambda a: bundle(zq, a, zu), zv)
                oq = jax.vmap(lin_q)(basis(split))
                ov = jax.vmap(lin_v)(basis(ndx - split))
                return (sum(jnp.sum(x) for x in oq)
                        + sum(jnp.sum(x) for x in ov))

            return jnp.sum(jax.vmap(one)(problems, xs, us, lam_eq, lam_in))
    return f


def timeit(name, fn):
    s = fn(problems, xs, us, lam_eq, lam_in); np.asarray(s)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = fn(problems, xs, us, lam_eq, lam_in)
        np.asarray(s)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} p50={np.median(ts)*1e3:9.2f} ms")


timeit("q+v jvps, full bundle", make_fn("full"))
timeit("q+v jvps, no gap", make_fn("nogap"))

timeit("q+v jvps, bf16 chain", make_fn("bf16"))
