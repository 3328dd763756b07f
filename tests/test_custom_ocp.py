"""Deriving a custom OCP formulation in Python.

The reference exposes `PyOCPHandler` so users can subclass `OCPHandler` from
Python and plug their own formulation into the MPC/solver machinery
(include/simple-mpc/python/py-ocp-handler.hpp:71-192).  Here the whole
framework is Python, so the parity check is: subclass
`simple_mpc_tpu.ocp.base.OCPHandler` with a formulation the library does not
ship (a 2D double integrator with a box on the control), build a problem
through the inherited `create_problem` plumbing-free path, and solve it with
the stock `ProxDDPSolver`.
"""
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.ocp import cones
from simple_mpc_tpu.ocp.base import OCPHandler, Problem, stack_params
from simple_mpc_tpu.ocp.spaces import VectorSpace
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


class DIStageParams(NamedTuple):
    x_ref: jnp.ndarray  # (4,)
    u_ref: jnp.ndarray  # (2,)


class DITermParams(NamedTuple):
    x_ref: jnp.ndarray


class DoubleIntegratorOCP(OCPHandler):
    """Point mass in the plane: x = [p, v], u = a; |u| <= u_max box."""

    def __init__(self, dt=0.1, u_max=2.0, w_x=1.0, w_u=1e-2):
        # no robot model needed: bypass OCPHandler.__init__'s handler plumbing
        self.settings = None
        self.model_handler = None
        self.problem = None
        self.dt = dt
        self.u_max = u_max
        self.w_x = w_x
        self.w_u = w_u
        self.space = VectorSpace(4)
        self.nu = 2
        self.n_eq = 0
        self.n_in = 4  # control box, two sides
        self.n_term_eq = 2  # terminal position equality

    def make_stage_params(self, x_ref, u_ref):
        return DIStageParams(x_ref=jnp.asarray(x_ref), u_ref=jnp.asarray(u_ref))

    def dynamics(self, x, u, p):
        p_, v = x[:2], x[2:]
        v_next = v + self.dt * u
        return jnp.concatenate([p_ + self.dt * v_next, v_next])

    def cost_residuals(self, x, u, p):
        r = jnp.concatenate([x - p.x_ref, u - p.u_ref])
        w = jnp.concatenate([jnp.full(4, self.w_x), jnp.full(2, self.w_u)])
        return r, w.astype(x.dtype)

    def eq_constraints(self, x, u, p):
        return jnp.zeros(0, x.dtype)

    def ineq_constraints(self, x, u, p):
        return cones.box(u, -self.u_max * jnp.ones(2), self.u_max * jnp.ones(2))

    def term_residuals(self, x, p):
        return x - p.x_ref, jnp.full(4, self.w_x, x.dtype)

    def term_eq_constraints(self, x, p):
        return x[:2] - p.x_ref[:2]

    def build(self, x0, x_goal, T):
        sp = stack_params([
            self.make_stage_params(x_goal, np.zeros(2)) for _ in range(T)
        ])
        self.problem = Problem(x0=jnp.asarray(x0), stage_params=sp,
                               term_params=DITermParams(x_ref=jnp.asarray(x_goal)))
        return self.problem


def test_custom_python_ocp_solves():
    ocp = DoubleIntegratorOCP()
    T = 20
    x0 = jnp.array([0.0, 0.0, 0.0, 0.0])
    goal = jnp.array([1.0, -0.5, 0.0, 0.0])
    problem = ocp.build(x0, goal, T)
    solver = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=40))
    xs = jnp.tile(x0[None], (T + 1, 1))
    us = jnp.zeros((T, 2))
    res = solver.run(problem, xs, us)
    # terminal equality drives the position to the goal
    np.testing.assert_allclose(np.asarray(res.xs[-1][:2]),
                               np.asarray(goal[:2]), atol=1e-3)
    # dynamics gaps closed
    assert float(res.prim_res) < 1e-4
    # control box respected (inequality residuals <= tol)
    h = np.asarray(
        jnp.stack([ocp.ineq_constraints(x, u, None)
                   for x, u in zip(res.xs[:-1], res.us)]))
    assert h.max() < 1e-5


def test_custom_ocp_warm_start_one_iteration():
    """Reference usage pattern (mpc.cpp:84-91): one full converged solve at
    construction, then warm-started 1-iteration re-solves track a perturbed
    initial state without losing feasibility."""
    ocp = DoubleIntegratorOCP()
    T = 10
    x0 = jnp.zeros(4)
    goal = jnp.array([0.3, 0.2, 0.0, 0.0])
    problem = ocp.build(x0, goal, T)
    full = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=60))
    xs = jnp.tile(x0[None], (T + 1, 1))
    us = jnp.zeros((T, 2))
    res = full.run(problem, xs, us)
    assert float(res.prim_res) < 1e-4  # construction solve converged

    tick = ProxDDPSolver(ocp, SolverSettings(mu_init=1e-6, max_iters=1))
    import dataclasses as dc

    for i in range(10):
        # small measured-state perturbation, like a real receding tick
        x_meas = res.xs[0] + 1e-3 * jnp.sin(jnp.arange(4.0) + i)
        problem = dc.replace(problem, x0=x_meas)
        lams = (res.lam_eq, res.lam_in, res.lam_term)
        res = tick.run(problem, res.xs, res.us, lams, mu=res.mu)
        assert float(res.prim_res) < 5e-3  # stays feasible tick-to-tick
    np.testing.assert_allclose(np.asarray(res.xs[-1][:2]),
                               np.asarray(goal[:2]), atol=5e-3)
