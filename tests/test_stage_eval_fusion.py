"""Fused stage_eval bundles must equal the composed split methods exactly
(kinodynamics + full dynamics overrides vs. the OCPHandler default)."""
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.ocp.base import OCPHandler, index_params
from tests.test_fulldynamics_solver import make_go2_full
from tests.test_kinodynamics_solver import make_go2_kino


def _check(ocp, x, u, p):
    fused = ocp.stage_eval(x, u, p)
    split = OCPHandler.stage_eval(ocp, x, u, p)
    for a, b, name in zip(fused, split, ["r", "w", "g", "h", "xnext"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12,
                                   err_msg=name)


def test_kinodynamics_fusion():
    ocp, mh, dh, x0 = make_go2_kino(T=3, force_cone=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.concatenate(
        [np.asarray(x0[: ocp.nq]), 0.1 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(rng.normal(size=ocp.nu))
    _check(ocp, x, u, index_params(ocp.problem.stage_params, 1))


def test_fulldynamics_fusion():
    ocp, mh, dh, x0 = make_go2_full(T=3)
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.concatenate(
        [np.asarray(x0[: ocp.nq]), 0.05 * rng.normal(size=ocp.nv)]))
    u = jnp.asarray(0.5 * rng.normal(size=ocp.nu))
    _check(ocp, x, u, index_params(ocp.problem.stage_params, 1))
