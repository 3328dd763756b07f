"""Interpolator + friction compensation — reference tests/interpolator.cpp
and tests/friction.cpp analogues (rung-1: vs. hand-computed formulas)."""
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.utils import FrictionCompensation, Interpolator
from simple_mpc_tpu.ops.state import difference as q_difference
from simple_mpc_tpu.ops.state import integrate as q_integrate


def test_interpolate_linear():
    """Manual linear interpolation + boundary clamp
    (tests/interpolator.cpp:22-80)."""
    m = robots.load_go2()
    interp = Interpolator(m)
    vs = np.stack([np.full(3, 0.0), np.full(3, 1.0), np.full(3, 3.0)])
    dt = 0.01
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_linear(0.005, dt, vs)), 0.5, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_linear(0.015, dt, vs)), 2.0, rtol=1e-12)
    # delay beyond the trajectory clamps to the last knot
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_linear(0.5, dt, vs)), 3.0, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_linear(0.0, dt, vs)), 0.0, atol=1e-12)


def test_interpolate_configuration_lie():
    """Lie interpolation matches integrate(q0, s*difference(q0,q1))
    (tests/interpolator.cpp:82-130)."""
    m = robots.load_go2()
    interp = Interpolator(m)
    q0 = m.reference_configurations["standing"].copy()
    q1 = q0.copy()
    q1[0] += 0.1
    q1[3:7] = [0.0, 0.0, np.sin(0.1), np.cos(0.1)]  # yawed base
    qs = np.stack([q0, q1])
    dt = 0.01
    got = np.asarray(interp.interpolate_configuration(0.004, dt, qs))
    dq = q_difference(m, jnp.asarray(q0), jnp.asarray(q1))
    want = np.asarray(q_integrate(m, jnp.asarray(q0), 0.4 * dq))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_interpolate_state():
    """q-part Lie, v-part linear (interpolator.cpp:26-48)."""
    m = robots.load_go2()
    interp = Interpolator(m)
    q0 = m.reference_configurations["standing"]
    x0 = np.concatenate([q0, np.zeros(m.nv)])
    x1 = np.concatenate([q0, np.ones(m.nv)])
    xs = np.stack([x0, x1])
    got = np.asarray(interp.interpolate_state(0.005, 0.01, xs))
    np.testing.assert_allclose(got[m.nq:], 0.5, rtol=1e-12)
    np.testing.assert_allclose(got[: m.nq], q0, atol=1e-10)


def test_interpolate_contacts():
    m = robots.load_go2()
    interp = Interpolator(m)
    cs = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_contacts(0.012, 0.01, cs)), [1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(interp.interpolate_contacts(0.9, 0.01, cs)), [0.0, 0.0])


def test_friction_compensation():
    """Element-wise dry+viscous formula (tests/friction.cpp:27-39)."""
    m = robots.load_go2()
    m.friction = np.linspace(0.1, 0.5, m.nv)
    m.damping = np.linspace(0.01, 0.05, m.nv)
    fc = FrictionCompensation(m, with_free_flyer=True)
    nu = m.nv - 6
    v = np.linspace(-1.0, 1.0, nu)
    tau = np.ones(nu)
    got = np.asarray(fc.compute_friction(v, tau))
    want = tau + m.damping[6:] * v + m.friction[6:] * np.sign(v)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # wrong sizes raise (friction-compensation.cpp:25-28)
    import pytest

    with pytest.raises(ValueError):
        fc.compute_friction(np.zeros(3), tau)
