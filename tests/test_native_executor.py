"""Native 1 kHz executor (native/executor.cpp) vs the per-substep Python
path: identical ADMM math (one shared factorization is exact reuse since
K depends only on H, A, rho), torque recovery, friction compensation."""
import numpy as np
import pytest

from simple_mpc_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _random_qp(rng, n, m):
    Q = rng.normal(size=(n, n))
    H = Q @ Q.T + n * np.eye(n)
    A = rng.normal(size=(m, n))
    l = -rng.random(m) - 0.5
    u = rng.random(m) + 0.5
    # a couple of equality rows (the dynamics rows in the real problem)
    l[:2] = u[:2] = rng.normal(size=2) * 0.1
    return H, A, l, u


def test_executor_matches_sequential_solves():
    rng = np.random.default_rng(0)
    nv, nf = 10, 4
    n = nv + nf
    m = 12
    nu = nv - 6
    n_sub = 5
    H, A, l, u = _random_qp(rng, n, m)
    gs = rng.normal(size=(n_sub, n))
    ls = np.tile(l, (n_sub, 1))
    us = np.tile(u, (n_sub, 1))
    # slightly moving inequality bounds (rows 2+ only; eq rows structural)
    ls[:, 2:] += 0.01 * rng.normal(size=(n_sub, m - 2))
    us[:, 2:] += 0.01 * rng.normal(size=(n_sub, m - 2))
    M = np.eye(nv) + 0.1 * rng.normal(size=(nv, nv))
    M = 0.5 * (M + M.T) + nv * np.eye(nv)
    h = rng.normal(size=nv)
    JcT = rng.normal(size=(nv, nf))
    fd = np.abs(rng.normal(size=nu)) * 0.1
    fv = np.abs(rng.normal(size=nu)) * 0.05
    vjs = rng.normal(size=(n_sub, nu))

    taus, z, y = native.executor_run(
        H, A, gs, ls, us, M, h, JcT, nv, nu,
        fric_dry=fd, fric_visc=fv, vjs=vjs, iters=60)

    # oracle: thread warm starts through per-substep native solves
    z0 = np.zeros(n)
    y0 = np.zeros(m)
    for k in range(n_sub):
        z0, y0, _, _ = native.solve_qp_host(
            H, gs[k], A, ls[k], us[k], iters=60, z0=z0, y0=y0)
        tau = (M @ z0[:nv] + h - JcT @ z0[nv:])[6:]
        tau = tau + fv * vjs[k] + fd * np.sign(vjs[k])
        np.testing.assert_allclose(taus[k], tau, atol=1e-10)
    np.testing.assert_allclose(z, z0, atol=1e-12)
    np.testing.assert_allclose(y, y0, atol=1e-12)


def test_executor_id_roundtrip():
    """Drive the executor with a real ID-layer QP (Solo12 standing): the
    torques must match the Python path's solve at the same state."""
    import jax.numpy as jnp

    from simple_mpc_tpu.id.kinodynamics_id import IDSettings, KinodynamicsID
    from simple_mpc_tpu.models import robots
    from simple_mpc_tpu.models.handler import RobotModelHandler

    model = robots.load_solo12()
    mh = RobotModelHandler(model, "standing", "base_link")
    for f in ["FL_FOOT", "FR_FOOT", "HL_FOOT", "HR_FOOT"]:
        mh.add_point_foot(f, "base_link")
    idq = KinodynamicsID(mh, 1e-3, IDSettings(
        kp_base=1.0, kp_posture=1.0, kp_contact=10.0, w_base=1.0,
        w_posture=0.05, w_contact_motion=10.0, w_contact_force=1.0,
        qp_iters=60))
    x = np.asarray(mh.reference_state)
    q, v = x[: model.nq], x[model.nq:]
    H, g, A, l, u, M, h, JcT = (np.asarray(a) for a in idq._assemble_core(
        jnp.asarray(q), jnp.asarray(v), dict(idq._targets)))
    nu = model.nv - 6
    taus, z, y = native.executor_run(
        H, A, g[None], l[None], u[None], M, h, JcT, model.nv, nu, iters=60)
    z_ref, y_ref, _, _ = native.solve_qp_host(H, g, A, l, u, iters=60)
    tau_ref = (M @ z_ref[: model.nv] + h - JcT @ z_ref[model.nv:])[6:]
    np.testing.assert_allclose(taus[0], tau_ref, atol=1e-10)
