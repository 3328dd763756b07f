"""SoA articulated dynamics (ops/soa_dyn.py) + FullDynamicsOCP fast path.

The trailing-batch mass matrix / bias / constrained-KKT kernels must agree
with the per-sample oracles in ops/dynamics.py, and stage_eval_soa must be
the exact twin of vmap(stage_eval), so the solver's SoA path is available
for the heaviest formulation (VERDICT r2 missing item #2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.configs import (go2_fulldynamics_config, go2_handler,
                                    talos_handler)
from simple_mpc_tpu.ocp.fulldynamics import FullDynamicsOCP
from simple_mpc_tpu.ops import dynamics as dyn
from simple_mpc_tpu.ops import soa, soa_dyn
from simple_mpc_tpu.solver.proxddp import ProxDDPSolver, SolverSettings


def _rand_states(model, n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, model.nq)) * 0.3
    quat = rng.normal(size=(n, 4))
    q[:, 3:7] = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
    v = rng.normal(size=(n, model.nv))
    return jnp.asarray(q), jnp.asarray(v)


@pytest.fixture(scope="module", params=["go2", "talos"])
def setup(request):
    mh = go2_handler() if request.param == "go2" else talos_handler()
    q, v = _rand_states(mh.model, 4, seed=hash(request.param) % 2**31)
    return request.param, mh, q, v


def test_crba_nle_soa(setup):
    _, mh, q, v = setup
    model = mh.model
    qT, vT = q.T, v.T
    oR, op = soa.fk_world(model, qT)
    Sw = soa.world_axes(model, oR, op)
    vW = soa.body_velocities(model, Sw, vT)
    M = soa_dyn.crba_world(model, oR, op, Sw)
    b = soa_dyn.nle_world(model, oR, op, Sw, vW, vT)
    M0 = jax.vmap(lambda qq: dyn.crba(model, qq))(q)
    b0 = jax.vmap(lambda qq, vv: dyn.nle(model, qq, vv))(q, v)
    np.testing.assert_allclose(np.moveaxis(np.asarray(M), -1, 0),
                               np.asarray(M0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(b.T), np.asarray(b0), atol=1e-8)


def test_solve_spd_unrolled(setup):
    rng = np.random.default_rng(3)
    n, N = 11, 7
    A = rng.normal(size=(N, n, n))
    A = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
    b = rng.normal(size=(N, n))
    x = soa_dyn.solve_spd(jnp.asarray(np.moveaxis(A, 0, -1)),
                          jnp.asarray(b.T))
    x0 = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x.T), x0, atol=1e-9)


@pytest.mark.parametrize("gains", ["scalar", "vector"])
def test_constrained_dynamics_soa(setup, gains):
    name, mh, q, v = setup
    model = mh.model
    dim = 3 if name == "go2" else 6
    fids = list(mh.feet_frame_ids)
    nk = len(fids)
    n = q.shape[0]
    rng = np.random.default_rng(11)
    tau = jnp.asarray(rng.normal(size=(n, model.nv)) * 5.0)
    active = jnp.asarray((rng.random((n, nk)) > 0.3).astype(np.float64))
    ref_R = jnp.broadcast_to(jnp.eye(3), (n, nk, 3, 3))
    ref_p = jnp.asarray(rng.normal(size=(n, nk, 3)) * 0.1)
    if gains == "scalar":
        kp, kd = 10.0, 2.0
    else:
        # non-uniform per-dimension Baumgarte gains (fulldynamics.cpp:58-74
        # installs VECTOR corrector gains on every RigidConstraintModel)
        kp = np.linspace(5.0, 30.0, dim)
        kd = np.linspace(0.5, 4.0, dim)

    ddq0, f0 = jax.vmap(
        lambda qq, vv, tt, aa, rr, pp: dyn.constrained_fwd_dynamics(
            model, qq, vv, tt, fids, aa, contact_dim=dim,
            contact_ref_R=rr, contact_ref_p=pp, kp=kp, kd=kd)
    )(q, v, tau, active, ref_R, ref_p)

    ddq1, f1 = soa_dyn.constrained_fwd_dynamics_soa(
        model, q.T, v.T, tau.T, fids, active.T, dim=dim,
        ref_R=jnp.moveaxis(ref_R, 0, -1), ref_p=jnp.moveaxis(ref_p, 0, -1),
        kp=kp, kd=kd)
    np.testing.assert_allclose(np.asarray(ddq1.T), np.asarray(ddq0),
                               atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(f1), -1, 0),
                               np.asarray(f0), atol=1e-6)

    if gains == "vector":
        # KKT identity oracle: on active rows the solution must satisfy
        # Jc ddq + Jdot v + Kd_row (Jc v) + Kp_row err = -prox f, with the
        # per-row gains built INDEPENDENTLY here — pins that each dimension
        # gets ITS gain (a mean-collapsed scalar fails this for non-uniform
        # vectors).
        from simple_mpc_tpu.ops import kinematics as kin
        from simple_mpc_tpu.ops import lie
        from simple_mpc_tpu.ops.state import integrate

        kp_rows = np.tile(np.asarray(kp), nk)
        kd_rows = np.tile(np.asarray(kd), nk)
        prox = max(1e-9, 50.0 * float(jnp.finfo(q.dtype).eps))
        i = 0
        ref = "local" if dim == 3 else "local_world_aligned"
        qq, vv = q[i], v[i]
        Jc, JdotV = jax.jvp(
            lambda t: kin.feet_jacobians(
                model, integrate(model, qq, t * vv), fids, ref)[:, :dim, :],
            (jnp.zeros(()),), (jnp.ones(()),))
        Jc = np.asarray(Jc).reshape(nk * dim, model.nv)
        jdot_v = (np.asarray(JdotV).reshape(nk * dim, model.nv) @
                  np.asarray(vv))
        oR, op = kin.fk(model, qq)
        fR, fp = kin.frame_placements(model, oR, op)
        errs = []
        for k, fid in enumerate(fids):
            if dim == 3:
                errs.append(np.asarray(fR[fid]).T @ np.asarray(
                    fp[fid] - ref_p[i, k]))
            else:
                Rr = np.asarray(ref_R[i, k])
                e6 = np.asarray(lie.log6((
                    jnp.asarray(Rr.T) @ fR[fid],
                    jnp.asarray(Rr.T) @ (fp[fid] - ref_p[i, k]))))
                errs.append(np.concatenate([Rr @ e6[:3], Rr @ e6[3:]]))
        err = np.concatenate(errs)
        lhs = (Jc @ np.asarray(ddq0[i]) + jdot_v
               + kd_rows * (Jc @ np.asarray(vv)) + kp_rows * err)
        rhs = -prox * np.asarray(f0[i]).reshape(-1)
        m_rows = np.repeat(np.asarray(active[i]), dim)
        np.testing.assert_allclose(lhs * m_rows, rhs * m_rows, atol=1e-6)


def _make_ocp(name, mh, land=False):
    cfg = go2_fulldynamics_config(mh) if name == "go2" else None
    if name == "talos":
        model = mh.model
        nv = model.nv
        cfg = dict(
            timestep=0.01, w_x=np.ones(2 * nv) * 0.1,
            w_u=np.ones(nv - 6) * 1e-4,
            w_cent=np.concatenate([np.zeros(3), 0.1 * np.ones(3)]),
            w_forces=np.ones(6) * 1e-4, w_frame=np.ones(6) * 1000.0,
            gravity=np.array([0, 0, -9.81]), force_size=6,
            Kp_correction=np.zeros(6), Kd_correction=np.zeros(6),
            umin=-model.effort_limit[6:], umax=model.effort_limit[6:],
            qmin=model.lower_limit[7:], qmax=model.upper_limit[7:],
            mu=0.8, Lfoot=0.1, Wfoot=0.075,
            torque_limits=True, kinematics_limits=True, force_cone=True,
        )
    cfg["land_cstr"] = land
    ocp = FullDynamicsOCP(cfg, mh)
    x0 = jnp.asarray(mh.reference_state)
    T = 6
    ocp.create_problem(x0, T, ocp.fs, -9.81, True)
    return ocp, x0, T


@pytest.mark.parametrize("land", [False, True])
def test_stage_eval_soa_matches(setup, land):
    name, mh, q, v = setup
    ocp, x0, T = _make_ocp(name, mh, land)
    sp = ocp.problem.stage_params
    rng = np.random.default_rng(7)
    pert = rng.normal(size=(T, x0.shape[0])) * 0.05
    pert[:, 3:7] = 0.0
    xs = x0[None] + jnp.asarray(pert)
    us = jnp.asarray(rng.normal(size=(T, ocp.nu)) * 1.0)
    # exercise the land flags
    if land:
        sp = sp._replace(land=sp.land.at[T // 2].set(1.0))

    r0, w0, g0, h0, xn0 = jax.vmap(lambda x, u, p: ocp.stage_eval(x, u, p))(
        xs, us, sp)
    P = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), sp)
    r1, w1, g1, h1, xn1 = ocp.stage_eval_soa(xs.T, us.T, P)
    np.testing.assert_allclose(np.asarray(r1.T), np.asarray(r0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g1.T), np.asarray(g0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(h1.T), np.asarray(h0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(xn1.T), np.asarray(xn0), atol=1e-7)


def test_ocp_vector_baumgarte_gains():
    """FullDynamicsOCP carries per-dimension Kp/Kd_correction vectors into
    BOTH dynamics kernels (no mean-collapse), and rejects wrong sizes like
    the reference (fulldynamics.cpp:41-48)."""
    from simple_mpc_tpu.configs import go2_fulldynamics_config

    mh = go2_handler()
    cfg = dict(go2_fulldynamics_config(mh))
    cfg["Kp_correction"] = np.array([10.0, 20.0, 40.0])
    cfg["Kd_correction"] = np.array([1.0, 2.0, 4.0])
    ocp, x0, T = None, jnp.asarray(mh.reference_state), 4
    ocp = FullDynamicsOCP(cfg, mh)
    ocp.create_problem(x0, T, ocp.fs, -9.81, True)
    np.testing.assert_allclose(np.asarray(ocp.kp), cfg["Kp_correction"])
    sp = ocp.problem.stage_params
    rng = np.random.default_rng(5)
    pert = rng.normal(size=(T, x0.shape[0])) * 0.05
    pert[:, 3:7] = 0.0
    xs = x0[None] + jnp.asarray(pert)
    us = jnp.asarray(rng.normal(size=(T, ocp.nu)))
    r0, w0, g0, h0, xn0 = jax.vmap(ocp.stage_eval)(xs, us, sp)
    P = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, 0, -1), sp)
    r1, w1, g1, h1, xn1 = ocp.stage_eval_soa(xs.T, us.T, P)
    np.testing.assert_allclose(np.asarray(r1.T), np.asarray(r0), atol=1e-7)
    np.testing.assert_allclose(np.asarray(xn1.T), np.asarray(xn0), atol=1e-7)

    cfg["Kp_correction"] = np.array([10.0, 20.0])  # wrong size
    with pytest.raises(ValueError, match="Kp correction"):
        FullDynamicsOCP(cfg, mh)


@pytest.mark.slow
def test_solver_soa_equivalence(setup):
    """The SoA trajectory path must reproduce the generic per-stage path
    through full ProxDDP iterations on the full-dynamics formulation."""
    name, mh, _, _ = setup
    ocp, x0, T = _make_ocp(name, mh)
    xs = jnp.tile(x0[None], (T + 1, 1))
    us = jnp.tile(jnp.asarray(ocp.get_reference_control(0))[None], (T, 1))

    s_ref = ProxDDPSolver(ocp, SolverSettings(max_iters=2, mu_init=1e-6,
                                              soa=False))
    s_soa = ProxDDPSolver(ocp, SolverSettings(max_iters=2, mu_init=1e-6,
                                              soa=True))
    assert s_soa._use_soa and not s_ref._use_soa
    r_ref = s_ref.run(ocp.problem, xs, us)
    r_soa = s_soa.run(ocp.problem, xs, us)
    np.testing.assert_allclose(np.asarray(r_soa.xs), np.asarray(r_ref.xs),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r_soa.us), np.asarray(r_ref.us),
                               atol=1e-7)
    np.testing.assert_allclose(float(r_soa.prim_res), float(r_ref.prim_res),
                               atol=1e-8)
