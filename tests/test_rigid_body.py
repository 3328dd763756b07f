"""Rigid-body kernel tests: MuJoCo oracle + independent-algorithm
cross-validation (SURVEY.md §4 rung 1: kernels vs recorded ground truth).

MuJoCo re-derives FK / CoM / mass matrix / inverse dynamics on the exact
same model (via the MJCF exporter), playing the role Pinocchio plays in the
reference's tests (tests/robot_handler.cpp:21-253).
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.mjcf import to_mjcf
from simple_mpc_tpu.ops import dynamics, kinematics, lie, state

RNG = np.random.default_rng(42)


def random_config(model, scale=0.5):
    q = model.neutral()
    q[:3] = RNG.normal(size=3)
    quat = RNG.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = RNG.normal(size=model.nq - 7) * scale
    return jnp.asarray(q)


def random_vel(model, scale=1.0):
    return jnp.asarray(RNG.normal(size=model.nv) * scale)


def mj_from(model):
    mj = mujoco.MjModel.from_xml_string(to_mjcf(model, ground=False))
    return mj, mujoco.MjData(mj)


def set_mj_state(mj, d, model, q, v=None):
    """Map our (q, v) to MuJoCo conventions.

    qpos free joint: [p(3), quat wxyz]; qvel free joint: [v_lin WORLD,
    omega LOCAL], hinge dofs identical.
    """
    q = np.asarray(q)
    d.qpos[:3] = q[:3]
    d.qpos[3:7] = [q[6], q[3], q[4], q[5]]  # xyzw -> wxyz
    d.qpos[7:] = q[7:]
    if v is not None:
        v = np.asarray(v)
        R = np.asarray(lie.quat_to_rotmat(jnp.asarray(q[3:7])))
        d.qvel[:3] = R @ v[:3]  # local linear -> world
        d.qvel[3:6] = v[3:6]  # angular stays local
        d.qvel[6:] = v[6:]
    mujoco.mj_forward(mj, d)


@pytest.mark.parametrize("name", ["go2", "talos"])
def test_fk_vs_mujoco(name):
    model = robots.load(name)
    mj, d = mj_from(model)
    for _ in range(3):
        q = random_config(model)
        set_mj_state(mj, d, model, q)
        oR, op = kinematics.fk(model, q)
        for j, jname in enumerate(model.joint_names):
            bid = mj.body(f"{jname}_body").id
            np.testing.assert_allclose(np.asarray(op[j]), d.xpos[bid], atol=1e-10,
                                       err_msg=f"{jname} position")
            np.testing.assert_allclose(np.asarray(oR[j]), d.xmat[bid].reshape(3, 3),
                                       atol=1e-10, err_msg=f"{jname} rotation")
        # frame placements (sites)
        fR, fp = kinematics.frame_placements(model, oR, op)
        for i, f in enumerate(model.frames):
            sid = mj.site(f.name).id
            np.testing.assert_allclose(np.asarray(fp[i]), d.site_xpos[sid], atol=1e-10)


@pytest.mark.parametrize("name", ["go2", "talos"])
def test_com_and_mass_vs_mujoco(name):
    model = robots.load(name)
    mj, d = mj_from(model)
    q = random_config(model)
    set_mj_state(mj, d, model, q)
    com = dynamics.center_of_mass(model, q)
    # mujoco subtree_com[root body] = com of whole robot
    root_bid = mj.body(f"{model.joint_names[0]}_body").id
    np.testing.assert_allclose(np.asarray(com), d.subtree_com[root_bid], atol=1e-9)
    assert abs(model.total_mass() - mj.body_subtreemass[root_bid]) < 1e-9


@pytest.mark.parametrize("name", ["go2", "talos"])
def test_mass_matrix_vs_mujoco_energy(name):
    """Kinetic energy is convention-invariant: v_mj^T M_mj v_mj must equal
    v^T M v under the documented velocity mapping."""
    model = robots.load(name)
    mj, d = mj_from(model)
    for _ in range(3):
        q, v = random_config(model), random_vel(model)
        set_mj_state(mj, d, model, q, v)
        M = np.asarray(dynamics.crba(model, q))
        np.testing.assert_allclose(M, M.T, atol=1e-10)
        Mmj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d, Mmj)
        e_mine = float(np.asarray(v) @ M @ np.asarray(v))
        e_mj = float(d.qvel @ Mmj @ d.qvel)
        np.testing.assert_allclose(e_mine, e_mj, rtol=1e-8)


@pytest.mark.parametrize("name", ["go2", "solo12", "talos"])
def test_aba_rnea_inverse_pair(name):
    """Independent-algorithm cross-check: rnea(q,v,aba(q,v,tau)) == tau."""
    model = robots.load(name)
    q, v = random_config(model), random_vel(model)
    tau = jnp.asarray(RNG.normal(size=model.nv))
    ddq = dynamics.aba(model, q, v, tau)
    tau2 = dynamics.rnea(model, q, v, ddq)
    np.testing.assert_allclose(np.asarray(tau2), np.asarray(tau), atol=1e-8)


@pytest.mark.parametrize("name", ["go2", "talos"])
def test_crba_rnea_consistency(name):
    """M(q) a == rnea(q,0,a) - rnea(q,0,0) (gravity/bias cancel)."""
    model = robots.load(name)
    q = random_config(model)
    a = jnp.asarray(RNG.normal(size=model.nv))
    M = dynamics.crba(model, q)
    zero = jnp.zeros(model.nv)
    lhs = M @ a
    rhs = dynamics.rnea(model, q, zero, a) - dynamics.rnea(model, q, zero, zero)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-8)


def test_rnea_vs_mujoco_inverse_dynamics():
    """Full generalized-force comparison with covector mapping.

    v_mine = T v_mj with T = blockdiag([R^T, I, I]); forces map as
    tau_mj = T^T tau_mine.
    """
    model = robots.load("go2")
    mj, d = mj_from(model)
    q, v = random_config(model), random_vel(model)
    a_mine = jnp.asarray(RNG.normal(size=model.nv))
    set_mj_state(mj, d, model, q, v)
    # acceleration mapping: qacc_mj for free joint is d/dt of qvel_mj.
    # v_world = R v_loc => a_world = R (a_loc + w_loc x v_loc)
    R = np.asarray(lie.quat_to_rotmat(q[3:7]))
    a_np = np.asarray(a_mine)
    v_np = np.asarray(v)
    d.qacc[:3] = R @ (a_np[:3] + np.cross(v_np[3:6], v_np[:3]))
    d.qacc[3:6] = a_np[3:6]
    d.qacc[6:] = a_np[6:]
    mujoco.mj_inverse(mj, d)
    tau_mine = np.asarray(dynamics.rnea(model, q, v, a_mine))
    tau_mj_mapped = np.concatenate([R.T @ d.qfrc_inverse[:3] * 0 + R.T @ d.qfrc_inverse[:3],
                                    d.qfrc_inverse[3:6], d.qfrc_inverse[6:]])
    # our local-linear covector = R^T * world-linear covector
    np.testing.assert_allclose(tau_mine, tau_mj_mapped, atol=1e-6)


@pytest.mark.parametrize("name", ["go2"])
def test_centroidal_momentum_consistency(name):
    model = robots.load(name)
    q, v = random_config(model), random_vel(model)
    h = dynamics.centroidal_momentum(model, q, v)
    Ag = dynamics.centroidal_momentum_matrix(model, q)
    np.testing.assert_allclose(np.asarray(Ag @ v), np.asarray(h), atol=1e-9)
    # linear part = total mass * com velocity
    def com_of_t(t):
        return dynamics.center_of_mass(model, state.integrate(model, q, t * v))
    vcom = jax.jacfwd(com_of_t)(jnp.zeros(()))
    np.testing.assert_allclose(np.asarray(h[:3]), model.total_mass() * np.asarray(vcom),
                               atol=1e-8)


def test_frame_jacobian_vs_autodiff():
    model = robots.load("go2")
    q = random_config(model)
    fid = model.frame_id("FL_foot")

    def pos_of(dq):
        return kinematics.frame_placement(model, state.integrate(model, q, dq), fid)[1]

    J_ad = jax.jacfwd(pos_of)(jnp.zeros(model.nv))
    J = kinematics.frame_jacobian(model, q, fid, "local_world_aligned")
    np.testing.assert_allclose(np.asarray(J[:3]), np.asarray(J_ad), atol=1e-8)
    # velocity consistency: J v == frame_velocity
    v = random_vel(model)
    vf = kinematics.frame_velocity(model, q, v, fid, "local_world_aligned")
    np.testing.assert_allclose(np.asarray(J @ v), np.asarray(vf), atol=1e-9)
    # local frame too
    Jl = kinematics.frame_jacobian(model, q, fid, "local")
    vfl = kinematics.frame_velocity(model, q, v, fid, "local")
    np.testing.assert_allclose(np.asarray(Jl @ v), np.asarray(vfl), atol=1e-9)


def test_constrained_dynamics_pins_feet():
    model = robots.load("go2")
    q = jnp.asarray(model.reference_configurations["standing"])
    v = random_vel(model, 0.1)
    tau = jnp.zeros(model.nv).at[6:].set(jnp.asarray(RNG.normal(size=model.nv - 6)))
    feet = [model.frame_id(f) for f in ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]]
    active = jnp.array([1.0, 1.0, 1.0, 0.0])
    ddq, forces = dynamics.constrained_fwd_dynamics(model, q, v, tau, feet, active, 3)
    # active feet: J ddq + Jdot v == 0
    for k, fid in enumerate(feet):
        def vel_of_t(t, fid=fid):
            qt = state.integrate(model, q, t * v)
            return kinematics.frame_jacobian(model, qt, fid, "local")[:3] @ v
        jdot_v = jax.jacfwd(vel_of_t)(jnp.zeros(()))
        J = kinematics.frame_jacobian(model, q, fid, "local")[:3]
        acc = np.asarray(J @ ddq + jdot_v)
        if k < 3:
            np.testing.assert_allclose(acc, 0.0, atol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(forces[k]), 0.0, atol=1e-12)
    # Newton: d(h_lin)/dt = m*g + sum of world contact forces.
    hdot = np.asarray(
        dynamics.centroidal_momentum_matrix(model, q) @ ddq
        + dynamics.centroidal_momentum_time_variation(model, q, v)
    )
    f_world = np.zeros(3)
    for k, fid in enumerate(feet):
        Rf, _ = kinematics.frame_placement(model, q, fid)
        f_world += np.asarray(Rf) @ np.asarray(forces[k])
    expected = model.total_mass() * model.gravity + f_world
    np.testing.assert_allclose(hdot[:3], expected, atol=1e-6)


def test_free_fall_dynamics():
    """No contact, no torque: base linear acceleration == gravity."""
    model = robots.load("go2")
    q = jnp.asarray(model.reference_configurations["standing"])
    v = jnp.zeros(model.nv)
    ddq = dynamics.forward_dynamics(model, q, v, jnp.zeros(model.nv))
    R = np.asarray(lie.quat_to_rotmat(q[3:7]))
    a_world = R @ np.asarray(ddq[:3])
    np.testing.assert_allclose(a_world, model.gravity, atol=1e-8)
