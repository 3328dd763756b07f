"""Inverse-dynamics QP layer — reference tests/inverse-dynamics/* analogue.

The harness integrates the QP's own accelerations (semi-implicit, dt=1e-3)
as a surrogate simulator — no physics engine — and asserts decreasing task
error, respected limits, and ~zero contact-foot velocity
(kinodynamics-id.cpp tests :31-115, 146-236).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotModelHandler
from simple_mpc_tpu.id.kinodynamics_id import IDSettings, KinodynamicsID
from simple_mpc_tpu.id.centroidal_id import CentroidalID
from simple_mpc_tpu.ops import kinematics as kin
from simple_mpc_tpu.ops.state import integrate as q_integrate

DT = 1e-3


def solo_handler():
    model = robots.load_solo12()
    mh = RobotModelHandler(model, "standing", "base_link")
    for f in ["FL_FOOT", "FR_FOOT", "HL_FOOT", "HR_FOOT"]:
        mh.add_point_foot(f, "base_link")
    return mh


class Harness:
    """TestKinoID analogue (kinodynamics-id.cpp:31-108): integrate the QP's
    accelerations."""

    def __init__(self, mh, solver):
        self.mh = mh
        self.solver = solver
        x = np.asarray(mh.reference_state)
        self.q = x[: mh.model.nq].copy()
        self.v = x[mh.model.nq:].copy()
        self.t = 0.0
        self.taus = []

    def step(self):
        tau = np.asarray(self.solver.solve(self.t, self.q, self.v))
        ddq = np.asarray(self.solver.get_accelerations())
        self.q = np.asarray(q_integrate(
            self.mh.model, jnp.asarray(self.q),
            jnp.asarray((self.v + 0.5 * ddq * DT) * DT)))
        self.v = self.v + ddq * DT
        self.t += DT
        self.taus.append(tau)
        return tau


@pytest.fixture(scope="module")
def solo():
    return solo_handler()


def test_posture_task(solo):
    """KinodynamicsID_postureTask (kinodynamics-id.cpp:110-143): posture
    PD converges back to the reference after a perturbation."""
    mh = solo
    settings = IDSettings(kp_posture=20.0, w_posture=1.0, qp_iters=60)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    h.q[7] += 0.1  # perturb one hip joint
    q_ref = np.asarray(mh.reference_state[: mh.model.nq])
    err0 = np.abs(h.q[7:] - q_ref[7:]).max()
    for _ in range(400):
        h.step()
    err1 = np.abs(h.q[7:] - q_ref[7:]).max()
    assert err1 < 0.5 * err0, (err0, err1)
    # torque limits always respected (kinodynamics-id.cpp:78-91)
    taus = np.abs(np.stack(h.taus))
    assert (taus <= np.asarray(mh.model.effort_limit[6:])[None] + 1e-6).all()


def test_contact_point_cost(solo):
    """KinodynamicsID_contactPoint_cost (kinodynamics-id.cpp:178-190):
    stance feet stay still, the robot stands under gravity."""
    mh = solo
    settings = IDSettings(kp_base=1.0, kp_posture=1.0, kp_contact=10.0,
                          w_base=1.0, w_posture=0.05, w_contact_motion=10.0,
                          w_contact_force=1.0, qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    for _ in range(300):
        h.step()
    # contact feet velocity ~ 0 (kinodynamics-id.cpp:162-175)
    for k, fid in enumerate(mh.feet_frame_ids):
        vf = np.asarray(kin.frame_velocity(
            mh.model, jnp.asarray(h.q), jnp.asarray(h.v), fid,
            "local_world_aligned"))[:3]
        assert np.abs(vf).max() < 5e-2, (k, vf)
    # base height maintained
    assert abs(h.q[2] - mh.reference_state[2]) < 2e-2
    # sum of normal forces ~ weight
    f = np.asarray(idq.get_forces())
    assert abs(f[:, 2].sum() - mh.mass * 9.81) < 0.15 * mh.mass * 9.81


def test_contact_point_equality(solo):
    """KinodynamicsID_contactPoint_equality (kinodynamics-id.cpp:207-219):
    hard contact-motion equalities."""
    mh = solo
    settings = IDSettings(kp_base=1.0, kp_contact=10.0, w_base=1.0,
                          w_contact_motion=10.0, w_contact_force=1.0,
                          contact_motion_equality=True, qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    for _ in range(200):
        h.step()
    for k, fid in enumerate(mh.feet_frame_ids):
        vf = np.asarray(kin.frame_velocity(
            mh.model, jnp.asarray(h.q), jnp.asarray(h.v), fid,
            "local_world_aligned"))[:3]
        assert np.abs(vf).max() < 5e-2, (k, vf)


# ---------------------------------------------------------------------------
# Reference-strength convergence matrix (kinodynamics-id.cpp:178-236,
# 270-273): {point (Solo12 3D), quad (Talos 6D)} x {cost, equality} contact
# modes, 10 000 self-integrated steps, limits respected at every step,
# decreasing task error, base error < 2e-2 over the final 10% of steps,
# contact-foot velocity < 1e-3 at the end.
# ---------------------------------------------------------------------------


def talos_quad_handler():
    model = robots.load_talos()
    mh = RobotModelHandler(model, "half_sitting", "base_link")
    quad = np.array([[0.1, 0.075, 0], [0.1, -0.075, 0],
                     [-0.1, 0.075, 0], [-0.1, -0.075, 0]])
    mh.add_quad_foot("left_sole_link", "base_link", quad)
    mh.add_quad_foot("right_sole_link", "base_link", quad)
    return mh


def _base_error(mh, q):
    ref = np.asarray(mh.reference_state[: mh.model.nq])
    return float(np.abs(q[:3] - ref[:3]).max())


N_LONG = 10_000


@pytest.mark.slow
@pytest.mark.parametrize("robot", ["solo", "talos"])
@pytest.mark.parametrize("equality", [False, True])
def test_id_convergence_matrix(robot, equality):
    """point/quad x cost/equality, 10k steps (reference 4-case matrix)."""
    mh = solo_handler() if robot == "solo" else talos_quad_handler()
    settings = IDSettings(kp_base=10.0, kp_posture=10.0, kp_contact=30.0,
                          w_base=1.0, w_posture=0.1, w_contact_motion=50.0,
                          w_contact_force=0.01,
                          contact_motion_equality=equality, qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    # start from a perturbed posture so convergence is meaningful
    h.q[7] += 0.05
    h.v[7] -= 0.05

    effort = np.asarray(mh.model.effort_limit[6:])
    vmax = np.asarray(mh.model.velocity_limit[6:])
    q_ref = np.asarray(mh.reference_state[: mh.model.nq])
    jerrs = []
    for i in range(N_LONG):
        h.step()
        if i % 100 == 0:
            jerrs.append(float(abs(h.q[7] - q_ref[7])))
        if i >= int(0.9 * N_LONG) and i % 200 == 0:
            # base error < 2e-2 over the final 10% (kinodynamics-id.cpp:270-273)
            assert _base_error(mh, h.q) < 2e-2, (i, h.q[:3])
    taus = np.abs(np.stack(h.taus))
    # limits respected at EVERY step (kinodynamics-id.cpp:78-91)
    assert (taus <= effort[None] + 1e-6).all(), taus.max(0)
    assert (np.abs(h.v[6:]) <= vmax + 1e-6).all()
    qlo = np.asarray(mh.model.lower_limit[7:])
    qhi = np.asarray(mh.model.upper_limit[7:])
    assert (h.q[7:] >= qlo - 1e-6).all() and (h.q[7:] <= qhi + 1e-6).all()
    # the perturbed joint's task error decreases (is_error_decreasing
    # analogue, kinodynamics-id.cpp:65-75): settled far below the 0.05 kick
    assert jerrs[-1] < 0.2 * jerrs[0], (jerrs[0], jerrs[-1])
    # contact feet velocity ~ 0 at the end (kinodynamics-id.cpp:162-175)
    for k, fid in enumerate(mh.feet_frame_ids):
        vf = np.asarray(kin.frame_velocity(
            mh.model, jnp.asarray(h.q), jnp.asarray(h.v), fid,
            "local_world_aligned"))[:3]
        assert np.abs(vf).max() < 1e-3, (k, vf)


@pytest.mark.slow
def test_centroidal_id_com_long(solo):
    """CoM reaches a shifted target to < 1e-3 over a long self-integration
    (centroidal-id.cpp:325-341)."""
    mh = solo
    settings = IDSettings(kp_base=10.0, kp_posture=10.0, kp_contact=30.0,
                          kp_com=100.0, kp_feet_tracking=10.0,
                          w_base=1.0, w_posture=0.05, w_contact_motion=50.0,
                          w_contact_force=0.01, w_com=100.0,
                          w_feet_tracking=1.0, qp_iters=80)
    cid = CentroidalID(mh, DT, settings)
    from simple_mpc_tpu.ops import dynamics as dyn

    q0 = np.asarray(mh.reference_state[: mh.model.nq])
    com0 = np.asarray(dyn.center_of_mass(mh.model, jnp.asarray(q0)))
    com_t = com0 + np.array([0.0, 0.0, -0.01])
    feet_pose = [(np.eye(3), np.zeros(3))] * mh.n_feet
    feet_vel = [np.zeros(6)] * mh.n_feet
    f0 = np.zeros((mh.n_feet, 3))
    f0[:, 2] = mh.mass * 9.81 / mh.n_feet
    cid.set_target(com_t, np.zeros(3), feet_pose, feet_vel,
                   [True] * mh.n_feet, f0)
    h = Harness(mh, cid)
    for _ in range(4000):
        h.step()
    com1 = np.asarray(dyn.center_of_mass(mh.model, jnp.asarray(h.q)))
    assert abs(com1[2] - com_t[2]) < 1e-3, (com0, com1, com_t)


@pytest.mark.slow
def test_centroidal_id_swing_tracking(solo):
    """A swing foot tracks a lifted target to < 1e-3 while the other three
    stand (centroidal-id.cpp:391-408)."""
    mh = solo
    settings = IDSettings(kp_base=10.0, kp_posture=10.0, kp_contact=30.0,
                          kp_com=50.0, kp_feet_tracking=100.0,
                          w_base=1.0, w_posture=0.05, w_contact_motion=50.0,
                          w_contact_force=0.01, w_com=10.0,
                          w_feet_tracking=10.0, qp_iters=80)
    cid = CentroidalID(mh, DT, settings)
    from simple_mpc_tpu.ops import dynamics as dyn

    model = mh.model
    q0 = jnp.asarray(mh.reference_state[: model.nq])
    oR, op = kin.fk(model, q0)
    fR, fp = kin.frame_placements(model, oR, op)
    feet_p = [np.asarray(fp[i]) for i in mh.feet_frame_ids]
    feet_R = [np.asarray(fR[i]) for i in mh.feet_frame_ids]
    com0 = np.asarray(dyn.center_of_mass(model, q0))
    # swing foot 0: lift 3 cm; others hold
    target0 = feet_p[0] + np.array([0.0, 0.0, 0.03])
    feet_pose = [(feet_R[k], (target0 if k == 0 else feet_p[k]))
                 for k in range(mh.n_feet)]
    feet_vel = [np.zeros(6)] * mh.n_feet
    contacts = [k != 0 for k in range(mh.n_feet)]
    f0 = np.zeros((mh.n_feet, 3))
    f0[1:, 2] = mh.mass * 9.81 / 3.0
    cid.set_target(com0, np.zeros(3), feet_pose, feet_vel, contacts, f0)
    h = Harness(mh, cid)
    for _ in range(4000):
        h.step()
    oR, op = kin.fk(model, jnp.asarray(h.q))
    fR2, fp2 = kin.frame_placements(model, oR, op)
    p_swing = np.asarray(fp2[mh.feet_frame_ids[0]])
    assert np.abs(p_swing - target0).max() < 1e-3, (p_swing, target0)


@pytest.mark.slow
def test_centroidal_id_com(solo):
    """CentroidalID CoM tracking (centroidal-id.cpp tests :325-341): the CoM
    converges toward a slightly shifted target."""
    mh = solo
    settings = IDSettings(kp_base=1.0, kp_posture=1.0, kp_contact=10.0,
                          kp_com=100.0, kp_feet_tracking=10.0,
                          w_base=1.0, w_posture=0.05, w_contact_motion=10.0,
                          w_contact_force=1.0, w_com=100.0,
                          w_feet_tracking=1.0, qp_iters=80)
    cid = CentroidalID(mh, DT, settings)
    from simple_mpc_tpu.ops import dynamics as dyn

    q0 = np.asarray(mh.reference_state[: mh.model.nq])
    com0 = np.asarray(dyn.center_of_mass(mh.model, jnp.asarray(q0)))
    com_t = com0 + np.array([0.0, 0.0, -0.01])
    feet_pose = [(np.eye(3), np.zeros(3))] * mh.n_feet
    feet_vel = [np.zeros(6)] * mh.n_feet
    f0 = np.zeros((mh.n_feet, 3))
    f0[:, 2] = mh.mass * 9.81 / mh.n_feet
    cid.set_target(com_t, np.zeros(3), feet_pose, feet_vel,
                   [True] * mh.n_feet, f0)
    h = Harness(mh, cid)
    err0 = abs(com0[2] - com_t[2])
    for _ in range(600):
        h.step()
    com1 = np.asarray(dyn.center_of_mass(mh.model, jnp.asarray(h.q)))
    assert abs(com1[2] - com_t[2]) < 0.5 * err0, (com0, com1, com_t)
