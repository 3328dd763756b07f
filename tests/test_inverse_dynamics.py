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
