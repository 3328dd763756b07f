"""In-framework simulator sanity: free fall + PD standing under ground
contact (the closed-loop substrate replacing PyBullet)."""
import jax.numpy as jnp
import numpy as np

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.handler import RobotModelHandler
from simple_mpc_tpu.ops import dynamics as dyn
from simple_mpc_tpu.ops import kinematics as kin
from simple_mpc_tpu.sim import Simulator, SimSettings


def go2_setup():
    model = robots.load_go2()
    mh = RobotModelHandler(model, "standing", "base")
    for f in ["FL_foot", "FR_foot", "RL_foot", "RR_foot"]:
        mh.add_point_foot(f, "base")
    q0 = np.asarray(mh.reference_state[: model.nq])
    oR, op = kin.fk(model, jnp.asarray(q0))
    fR, fp = kin.frame_placements(model, oR, op)
    foot_z = float(np.mean([np.asarray(fp[i])[2] for i in mh.feet_frame_ids]))
    return model, mh, q0, foot_z


def test_free_fall():
    """No ground: the CoM accelerates at g."""
    model, mh, q0, foot_z = go2_setup()
    sim = Simulator(model, mh.feet_frame_ids,
                    SimSettings(dt=1e-3, ground_height=foot_z - 10.0))
    v0 = np.zeros(model.nv)
    q, v = jnp.asarray(q0), jnp.asarray(v0)
    for _ in range(100):
        q, v, f = sim.step(q, v, jnp.zeros(model.nv - 6))
    assert np.allclose(np.asarray(f), 0.0)
    # after 0.1 s of free fall: vz ~ -0.981
    com_v = np.asarray(dyn.centroidal_momentum(model, q, v))[:3] / mh.mass
    np.testing.assert_allclose(com_v[2], -0.981, rtol=2e-2)


def test_pd_standing():
    """Ground at the feet + PD posture hold: the robot stands (base height
    steady, normal forces carry ~weight)."""
    model, mh, q0, foot_z = go2_setup()
    sim = Simulator(model, mh.feet_frame_ids,
                    SimSettings(dt=1e-3, ground_height=foot_z))
    kp, kd = 60.0, 3.0
    qj_ref = q0[7:]
    q, v = jnp.asarray(q0), jnp.asarray(np.zeros(model.nv))
    for _ in range(800):
        tau = kp * (qj_ref - np.asarray(q)[7:]) - kd * np.asarray(v)[6:]
        q, v, f = sim.step(q, v, jnp.asarray(tau))
    q_np, v_np = np.asarray(q), np.asarray(v)
    assert np.isfinite(q_np).all() and np.isfinite(v_np).all()
    assert abs(q_np[2] - q0[2]) < 0.03, q_np[2]
    fz = np.asarray(f)[:, 2]
    assert abs(fz.sum() - mh.mass * 9.81) < 0.25 * mh.mass * 9.81, fz
    assert np.abs(v_np).max() < 0.5
