"""Locked-joint model reduction (models/reduce.py) vs the full model.

The reduced model must be DYNAMICALLY exact at the locked configuration:
with locked joints pinned at q_ref and their velocities/accelerations zero,
FK, CoM, the mass matrix and inverse dynamics of the reduced model equal
the full model's restricted to the kept dofs (the pinocchio
buildReducedModel contract, reference tests/test_utils.cpp:27-63).
"""
import numpy as np
import pytest

from simple_mpc_tpu.models import robots
from simple_mpc_tpu.models.reduce import build_reduced_model
from simple_mpc_tpu.models.robots import TALOS_LOCKED_JOINTS
from simple_mpc_tpu.ops import dynamics as dyn
from simple_mpc_tpu.ops import kinematics as kin


@pytest.fixture(scope="module")
def talos_pair():
    full = robots.load_talos(reduced=False)
    red = robots.load_talos()
    return full, red


def _embed_q(full, red, q_red):
    """Lift a reduced configuration into the full model (locked joints at
    their half_sitting values)."""
    q_full = np.array(full.reference_configurations["half_sitting"])
    kept = [j for j, n in enumerate(full.joint_names)
            if n not in TALOS_LOCKED_JOINTS]
    out = q_full.copy()
    for new_j, old_j in enumerate(kept):
        iq_o, iq_n = full.idx_q[old_j], red.idx_q[new_j]
        n = 7 if full.joint_types[old_j] == 0 else 1
        out[iq_o: iq_o + n] = q_red[iq_n: iq_n + n]
    return out


def _embed_v(full, red, v_red):
    kept = [j for j, n in enumerate(full.joint_names)
            if n not in TALOS_LOCKED_JOINTS]
    out = np.zeros(full.nv)
    for new_j, old_j in enumerate(kept):
        iv_o, iv_n = full.idx_v[old_j], red.idx_v[new_j]
        n = 6 if full.joint_types[old_j] == 0 else 1
        out[iv_o: iv_o + n] = v_red[iv_n: iv_n + n]
    return out


def _kept_v_idx(full, red):
    kept = [j for j, n in enumerate(full.joint_names)
            if n not in TALOS_LOCKED_JOINTS]
    idx = []
    for old_j in kept:
        iv = full.idx_v[old_j]
        n = 6 if full.joint_types[old_j] == 0 else 1
        idx.extend(range(iv, iv + n))
    return np.asarray(idx)


def test_sizes_match_reference(talos_pair):
    """22 actuated / nv=28, the reference fixture's reduced Talos
    (tests/test_utils.cpp:27-63)."""
    full, red = talos_pair
    assert full.nv == 38 and red.nv == 28
    assert red.nu == 22
    assert red.njoints == 23  # root + 22


def test_mass_preserved(talos_pair):
    full, red = talos_pair
    assert np.isclose(red.total_mass(), full.total_mass(), rtol=1e-12)


def _rand_q(model, rng):
    q = np.array(model.reference_configurations["half_sitting"])
    dq = 0.3 * rng.standard_normal(model.nq)
    q[:3] += dq[:3]
    q[7:] = np.clip(q[7:] + dq[7:], model.lower_limit[7:] + 1e-3,
                    model.upper_limit[7:] - 1e-3)
    quat = rng.standard_normal(4)
    q[3:7] = quat / np.linalg.norm(quat)
    return q


def test_fk_and_com_match(talos_pair):
    full, red = talos_pair
    rng = np.random.default_rng(0)
    for _ in range(3):
        q_r = _rand_q(red, rng)
        q_f = _embed_q(full, red, q_r)
        fRr, fpr = kin.frame_placements(red, *kin.fk(red, q_r))
        fRf, fpf = kin.frame_placements(full, *kin.fk(full, q_f))
        for name in ("left_sole_link", "right_sole_link",
                     "gripper_left_link", "head_2_link"):
            ir, if_ = red.frame_id(name), full.frame_id(name)
            np.testing.assert_allclose(np.asarray(fpr[ir]),
                                       np.asarray(fpf[if_]), atol=1e-10)
            np.testing.assert_allclose(np.asarray(fRr[ir]),
                                       np.asarray(fRf[if_]), atol=1e-10)
        np.testing.assert_allclose(np.asarray(dyn.center_of_mass(red, q_r)),
                                   np.asarray(dyn.center_of_mass(full, q_f)),
                                   atol=1e-10)


def test_mass_matrix_is_restriction(talos_pair):
    """M_red(q) == S^T M_full(q_lift) S with S the kept-dof selector."""
    full, red = talos_pair
    rng = np.random.default_rng(1)
    q_r = _rand_q(red, rng)
    q_f = _embed_q(full, red, q_r)
    idx = _kept_v_idx(full, red)
    M_r = np.asarray(dyn.crba(red, q_r))
    M_f = np.asarray(dyn.crba(full, q_f))
    np.testing.assert_allclose(M_r, M_f[np.ix_(idx, idx)], atol=1e-9)


def test_rnea_is_restriction(talos_pair):
    """tau_red(q,v,a) == selector of tau_full with locked dofs at rest."""
    full, red = talos_pair
    rng = np.random.default_rng(2)
    q_r = _rand_q(red, rng)
    v_r = 0.5 * rng.standard_normal(red.nv)
    a_r = 0.5 * rng.standard_normal(red.nv)
    q_f = _embed_q(full, red, q_r)
    v_f = _embed_v(full, red, v_r)
    a_f = _embed_v(full, red, a_r)
    idx = _kept_v_idx(full, red)
    tau_r = np.asarray(dyn.rnea(red, q_r, v_r, a_r))
    tau_f = np.asarray(dyn.rnea(full, q_f, v_f, a_f))
    np.testing.assert_allclose(tau_r, tau_f[idx], atol=1e-9)


def test_urdf_locked_path_matches_model_reduction():
    """load_urdf(locked_joints=...) and build_reduced_model agree when the
    locked values coincide (two implementations of buildReducedModel)."""
    import os

    from simple_mpc_tpu.models.urdf import load_urdf

    assets = os.path.join(os.path.dirname(robots.__file__), "assets")
    full = robots.load_talos(reduced=False)
    q = full.reference_configurations["half_sitting"]
    locked_values = {}
    for j, name in enumerate(full.joint_names):
        if name in TALOS_LOCKED_JOINTS:
            locked_values[name] = float(q[full.idx_q[j]])
    via_urdf = load_urdf(os.path.join(assets, "talos.urdf"), name="talos",
                         locked_joints=TALOS_LOCKED_JOINTS,
                         locked_values=locked_values)
    via_model = build_reduced_model(full, TALOS_LOCKED_JOINTS, q_ref=q)
    assert via_urdf.joint_names == via_model.joint_names
    np.testing.assert_allclose(via_urdf.mass, via_model.mass, atol=1e-12)
    np.testing.assert_allclose(via_urdf.com, via_model.com, atol=1e-12)
    np.testing.assert_allclose(via_urdf.inertia, via_model.inertia, atol=1e-12)
    np.testing.assert_allclose(via_urdf.jR, via_model.jR, atol=1e-12)
    np.testing.assert_allclose(via_urdf.jp, via_model.jp, atol=1e-12)
    names_u = {f.name for f in via_urdf.frames}
    names_m = {f.name for f in via_model.frames}
    assert names_u == names_m


def test_lock_errors():
    full = robots.load_talos(reduced=False)
    with pytest.raises(ValueError, match="unknown joints"):
        build_reduced_model(full, ["nope_joint"])
    with pytest.raises(ValueError, match="root"):
        build_reduced_model(full, ["root_joint"])


def test_srdf_reference_configurations_and_rotors():
    """SRDF loading (pinocchio::srdf::loadReferenceConfigurations /
    loadRotorParameters parity, reference tests/test_utils.cpp:22-24):
    the shipped talos.srdf reproduces the half_sitting posture on the
    full model, survives reduction, and fills per-dof rotor params."""
    import os

    from simple_mpc_tpu.models.srdf import (load_reference_configurations,
                                            load_rotor_parameters)
    from simple_mpc_tpu.models.urdf import load_urdf

    assets = os.path.join(os.path.dirname(robots.__file__), "assets")
    model = load_urdf(os.path.join(assets, "talos.urdf"), name="talos")
    srdf_path = os.path.join(assets, "talos.srdf")
    cfgs = load_reference_configurations(model, srdf_path)
    assert "half_sitting" in cfgs
    q = cfgs["half_sitting"]
    assert q.shape == (model.nq,)
    assert np.isclose(q[2], 1.01)
    j = model.joint_id("leg_left_4_joint")
    assert np.isclose(q[model.idx_q[j]], 0.859395)
    ri, gr = load_rotor_parameters(model, srdf_path)
    j = model.joint_id("arm_left_6_joint")
    assert np.isclose(gr[model.idx_v[j]], 160.0)
    assert np.isclose(ri[model.idx_v[j]], 3.0e-5)
    assert np.all(gr[:6] == 1.0) and np.all(ri[:6] == 0.0)  # free-flyer

    # wrong value arity raises
    import pytest as _pytest

    bad = ('<robot name="t"><group_state name="x">'
           '<joint name="leg_left_1_joint" value="1 2"/></group_state></robot>')
    with _pytest.raises(ValueError, match="expects 1"):
        load_reference_configurations(model, bad, update_model=False)

    # reduction carries the registered configuration + rotor params
    red = robots.load_talos()
    assert red.reference_configurations["half_sitting"].shape == (red.nq,)
    assert int((red.rotor_inertia > 0).sum()) == red.nu
