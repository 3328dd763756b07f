"""Validation of the structure-flattened world-frame kernels (ops/world.py)
against the per-joint reference implementations (ops/kinematics, ops/dynamics)
which are themselves validated against MuJoCo (test_rigid_body.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_mpc_tpu.configs import go2_handler, talos_handler
from simple_mpc_tpu.ops import dynamics as dyn
from simple_mpc_tpu.ops import kinematics as kin
from simple_mpc_tpu.ops import world as W


def _rand_state(model, seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=model.nq) * 0.3
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    v = rng.normal(size=model.nv)
    return jnp.asarray(q), jnp.asarray(v)


@pytest.fixture(scope="module", params=["go2", "talos"])
def setup(request):
    mh = go2_handler() if request.param == "go2" else talos_handler()
    model = mh.model
    q, v = _rand_state(model, seed=hash(request.param) % 2**31)
    return mh, model, q, v


def test_fk_world_matches(setup):
    _, model, q, v = setup
    oR, op = W.fk_world(model, q)
    oR0, op0 = kin.fk(model, q)
    np.testing.assert_allclose(np.asarray(oR), np.asarray(oR0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(op), np.asarray(op0), atol=1e-12)


def test_frame_placements_match(setup):
    _, model, q, v = setup
    oR, op = W.fk_world(model, q)
    fR, fp = W.frame_placements_world(model, oR, op)
    fR0, fp0 = kin.frame_placements(model, *kin.fk(model, q))
    np.testing.assert_allclose(np.asarray(fR), np.asarray(fR0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fp0), atol=1e-12)


def test_com_and_momentum_match(setup):
    _, model, q, v = setup
    oR, op = W.fk_world(model, q)
    Sw = W.world_axes(model, q, oR, op)
    com = W.com_world(model, oR, op)
    np.testing.assert_allclose(np.asarray(com),
                               np.asarray(dyn.center_of_mass(model, q)),
                               atol=1e-12)
    hg = W.centroidal_momentum_world(model, oR, op, Sw, v, com)
    np.testing.assert_allclose(np.asarray(hg),
                               np.asarray(dyn.centroidal_momentum(model, q, v)),
                               atol=1e-10)


def test_agx_and_ag6_match_ccrba(setup):
    _, model, q, v = setup
    oR, op = W.fk_world(model, q)
    Sw = W.world_axes(model, q, oR, op)
    com = W.com_world(model, oR, op)
    Ag = dyn.centroidal_momentum_matrix(model, q)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=model.nv))
    np.testing.assert_allclose(np.asarray(W.Agx(model, oR, op, Sw, x, com)),
                               np.asarray(Ag @ x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(W.ag6(model, oR, op, Sw, com)),
                               np.asarray(Ag[:, :6]), atol=1e-10)


def test_bias_hdot_matches_dccrba(setup):
    _, model, q, v = setup
    oR, op = W.fk_world(model, q)
    Sw = W.world_axes(model, q, oR, op)
    com = W.com_world(model, oR, op)
    vW = W.body_velocities(model, Sw, v)
    got = W.bias_hdot(model, oR, op, Sw, vW, v, com)
    want = dyn.centroidal_momentum_time_variation(model, q, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-9, rtol=1e-9)


def test_frame_velocities_match(setup):
    mh, model, q, v = setup
    fids = list(mh.feet_frame_ids)
    oR, op = W.fk_world(model, q)
    Sw = W.world_axes(model, q, oR, op)
    vW = W.body_velocities(model, Sw, v)
    tab = W.tables(model)
    ids = np.asarray(fids)
    fRw, fpw = W.frame_placements_world(model, oR, op, ids)
    v_wa, v_loc = W.frame_velocities_world(
        model, vW, fRw, fpw, jnp.asarray(tab.fparent[ids]))
    want_loc = kin.feet_velocities(model, q, v, fids, "local")
    want_wa = kin.feet_velocities(model, q, v, fids, "local_world_aligned")
    np.testing.assert_allclose(np.asarray(v_loc), np.asarray(want_loc), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_wa), np.asarray(want_wa), atol=1e-10)


def test_frame_translation_jacobians_match(setup):
    mh, model, q, v = setup
    fids = list(mh.feet_frame_ids)
    oR, op = W.fk_world(model, q)
    Sw = W.world_axes(model, q, oR, op)
    tab = W.tables(model)
    ids = np.asarray(fids)
    _, fpw = W.frame_placements_world(model, oR, op, ids)
    J = W.frame_translation_jacobians(model, Sw, fpw, tab.fparent[ids])
    want = kin.feet_jacobians(model, q, fids, "local_world_aligned")[:, :3, :]
    np.testing.assert_allclose(np.asarray(J), np.asarray(want), atol=1e-10)


def test_vmap_batches(setup):
    """The whole bundle must vmap over leading batch axes (solver usage)."""
    _, model, q, v = setup
    B = 4
    qs = jnp.tile(q[None], (B, 1))
    vs = jnp.tile(v[None], (B, 1))

    def bundle(q, v):
        oR, op = W.fk_world(model, q)
        Sw = W.world_axes(model, q, oR, op)
        com = W.com_world(model, oR, op)
        vW = W.body_velocities(model, Sw, v)
        hg = W.centroidal_momentum_world(model, oR, op, Sw, v, com)
        bias = W.bias_hdot(model, oR, op, Sw, vW, v, com)
        return hg, bias

    hgs, biases = jax.vmap(bundle)(qs, vs)
    hg0, bias0 = bundle(q, v)
    np.testing.assert_allclose(np.asarray(hgs[2]), np.asarray(hg0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(biases[2]), np.asarray(bias0), atol=1e-12)
