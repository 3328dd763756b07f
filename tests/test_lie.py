"""Unit tests for Lie-group ops against scipy / closed-form ground truth.

Mirrors the reference's rung-1 strategy (SURVEY.md §4.1: kernel vs formula).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from simple_mpc_tpu.ops import lie

RNG = np.random.default_rng(0)


def rand_quat(n=None):
    q = Rotation.random(n, rng=RNG).as_quat()  # xyzw
    return jnp.asarray(q)


def to_np(x):
    """Writable numpy copy (scipy cython needs writable buffers)."""
    return np.array(x, copy=True)


def test_quat_rotmat_roundtrip():
    q = rand_quat(64)
    R = lie.quat_to_rotmat(q)
    R_ref = Rotation.from_quat(to_np(q)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-12)
    q2 = lie.rotmat_to_quat(R)
    R2 = lie.quat_to_rotmat(q2)
    np.testing.assert_allclose(np.asarray(R2), R_ref, atol=1e-10)


def test_quat_mul_matches_scipy():
    q1, q2 = rand_quat(32), rand_quat(32)
    q12 = lie.quat_mul(q1, q2)
    ref = (Rotation.from_quat(to_np(q1)) * Rotation.from_quat(to_np(q2))).as_quat()
    # compare up to sign
    prod = np.abs(np.sum(np.asarray(q12) * ref, axis=-1))
    np.testing.assert_allclose(prod, 1.0, atol=1e-12)


def test_exp3_log3_roundtrip():
    # keep |w| < pi: log returns the principal branch
    w = RNG.normal(size=(128, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * RNG.uniform(0.01, 3.1, size=(128, 1))
    w = jnp.asarray(w)
    R = lie.exp3(w)
    R_ref = Rotation.from_rotvec(to_np(w)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-12)
    w2 = lie.log3(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-9)


def test_log3_small_and_near_pi():
    # tiny rotations
    w = jnp.asarray(RNG.normal(size=(16, 3)) * 1e-10)
    np.testing.assert_allclose(np.asarray(lie.log3(lie.exp3(w))), np.asarray(w), atol=1e-12)
    # near pi
    axes = RNG.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    w = jnp.asarray(axes * (np.pi - 1e-5))
    w2 = lie.log3(lie.exp3(w))
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)


def test_log3_gradient_nan_free_at_identity():
    g = jax.jacfwd(lambda w: lie.log3(lie.exp3(w)))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g), np.eye(3), atol=1e-9)


def test_exp6_log6_roundtrip():
    v = RNG.normal(size=(64, 6))
    ang_norm = np.linalg.norm(v[:, 3:], axis=-1, keepdims=True)
    v[:, 3:] *= np.minimum(1.0, 3.0 / ang_norm)  # keep |omega| < pi
    v = jnp.asarray(v)
    M = lie.exp6(v)
    v2 = lie.log6(M)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-9)


def test_se3_group_ops():
    v1, v2 = jnp.asarray(RNG.normal(size=6)), jnp.asarray(RNG.normal(size=6))
    M1, M2 = lie.exp6(v1), lie.exp6(v2)
    M12 = lie.se3_mul(M1, M2)
    Minv = lie.se3_inv(M1)
    I = lie.se3_mul(M1, Minv)
    np.testing.assert_allclose(np.asarray(I[0]), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(I[1]), 0.0, atol=1e-12)
    # log6(M1^-1 M12) == v2
    rel = lie.se3_mul(Minv, M12)
    np.testing.assert_allclose(np.asarray(lie.log6(rel)), np.asarray(v2), atol=1e-9)


def test_freeflyer_integrate_difference():
    pq1 = jnp.concatenate([jnp.asarray(RNG.normal(size=3)), rand_quat()])
    d = jnp.asarray(RNG.normal(size=6) * 0.7)
    pq2 = lie.freeflyer_integrate(pq1, d)
    d2 = lie.freeflyer_difference(pq1, pq2)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-9)
    # difference(q, q) == 0
    z = lie.freeflyer_difference(pq1, pq1)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-12)


def test_motion_force_action_duality():
    # <X v, X* f> == <v, f>
    v = jnp.asarray(RNG.normal(size=(8, 6)))
    f = jnp.asarray(RNG.normal(size=(8, 6)))
    M = lie.exp6(jnp.asarray(RNG.normal(size=6)))
    vA = lie.motion_action(M, v)
    fA = lie.force_action(M, f)
    np.testing.assert_allclose(
        np.sum(np.asarray(vA) * np.asarray(fA), axis=-1),
        np.sum(np.asarray(v) * np.asarray(f), axis=-1),
        atol=1e-9,
    )
    # action_inv inverts action
    np.testing.assert_allclose(
        np.asarray(lie.motion_action_inv(M, vA)), np.asarray(v), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(lie.force_action_inv(M, fA)), np.asarray(f), atol=1e-10
    )


def test_motion_cross_jacobi():
    # d/dt (X v) with X moving at velocity w: cross products consistency:
    # motion_cross(v, v) == 0 in angular part? Just check bilinearity + known case
    vx = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 1.0])  # pure yaw rate
    m = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, 0.0])  # pure x translation vel
    out = lie.motion_cross(vx, m)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0, 0.0, 0.0, 0.0], atol=1e-12)


def test_f32_tiny_angle_jacobians_nan_free():
    """Regression: f64-calibrated Taylor thresholds made f32 JVPs of
    exp3/_so3_jacobians divide by theta^6 ~ 1e-38 (underflow -> NaN) for
    tiny-but-nonzero rotations; this NaN'd the solver's dynamics Jacobians
    on TPU (stages with ~1e-7 rad base increments)."""
    for mag in (0.0, 1e-8, 3e-7, 1e-5, 1e-3, 0.017):
        w = jnp.asarray([0.6, 0.48, -0.64], jnp.float32) * jnp.float32(mag)
        J1 = jax.jacfwd(lie.exp3)(w)
        J2 = jax.jacfwd(lambda z: lie._so3_jacobians(z)[0])(w)
        J3 = jax.jacfwd(lambda z: lie._so3_jacobians(z)[1])(w)
        v6 = jnp.concatenate([jnp.asarray([1e-7, -2e-7, 3e-8], jnp.float32), w])
        J4 = jax.jacfwd(lambda z: jnp.concatenate(lie.exp6(z), axis=None))(v6)
        for J in (J1, J2, J3, J4):
            assert not bool(jnp.isnan(J).any()), f"NaN at mag {mag}"
    # and the full freeflyer integrate path used by the stage dynamics
    pq = jnp.asarray([0.1, 0.2, 0.3, 8.3e-5, 3.3e-5, 5.9e-6, 1.0], jnp.float32)
    dv = jnp.asarray([1e-4, -2e-4, 5e-5, 2e-7, 3.6e-7, -2e-7], jnp.float32)
    Ji = jax.jacfwd(lambda z: lie.freeflyer_integrate(pq, z))(dv)
    assert not bool(jnp.isnan(Ji).any())
