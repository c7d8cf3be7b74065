import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.core import lie


def random_rotations(rng, n):
    w = rng.normal(size=(n, 3)) * 1.5
    return np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)))


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(size=(64, 3)).astype(np.float32)
    w *= (rng.uniform(0.01, 3.0, size=(64, 1)) / np.linalg.norm(w, axis=-1, keepdims=True)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_exp_orthonormal(rng):
    w = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    RtR = np.einsum("nji,njk->nik", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_so3_log_small_angle():
    w = jnp.array([1e-7, -2e-7, 5e-8], dtype=jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-6)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = (np.pi - 1e-4) * axis
    R = lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))
    w2 = np.asarray(lie.so3_log(R))
    # log may return +/- the axis; compare rotations
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(np.asarray(R), R2, atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = lie.se3_log(R, t)
    R2, t2 = lie.se3_exp(xi2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-4)


def test_se3_mul_inv(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    Ri, ti = lie.se3_inv(R, t)
    Rr, tr = lie.se3_mul(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rr), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), 0.0, atol=1e-5)


def test_se3_apply_matches_matrix(rng):
    xi = rng.normal(size=(6,)).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi))
    p = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    q1 = lie.se3_apply(R, t, p)
    T = np.asarray(lie.se3_matrix(R, t))
    ph = np.concatenate([np.asarray(p), np.ones((10, 1), np.float32)], axis=1)
    q2 = (T @ ph.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(q1), q2, atol=1e-5)


def test_quat_roundtrip(rng):
    w = rng.normal(size=(40, 3)).astype(np.float32)
    R = lie.so3_exp(jnp.asarray(w))
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_left_jacobian_consistency(rng):
    """V from se3_exp must satisfy t = V rho; and Vinv @ V = I."""
    phi = rng.normal(size=(16, 3)).astype(np.float32)
    V = lie.so3_left_jacobian(jnp.asarray(phi))
    Vinv = lie.so3_left_jacobian_inv(jnp.asarray(phi))
    prod = np.einsum("nij,njk->nik", np.asarray(V), np.asarray(Vinv))
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (16, 1, 1)), atol=1e-4)


def test_se3_update_left_matches_manual(rng):
    xi0 = rng.normal(size=(6,)).astype(np.float32)
    dxi = (rng.normal(size=(6,)) * 0.1).astype(np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi0))
    dR, dt = lie.se3_exp(jnp.asarray(dxi))
    Ru, tu = lie.se3_update_left(R, t, jnp.asarray(dxi))
    Rm, tm = lie.se3_mul(dR, dt, R, t)
    np.testing.assert_allclose(np.asarray(Ru), np.asarray(Rm), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tu), np.asarray(tm), atol=1e-6)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(8, 7)).astype(np.float32) * 0.8
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    xi2 = lie.sim3_log(R, t, s)
    R2, t2, s2 = lie.sim3_exp(xi2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)


def test_sim3_mul_inv(rng):
    xi = rng.normal(size=(7,)).astype(np.float32) * 0.5
    R, t, s = lie.sim3_exp(jnp.asarray(xi))
    Ri, ti, si = lie.sim3_inv(R, t, s)
    Rr, tr, sr = lie.sim3_mul(R, t, s, Ri, ti, si)
    np.testing.assert_allclose(np.asarray(Rr), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sr), 1.0, rtol=1e-5)


def test_sim3_identity_equals_se3(rng):
    """sigma=0 Sim3 must reduce to SE3."""
    xi6 = rng.normal(size=(4, 6)).astype(np.float32)
    xi7 = np.concatenate([xi6, np.zeros((4, 1), np.float32)], axis=1)
    R7, t7, s7 = lie.sim3_exp(jnp.asarray(xi7))
    R6, t6 = lie.se3_exp(jnp.asarray(xi6))
    np.testing.assert_allclose(np.asarray(s7), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(R7), np.asarray(R6), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-4)


def test_solve_psd_small_matches_linalg():
    import jax.numpy as jnp
    from orbslam_birdview_tpu.core.linalg import solve_psd_small

    rng = np.random.default_rng(0)
    for n in (3, 6, 7):
        A = rng.normal(size=(n, n))
        A = (A @ A.T + n * np.eye(n)).astype(np.float32)
        b = rng.normal(size=n).astype(np.float32)
        x = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(b)))
        np.testing.assert_allclose(A @ x, b, rtol=2e-4, atol=2e-4)
    # batched
    A = rng.normal(size=(5, 6, 6))
    A = (A @ np.transpose(A, (0, 2, 1)) + 6 * np.eye(6)).astype(np.float32)
    b = rng.normal(size=(5, 6)).astype(np.float32)
    x = np.asarray(solve_psd_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(np.einsum("bij,bj->bi", A, x), b,
                               rtol=2e-4, atol=2e-4)
