import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sings_tpu.ops import rotations as R


def random_rotmats(n, seed=0):
    rng = np.random.RandomState(seed)
    aa = rng.randn(n, 3).astype(np.float32)
    return R.axis_angle_to_matrix(jnp.asarray(aa)), jnp.asarray(aa)


def test_axis_angle_matrix_roundtrip():
    mats, aa = random_rotmats(64)
    # orthonormality
    eye = jnp.eye(3)[None].repeat(64, 0)
    np.testing.assert_allclose(mats @ mats.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(mats)), 1.0, atol=1e-5)
    aa_back = R.matrix_to_axis_angle(mats)
    mats_back = R.axis_angle_to_matrix(aa_back)
    np.testing.assert_allclose(np.asarray(mats_back), np.asarray(mats), atol=1e-5)


def test_quaternion_roundtrip():
    mats, _ = random_rotmats(64, seed=1)
    q = R.matrix_to_quaternion(mats)
    np.testing.assert_allclose(
        np.asarray(R.quaternion_to_matrix(q)), np.asarray(mats), atol=1e-5
    )


def test_quaternion_multiply_matches_matrix_product():
    m1, _ = random_rotmats(16, seed=2)
    m2, _ = random_rotmats(16, seed=3)
    q1, q2 = R.matrix_to_quaternion(m1), R.matrix_to_quaternion(m2)
    q12 = R.quaternion_multiply(q1, q2)
    np.testing.assert_allclose(
        np.asarray(R.quaternion_to_matrix(q12)), np.asarray(m1 @ m2), atol=1e-5
    )


def test_rotation_6d_roundtrip():
    mats, _ = random_rotmats(64, seed=4)
    d6 = R.matrix_to_rotation_6d(mats)
    np.testing.assert_allclose(
        np.asarray(R.rotation_6d_to_matrix(d6)), np.asarray(mats), atol=1e-5
    )


def test_axis_angle_small_angle_stable():
    aa = jnp.array([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
    m = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m[1]), np.eye(3), atol=1e-7)
    # gradient must be finite at zero
    g = jax.grad(lambda a: R.axis_angle_to_matrix(a).sum())(aa)
    assert np.all(np.isfinite(np.asarray(g)))


def test_rotation_matrix_from_vectors():
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(32, 3).astype(np.float32))
    M = R.rotation_matrix_from_vectors(a, b)
    a_n = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray((M @ a_n[..., None])[..., 0]), np.asarray(b_n), atol=1e-5
    )
    # parallel case
    Mp = R.rotation_matrix_from_vectors(a, a)
    np.testing.assert_allclose(
        np.asarray(Mp), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
    )


def test_quaternion_apply():
    mats, _ = random_rotmats(8, seed=6)
    q = R.matrix_to_quaternion(mats)
    p = jnp.asarray(np.random.RandomState(7).randn(8, 3).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(R.quaternion_apply(q, p)),
        np.asarray((mats @ p[..., None])[..., 0]),
        atol=1e-5,
    )
