import numpy as np
import jax.numpy as jnp
import pytest

from agrifly_tpu.ops import rotation as rot


def rand_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def test_identity_and_inverse():
    q = rot.identity()
    assert np.allclose(rot.rotate(q, jnp.array([1.0, 2.0, 3.0])), [1, 2, 3])
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = jnp.array(rand_quat(rng), dtype=jnp.float32)
        qq = rot.qmul(q, rot.qinv(q))
        assert np.allclose(np.abs(qq[0]), 1.0, atol=1e-5)
        assert np.allclose(qq[1:], 0.0, atol=1e-5)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q1 = jnp.array(rand_quat(rng), dtype=jnp.float32)
        q2 = jnp.array(rand_quat(rng), dtype=jnp.float32)
        # qmul(q2, q1) = rotation q1 then q2  =>  R(q2) @ R(q1)
        R = rot.to_matrix(rot.qmul(q2, q1))
        R12 = rot.to_matrix(q2) @ rot.to_matrix(q1)
        assert np.allclose(R, R12, atol=1e-5)


def test_rotation_matrix_orthonormal():
    rng = np.random.default_rng(2)
    q = jnp.array([rand_quat(rng) for _ in range(16)], dtype=jnp.float32)
    R = rot.to_matrix(q)
    eye = np.eye(3)
    prod = np.einsum("bij,bkj->bik", R, R)
    assert np.allclose(prod, np.broadcast_to(eye, prod.shape), atol=1e-5)
    assert np.allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_euler_ypr_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(20):
        y = rng.uniform(-np.pi, np.pi)
        p = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05)
        r = rng.uniform(-np.pi, np.pi)
        q = rot.from_euler_ypr(y, p, r)
        y2, p2, r2 = rot.to_euler_ypr(q)
        assert np.allclose([y, p, r], [float(y2), float(p2), float(r2)], atol=1e-5)


def test_euler_ypr_is_321_composition():
    # yaw about z, then pitch about y, then roll about x (body axes)
    y, p, r = 0.3, -0.2, 0.7
    qz = rot.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), y)
    qy = rot.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), p)
    qx = rot.from_axis_angle(jnp.array([1.0, 0.0, 0.0]), r)
    # 3-2-1: world = qz * qy * qx * body
    q_manual = rot.qmul(qz, rot.qmul(qy, qx))
    q = rot.from_euler_ypr(y, p, r)
    assert np.allclose(q, q_manual, atol=1e-6) or np.allclose(q, -q_manual, atol=1e-6)


def test_rotation_vector_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(20):
        v = rng.standard_normal(3)
        v = v / np.linalg.norm(v) * rng.uniform(1e-4, 3.0)
        q = rot.from_rotation_vector(jnp.array(v, dtype=jnp.float32))
        v2 = rot.to_rotation_vector(q)
        # asin-based log map recovers angle in [0, pi]; same axis direction
        ang = np.linalg.norm(v)
        if ang < np.pi / 2:  # asin unambiguous range
            assert np.allclose(v, np.asarray(v2), atol=1e-4)


def test_small_angle_guard():
    tiny = jnp.array([1e-8, 0.0, 0.0])
    assert np.allclose(rot.from_rotation_vector(tiny), [1, 0, 0, 0])
    assert np.allclose(rot.to_rotation_vector(rot.identity()), 0.0)


def test_rotate_matches_reference_convention():
    # 90deg about z maps x->y in the world frame
    q = rot.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), np.pi / 2)
    v = rot.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    assert np.allclose(v, [0, 1, 0], atol=1e-6)
    vb = rot.rotate_back(q, jnp.array([0.0, 1.0, 0.0]))
    assert np.allclose(vb, [1, 0, 0], atol=1e-6)


def test_batched_shapes():
    rng = np.random.default_rng(5)
    q = jnp.array([rand_quat(rng) for _ in range(7)], dtype=jnp.float32)
    v = jnp.array(rng.standard_normal((7, 3)), dtype=jnp.float32)
    assert rot.rotate(q, v).shape == (7, 3)
    assert rot.qmul(q, q).shape == (7, 4)
    assert rot.to_rotation_vector(q).shape == (7, 3)


def test_from_vector_part_roundtrip():
    """FromVectorPartOfQuaternion parity: vector part of a w>=0 unit
    quaternion rebuilds it exactly."""
    rng = np.random.default_rng(11)
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1.0  # canonical w >= 0
    rebuilt = np.asarray(rot.from_vector_part(jnp.asarray(q[:, 1:4])))
    np.testing.assert_allclose(rebuilt, q, atol=1e-5)
