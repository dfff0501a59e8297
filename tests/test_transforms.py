"""Geometry math unit tests: quaternion/matrix round trips, euler, rotation."""

import numpy as np
import pytest

from neuman_tpu.geometry import transforms


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return transforms.quaternion_matrix(q), q


def test_quaternion_matrix_identity():
    np.testing.assert_allclose(
        transforms.quaternion_matrix([1, 0, 0, 0]), np.eye(4), atol=1e-12
    )


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        m, q = random_rotation(rng)
        q2 = transforms.quaternion_from_matrix(m)
        # q and -q are the same rotation
        assert np.allclose(q2, q, atol=1e-9) or np.allclose(q2, -q, atol=1e-9)
        m2 = transforms.quaternion_matrix(q2)
        np.testing.assert_allclose(m2, m, atol=1e-9)


def test_rotation_matrix_axis_angle():
    m = transforms.rotation_matrix(np.pi / 2, [0, 0, 1])
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # rotation about a point keeps the point fixed
    p = np.array([1.0, 2.0, 3.0])
    m = transforms.rotation_matrix(0.7, [0, 1, 0], point=p)
    np.testing.assert_allclose((m @ np.append(p, 1))[:3], p, atol=1e-12)


def test_rotation_matrix_orthonormal():
    rng = np.random.default_rng(1)
    for _ in range(20):
        axis = rng.normal(size=3)
        angle = rng.uniform(-np.pi, np.pi)
        r = transforms.rotation_matrix(angle, axis)[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(r), 1.0)


def test_euler_matrix_sxyz():
    # Rx only
    m = transforms.euler_matrix(np.pi / 2, 0, 0)
    np.testing.assert_allclose(m[:3, :3] @ [0, 1, 0], [0, 0, 1], atol=1e-12)
    # composition order: Rz @ Ry @ Rx
    ai, aj, ak = 0.3, -0.5, 1.1
    m = transforms.euler_matrix(ai, aj, ak)
    rx = transforms.rotation_matrix(ai, [1, 0, 0])
    ry = transforms.rotation_matrix(aj, [0, 1, 0])
    rz = transforms.rotation_matrix(ak, [0, 0, 1])
    np.testing.assert_allclose(m, rz @ ry @ rx, atol=1e-12)


def test_angle_between_vectors():
    assert np.isclose(
        transforms.angle_between_vectors([1, 0, 0], [0, 1, 0]), np.pi / 2
    )
    assert np.isclose(transforms.angle_between_vectors([1, 0, 0], [2, 0, 0]), 0.0)
    assert np.isclose(
        transforms.angle_between_vectors([1, 0, 0], [-1, 0, 0]), np.pi
    )


def test_translation_matrix():
    t = np.array([1.0, -2.0, 3.0])
    m = transforms.translation_matrix(t)
    np.testing.assert_allclose(transforms.translation_from_matrix(m), t)
    np.testing.assert_allclose((m @ [0, 0, 0, 1])[:3], t)


def test_unit_vector_raises_on_zero():
    with pytest.raises(ValueError):
        transforms.unit_vector([0, 0, 0])
