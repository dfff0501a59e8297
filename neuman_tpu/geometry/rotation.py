"""Rotation / translation value types (host-side, numpy).

Behavioral parity with the reference's geometry/basics.py:10-119:
- `Rotation` stores a validated unit quaternion (w, x, y, z).
- `UnstableRotation` stores a raw 4x4 rotation matrix without round-tripping
  through a quaternion (used for machine-generated camera paths whose matrices
  may be slightly non-orthonormal).
- `Translation` stores a 3-vector.
"""

import numpy as np

from neuman_tpu.geometry import transforms


class Rotation:
    def __init__(self, quat):
        self.quaternion = quat

    def __str__(self):
        return f"quaternion: {self.quaternion}"

    @classmethod
    def from_matrix(cls, mat):
        mat = np.asarray(mat)
        if mat.shape == (3, 3):
            m = np.eye(4)
            m[:3, :3] = mat
            mat = m
        assert mat.shape == (4, 4)
        quat = transforms.quaternion_from_matrix(mat).astype(np.float32)
        return cls(quat)

    @property
    def rotation_matrix(self):
        return transforms.quaternion_matrix(self.quaternion).astype(np.float32)

    @rotation_matrix.setter
    def rotation_matrix(self, mat):
        assert isinstance(mat, np.ndarray) and mat.shape == (4, 4)
        self.quaternion = transforms.quaternion_from_matrix(mat).astype(np.float32)

    @property
    def quaternion(self):
        return self._quaternion

    @quaternion.setter
    def quaternion(self, quat):
        quat = np.asarray(quat)
        assert quat.shape == (4,)
        n = np.linalg.norm(quat)
        if not np.isclose(n, 1.0):
            quat = quat / n
        self._quaternion = quat


class UnstableRotation:
    """Rotation stored as a raw matrix; translation part is zeroed."""

    def __init__(self, mat):
        mat = np.array(mat, dtype=np.float64)
        if mat.shape == (3, 3):
            m = np.eye(4)
            m[:3, :3] = mat
            mat = m
        assert mat.shape == (4, 4)
        mat[:3, 3] = 0
        self._rotation_matrix = mat

    def __str__(self):
        return f"rotation_matrix: {self.rotation_matrix}"

    @property
    def rotation_matrix(self):
        return self._rotation_matrix


class Translation:
    def __init__(self, vec):
        self.translation_vector = vec

    def __str__(self):
        return f"translation: {self.translation_vector}"

    @classmethod
    def from_matrix(cls, mat):
        assert mat.shape == (4, 4)
        return cls(transforms.translation_from_matrix(mat).astype(np.float32))

    @property
    def translation_matrix(self):
        return transforms.translation_matrix(self.translation_vector).astype(np.float32)

    @property
    def translation_vector(self):
        return self._translation_vector

    @translation_vector.setter
    def translation_vector(self, vec):
        vec = np.asarray(vec, dtype=np.float32)
        assert vec.shape == (3,)
        self._translation_vector = vec
