"""World<->camera extrinsics stored as (translation, rotation).

Parity with the reference cameras/camera_pose.py:15-114. Rotation/translation
are world-to-camera; helpers expose both directions plus camera axes.
"""

import numpy as np

from neuman_tpu.geometry import transforms
from neuman_tpu.geometry.rotation import Rotation, Translation, UnstableRotation


class CameraPose:
    def __init__(self, t: Translation, r):
        assert isinstance(t, Translation)
        assert isinstance(r, (Rotation, UnstableRotation))
        self.t = t
        self.r = r

    def __str__(self):
        return f"translation: {self.t}, rotation: {self.r}"

    @classmethod
    def from_world_to_camera(cls, world_to_camera, unstable=False):
        world_to_camera = np.asarray(world_to_camera)
        assert world_to_camera.shape == (4, 4)
        t = Translation(
            transforms.translation_from_matrix(world_to_camera).astype(np.float32)
        )
        if unstable:
            r = UnstableRotation(world_to_camera)
        else:
            r = Rotation(
                transforms.quaternion_from_matrix(world_to_camera).astype(np.float32)
            )
        return cls(t, r)

    @classmethod
    def from_camera_to_world(cls, camera_to_world, unstable=False):
        camera_to_world = np.asarray(camera_to_world)
        assert camera_to_world.shape == (4, 4)
        world_to_camera = np.linalg.inv(camera_to_world)
        world_to_camera /= world_to_camera[3, 3]
        return cls.from_world_to_camera(world_to_camera, unstable)

    @property
    def translation_vector(self):
        return self.t.translation_vector

    @property
    def translation_matrix(self):
        return self.t.translation_matrix

    @property
    def quaternion(self):
        return self.r.quaternion

    @property
    def rotation_matrix(self):
        return self.r.rotation_matrix

    @property
    def world_to_camera(self):
        m = self.translation_matrix @ self.rotation_matrix
        m /= m[3, 3]
        return m

    @property
    def world_to_camera_3x4(self):
        return self.world_to_camera[0:3, 0:4]

    @property
    def extrinsic_matrix(self):
        return self.world_to_camera_3x4

    @property
    def camera_to_world(self):
        m = np.linalg.inv(self.world_to_camera)
        m /= m[3, 3]
        return m

    @property
    def camera_to_world_3x4(self):
        return self.camera_to_world[0:3, 0:4]

    @property
    def camera_center_in_world(self):
        return self.camera_to_world[:3, 3]

    @camera_center_in_world.setter
    def camera_center_in_world(self, value):
        c2w = self.camera_to_world
        c2w[:3, 3] = value
        self.t = CameraPose.from_camera_to_world(c2w, unstable=True).t

    @property
    def forward(self):
        return self.camera_to_world[:3, 2]

    @property
    def up(self):
        return -self.camera_to_world[:3, 1]

    @property
    def right(self):
        return self.camera_to_world[:3, 0]
