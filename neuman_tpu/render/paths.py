"""Synthetic camera paths (host-side numpy).

Parity with the reference utils/render_utils.py:23-66 (`pose_spherical`,
`default_360_path`) used for canonical/posed 360 renders and validation
cameras.
"""

import numpy as np

from neuman_tpu.cameras.pose import CameraPose
from neuman_tpu.geometry import transforms


def _trans_t(t):
    m = np.eye(4)
    m[2, 3] = t
    return m


def _rot_phi(phi):
    m = np.eye(4)
    m[1, 1] = np.cos(phi)
    m[1, 2] = -np.sin(phi)
    m[2, 1] = np.sin(phi)
    m[2, 2] = np.cos(phi)
    return m


def _rot_theta(th):
    m = np.eye(4)
    m[0, 0] = np.cos(th)
    m[0, 2] = -np.sin(th)
    m[2, 0] = np.sin(th)
    m[2, 2] = np.cos(th)
    return m


def pose_spherical(theta, phi, radius):
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    c2w = (
        np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1.0]]) @ c2w
    )
    transf = np.array(
        [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1.0]]
    )
    c2w = c2w @ transf
    return CameraPose.from_camera_to_world(c2w, unstable=True)


def default_360_path(center, up, dist, res=40, rad=360):
    up2 = np.array([0, 0, 1])
    axis = np.cross(up, up2)
    angle = transforms.angle_between_vectors(up, up2)
    rot = transforms.rotation_matrix(-angle, axis)
    trans = transforms.translation_matrix(center)
    poses = [
        pose_spherical(a, 0, dist)
        for a in np.linspace(-rad / 2, rad / 2, res + 1)[:-1]
    ]
    return [
        CameraPose.from_camera_to_world(trans @ rot @ p.camera_to_world)
        for p in poses
    ]
