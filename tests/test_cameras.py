"""Camera model tests: pinhole intrinsics, pose round trips, projection."""

import numpy as np

from neuman_tpu.cameras.pinhole import PinholeCamera, resize_pinhole_camera
from neuman_tpu.cameras.pose import CameraPose
from neuman_tpu.geometry import pcd, transforms
from neuman_tpu.geometry.rotation import Rotation, Translation


def make_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3).astype(np.float32)
    return CameraPose(Translation(t), Rotation(q))


def test_pinhole_intrinsics():
    cam = PinholeCamera(640, 480, 500.0, 510.0, 320.0, 240.0)
    k = cam.intrinsic_matrix
    assert k.shape == (3, 3)
    assert k[0, 0] == 500.0 and k[1, 1] == 510.0
    assert cam.shape == (480, 640)


def test_resize_pinhole_camera():
    cam = PinholeCamera(640, 480, 500.0, 510.0, 320.0, 240.0)
    small = resize_pinhole_camera(cam, (240, 320))
    assert small.width == 320 and small.height == 240
    assert np.isclose(small.fx, 250.0) and np.isclose(small.fy, 255.0)
    assert np.isclose(small.cx, 160.0) and np.isclose(small.cy, 120.0)


def test_pose_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pose = make_pose(rng)
        w2c = pose.world_to_camera
        c2w = pose.camera_to_world
        np.testing.assert_allclose(w2c @ c2w, np.eye(4), atol=1e-5)
        pose2 = CameraPose.from_world_to_camera(w2c)
        np.testing.assert_allclose(
            pose2.world_to_camera, w2c, atol=1e-5
        )
        pose3 = CameraPose.from_camera_to_world(c2w)
        np.testing.assert_allclose(pose3.camera_to_world, c2w, atol=1e-4)


def test_camera_center_setter():
    rng = np.random.default_rng(1)
    pose = make_pose(rng)
    new_center = np.array([1.0, 2.0, 3.0])
    old_rot = pose.rotation_matrix.copy()
    pose.camera_center_in_world = new_center
    np.testing.assert_allclose(pose.camera_center_in_world, new_center, atol=1e-5)
    np.testing.assert_allclose(pose.rotation_matrix[:3, :3], old_rot[:3, :3], atol=1e-5)


def test_camera_axes_orthonormal():
    rng = np.random.default_rng(2)
    pose = make_pose(rng)
    f, u, r = pose.forward, pose.up, pose.right
    assert np.isclose(np.dot(f, u), 0, atol=1e-6)
    assert np.isclose(np.dot(f, r), 0, atol=1e-6)
    assert np.isclose(np.linalg.norm(f), 1, atol=1e-6)


def test_project_unproject_roundtrip():
    cam = PinholeCamera(64, 48, 50.0, 50.0, 32.0, 24.0)
    rng = np.random.default_rng(3)
    pose = make_pose(rng)
    # world points guaranteed in front of the camera
    depths = rng.uniform(1.0, 5.0, size=(100, 1))
    xy = rng.uniform([0, 0], [63, 47], size=(100, 2))
    world = pcd.pcd_2d_to_pcd_3d(
        xy, depths, cam.intrinsic_matrix, cam2world=pose.camera_to_world
    )
    reproj = pcd.pcd_3d_to_pcd_2d(
        world,
        cam.intrinsic_matrix,
        pose.extrinsic_matrix,
        (48, 64),
        keep_z=True,
        crop=False,
        norm_coord=False,
    )
    np.testing.assert_allclose(reproj[:, :2], xy, atol=1e-3)
    np.testing.assert_allclose(reproj[:, 2:3], depths, atol=1e-4)
