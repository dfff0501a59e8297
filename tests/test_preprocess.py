"""Preprocess math tests: plane RANSAC, translation refinement, scale solve,
SMPL pose refinement, rasterizer overlay."""

import numpy as np
import pytest

from neuman_tpu.preprocess import alignment


def test_ransac_plane_recovers_ground():
    rng = np.random.default_rng(0)
    n = 500
    xy = rng.uniform(-2, 2, size=(n, 2))
    ground = np.concatenate(
        [xy, (0.5 + 0.002 * rng.normal(size=(n, 1)))], axis=1
    )  # z ~= 0.5
    outliers = rng.uniform(-2, 2, size=(150, 3))
    pts = np.concatenate([ground, outliers])
    model, inliers = alignment.ransac_plane(pts, 0.02, 500)
    a, b, c, d = model
    # plane z = 0.5 -> normal +-(0,0,1), d = -+0.5
    assert abs(abs(c) - 1.0) < 0.01
    assert abs(abs(d) - 0.5) < 0.02
    assert len(inliers) > 400


def test_solve_translation_recovers_shift():
    rng = np.random.default_rng(1)
    k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    mvp = k @ np.eye(4)[:3]  # identity extrinsics
    true_t = np.array([0.05, -0.08, 0.1])
    p3d = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 3.0], size=(24, 3))
    shifted = p3d + true_t
    cam = shifted @ mvp[:3, :3].T + mvp[:, 3]
    p2d = cam[:, :2] / cam[:, 2:3]
    t = alignment.solve_translation(
        p3d.astype(np.float32), p2d.astype(np.float32), mvp.astype(np.float32),
        total_iters=2000, lr=5e-3,
    )
    np.testing.assert_allclose(t[0], true_t, atol=0.02)


def test_solve_scale():
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation

    cam = PinholeCamera(64, 48, 50, 50, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    # camera at origin; ground plane y = -1 (normal (0,1,0), d=1)
    plane = np.array([0.0, 1.0, 0.0, 1.0])
    # a joint halfway to the plane along -y: scale should be 2
    joints = np.array([[0.0, -0.5, 1.0]])
    s = alignment.solve_scale(joints, cap, plane)
    assert np.isclose(s, 2.0, atol=1e-6)


def test_optimize_smpl_runs(smpl_data_root):
    import jax.numpy as jnp

    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.data_io.neuman import NeuManReader
    from neuman_tpu.preprocess.optimize_smpl import optimize_smpl_frame

    body_model = NeuManReader._body_model()
    rng = np.random.default_rng(0)
    cam = PinholeCamera(64, 48, 40, 40, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 2.5], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    cap.binary_mask = np.zeros((48, 64), np.uint8)
    cap.binary_mask[16:32, 24:40] = 1
    cap.keypoints = rng.uniform([5, 5, 0.5], [60, 44, 1.0], size=(17, 3))
    cap.densepose = np.arange(25)  # everything visible

    frame = {
        "pose": rng.normal(size=(72,)).astype(np.float32) * 0.1,
        "betas": rng.normal(size=(10,)).astype(np.float32) * 0.1,
    }
    out = optimize_smpl_frame(
        cap, frame, body_model, np.eye(4), scale=1.0, num_iters=3
    )
    assert out.shape == (72,)
    assert np.isfinite(out).all()
    # gradient-gated joints must move only where allowed; pose changed somewhere
    assert not np.allclose(out, frame["pose"])


def test_coco_to_smpl_mapping():
    from neuman_tpu.preprocess.optimize_smpl import coco_to_smpl

    coco = np.arange(34, dtype=np.float64).reshape(17, 2)
    smpl = coco_to_smpl(coco)
    assert smpl.shape == (24, 2)
    np.testing.assert_allclose(smpl[1], coco[11])
    np.testing.assert_allclose(smpl[21], coco[10])
    assert smpl[0].sum() == 0  # pelvis unmapped


def test_rasterizer_overlay():
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.cameras.pose import CameraPose
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.geometry.rotation import Rotation, Translation
    from neuman_tpu.render.rasterize import overlay_smpl, rasterize_mesh

    cam = PinholeCamera(64, 48, 60, 60, 32, 24)
    pose = CameraPose(
        Translation(np.array([0, 0, 3.0], dtype=np.float32)),
        Rotation(np.array([1.0, 0, 0, 0])),
    )
    cap = ResizedPinholeCapture(cam, pose, (48, 64))
    # a quad in front of the camera (two triangles)
    verts = np.array(
        [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.5, 0.5, 0.0], [-0.5, 0.5, 0.0]]
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    rgba = rasterize_mesh(verts, faces, cap)
    assert rgba.shape == (48, 64, 4)
    assert rgba[..., 3].sum() > 50  # quad covers pixels
    assert rgba[24, 32, 3] == 1.0  # center covered
    assert rgba[2, 2, 3] == 0.0  # corner not covered

    img = np.full((48, 64, 3), 255, np.uint8)
    out = overlay_smpl(img, verts, np.concatenate([faces, faces], axis=1), cap)
    assert out.shape == (48, 64, 3)
    assert (out[24, 32] != 255).any()  # mesh visible at center
