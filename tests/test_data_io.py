"""Scene IO integration tests on the synthetic scene fixture."""

import os

import numpy as np
import pytest

from neuman_tpu.data_io.colmap import ColmapAsciiReader
from neuman_tpu.data_io import neuman
from neuman_tpu.utils.misc import add_border_mask


def test_colmap_reader(synthetic_scene_dir):
    scene = ColmapAsciiReader.read_scene(
        os.path.join(synthetic_scene_dir, "sparse"),
        os.path.join(synthetic_scene_dir, "images"),
        order="video",
    )
    assert len(scene.captures) == 10
    assert scene.point_cloud.shape == (200, 6)
    cap = scene.captures[0]
    assert cap.frame_id == {"frame_id": 0, "total_frames": 10}
    assert cap.image.shape == (48, 64, 3)
    assert cap.pinhole_cam.width == 64
    # video order sorts by filename
    names = [os.path.basename(c.image_path) for c in scene.captures]
    assert names == sorted(names)


def test_colmap_depth_bin_roundtrip(tmp_path):
    from neuman_tpu.cameras.contents import read_colmap_depth_bin, write_colmap_depth_bin

    depth = np.random.default_rng(0).uniform(0.5, 4.0, size=(12, 17)).astype(np.float32)
    p = str(tmp_path / "d.bin")
    write_colmap_depth_bin(p, depth)
    out = read_colmap_depth_bin(p)
    np.testing.assert_allclose(out, depth, atol=1e-7)


@pytest.fixture(scope="module")
def scene(synthetic_scene_dir, smpl_data_root):
    return neuman.NeuManReader.read_scene(
        synthetic_scene_dir,
        normalize=True,
        bkg_range_scale=3.0,
        human_range_scale=1.5,
        smpl_type="optimized",
    )


def test_read_scene_basic(scene):
    assert len(scene.captures) == 10
    assert scene.scale > 0
    cap = scene.captures[0]
    assert "bkg" in cap.near and "bkg" in cap.far
    assert "human" in cap.near and "human" in cap.far
    assert cap.near["bkg"] < cap.far["bkg"]
    assert cap.near["human"] < cap.far["human"]


def test_scene_normalization(scene):
    # 95th percentile of bkg far planes maps to ~3.14
    fars = np.array([cap.far["bkg"] for cap in scene.captures])
    assert np.isclose(np.percentile(fars, 95), 3.14, atol=0.05)
    # depth maps are scaled consistently with the cameras
    assert np.isclose(scene.captures[0].captured_depth.scale, scene.scale)


def test_read_smpls(scene):
    assert len(scene.smpls) == 10
    assert len(scene.verts) == 10
    assert scene.verts[0].shape == (128, 3)
    assert scene.static_vert[0].shape == (128, 3)
    # per-vertex (+joints) Da-pose->scene transforms, [V+J, 4, 4]
    assert scene.Ts[0].shape == (128 + 24, 4, 4)
    assert scene.smpls[0]["joints_3d"].shape == (24, 3)
    # identity alignment + Da-pose: world verts = scale * T_da2pose(da_verts)
    assert np.isfinite(scene.verts[0]).all()


def test_masks_and_fused_depth(scene):
    cap = scene.captures[0]
    mask = cap.mask
    assert mask.sum() > 0  # human present
    assert (mask == 0).sum() > 0  # background present
    binary = cap.binary_mask
    assert set(np.unique(binary)).issubset({0, 1})
    fused = cap.fused_depth_map
    assert fused.shape == cap.shape
    assert np.isfinite(fused).all()


def test_border_mask(scene):
    add_border_mask(scene, iterations=2)
    cap = scene.captures[0]
    assert cap.border_mask.sum() > 0
    # ring does not overlap the human
    assert (cap.border_mask * cap.binary_mask).sum() == 0


def test_create_split_files(synthetic_scene_dir, smpl_data_root):
    train, val, test = neuman.create_split_files(synthetic_scene_dir)
    train_list = neuman.read_text(train)
    val_list = neuman.read_text(val)
    test_list = neuman.read_text(test)
    assert len(train_list) == 8
    assert len(val_list) == 1
    assert len(test_list) == 1
    assert not (set(train_list) & set(val_list))
    assert not (set(train_list) & set(test_list))


def test_resized_scene(synthetic_scene_dir, smpl_data_root):
    scene = neuman.NeuManReader.read_scene(
        synthetic_scene_dir, tgt_size=(24, 32), normalize=True, smpl_type="optimized"
    )
    cap = scene.captures[0]
    assert cap.image.shape == (24, 32, 3)
    assert cap.mask.shape == (24, 32)
    assert cap.pinhole_cam.width == 32
