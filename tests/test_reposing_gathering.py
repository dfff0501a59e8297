"""Reposing + telegathering tests (in-process, synthetic AMASS mocap)."""

import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


@pytest.fixture(scope="module")
def mocap_npz(tmp_path_factory):
    """Synthetic AMASS-format motion: poses [T, 156], trans [T, 3]."""
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("mocap") / "motion_poses.npz"
    t = 12
    np.savez(
        str(path),
        poses=rng.normal(size=(t, 156)).astype(np.float64) * 0.1,
        trans=rng.normal(size=(t, 3)).astype(np.float64) * 0.1,
    )
    return str(path)


@pytest.fixture(scope="module")
def scene(synthetic_scene_dir, smpl_data_root):
    from neuman_tpu.data_io import neuman

    return neuman.NeuManReader.read_scene(
        synthetic_scene_dir, normalize=True, smpl_type="optimized"
    )


def _opt(scene_dir, mocap_path):
    from neuman_tpu.options.config import NeuManConfig

    cfg = NeuManConfig(
        nerf_depth=2, nerf_width=32, pos_N_freqs=4, pos_max_freq=3,
        dir_N_freqs=2, dir_max_freq=1, samples_per_ray=8,
        importance_samples_per_ray=8, rays_per_batch=128,
        scene_dir=scene_dir, motion_name="test_motion",
        mocap_path=mocap_path, mocap_start=0, mocap_end=6, mocap_skip=2,
        offset_scale=1.0,
    )
    return cfg


def test_read_human_poses_from_mocap(scene, mocap_npz, synthetic_scene_dir):
    import render_reposing

    opt = _opt(synthetic_scene_dir, mocap_npz)
    raw_verts, ts_list = render_reposing.read_human_poses(opt, scene)
    assert len(raw_verts) == 3  # frames 0, 2, 4
    assert raw_verts[0].shape == (128, 3)
    # no concat_joints in the reposing path (ref render_reposing.py:97-104)
    assert ts_list[0].shape == (128, 4, 4)
    assert np.isfinite(raw_verts[0]).all()
    # different mocap frames give different posed verts
    assert not np.allclose(raw_verts[0], raw_verts[1])


def test_read_novel_caps_default_dolly(scene, mocap_npz, synthetic_scene_dir):
    import render_reposing

    opt = _opt(synthetic_scene_dir, mocap_npz)
    caps = render_reposing.read_novel_caps(opt, 3, scene)
    assert len(caps) == 3
    c0 = caps[0].cam_pose.camera_center_in_world
    c2 = caps[2].cam_pose.camera_center_in_world
    assert np.linalg.norm(c2 - c0) > 0.05  # camera dollies


def test_reposed_hybrid_render(scene, mocap_npz, synthetic_scene_dir):
    """End-to-end: mocap pose -> warp transforms -> hybrid render."""
    import render_reposing
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer

    opt = _opt(synthetic_scene_dir, mocap_npz)
    raw_verts, ts_list = render_reposing.read_human_poses(opt, scene)
    caps = render_reposing.read_novel_caps(opt, len(raw_verts), scene)
    spec = hn.build_human_nerf_spec(opt)
    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    out = renderer.render_hybrid_nerf(
        spec, params, caps[0], raw_verts[0], scene.faces, ts_list[0],
        rays_per_batch=128, samples_per_ray=8, importance_samples_per_ray=8,
        geo_threshold=0.3, knn_k=4,
    )
    assert out.shape == (*caps[0].shape, 3)
    assert np.isfinite(out).all()


def test_gathering_multi_actor_composite(scene, mocap_npz, synthetic_scene_dir):
    """Multi-actor telegathering composite with two synthetic actors."""
    import render_gathering
    import render_reposing
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer

    opt = _opt(synthetic_scene_dir, mocap_npz)
    raw_verts, ts_list = render_reposing.read_human_poses(opt, scene)
    caps = render_gathering.read_novel_caps(opt, len(raw_verts), scene)
    assert len(caps) == len(raw_verts)

    spec = hn.build_human_nerf_spec(opt)
    p1 = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    p2 = hn.init_human_nerf_params(jax.random.PRNGKey(1), spec)
    out = renderer.render_hybrid_nerf_multi_persons(
        spec, p1, caps[0], [spec, spec], [p1, p2],
        [raw_verts[0], raw_verts[1] + 0.3],
        [scene.faces, scene.faces], [ts_list[0], ts_list[1]],
        rays_per_batch=128, samples_per_ray=8, importance_samples_per_ray=8,
        geo_threshold=0.3, knn_k=4,
    )
    assert out.shape == (*caps[0].shape, 3)
    assert np.isfinite(out).all()


def test_gathering_manual_alignment_presets():
    import render_gathering

    t, r, s = render_gathering.get_manual_alignment("dance_together", "seattle")
    assert s == 0.2
    np.testing.assert_allclose(t, [0, 0.15, 0.77])
    t, r, s = render_gathering.get_manual_alignment("other", "unknown")
    assert s == 1
