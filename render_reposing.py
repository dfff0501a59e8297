#!/usr/bin/env python
"""Repose the reconstructed human with AMASS (SFU) mocap sequences.

CLI parity with the reference render_reposing.py: loads an AMASS `.npz`
motion (poses[start:end:skip], hand joints zeroed), applies the per-scene
manual alignment (translation/rotation/scale hard-coded per scene+motion,
as in the reference), builds per-frame `T_da2scene` through the mocap pose,
dollies novel cameras, and renders with the hybrid renderer.
"""

import copy
import os

import numpy as np


def read_novel_caps(opt, num_caps, scene):
    novel_caps = []
    if os.path.basename(opt.scene_dir) == "bike" and opt.motion_name == "jumpandroll":
        start_id = 25
        interval = 0.05
        for i in range(num_caps):
            temp = copy.deepcopy(scene.captures[start_id])
            temp.cam_pose.camera_center_in_world = (
                temp.cam_pose.camera_center_in_world
                + interval * i * temp.cam_pose.right
            )
            novel_caps.append(temp)
    else:
        # default: dolly the middle capture sideways
        start_id = len(scene.captures) // 2
        for i in range(num_caps):
            temp = copy.deepcopy(scene.captures[start_id])
            temp.cam_pose.camera_center_in_world = (
                temp.cam_pose.camera_center_in_world
                + 0.05 * i * temp.cam_pose.right
            )
            novel_caps.append(temp)
    return novel_caps


def get_mocap_path(opt):
    if os.path.basename(opt.scene_dir) == "bike" and opt.motion_name == "jumpandroll":
        return "./data/SFU/0012/0012_JumpAndRoll001_poses.npz", 100, 400, 30
    raise ValueError("Define new elif branch")


def get_manual_alignment(opt):
    if os.path.basename(opt.scene_dir) == "bike" and opt.motion_name == "jumpandroll":
        manual_trans = np.array([0.08, 0.12, 0.4])
        manual_rot = np.array([95.8, 10.4, 1.8]) / 180 * np.pi
        manual_scale = 0.14
    else:
        manual_trans = np.array([0, 0, 0])
        manual_rot = np.array([0, 0, 0], dtype=np.float64)
        manual_scale = 1
    return manual_trans, manual_rot, manual_scale


def read_human_poses(opt, scene, mocap_path=None, start=None, end=None, skip=None):
    """Per-frame (posed verts in scene space, T_da2scene stacks) from mocap
    (parity with render_reposing.py:62-124)."""
    import jax.numpy as jnp

    from neuman_tpu.data_io import neuman
    from neuman_tpu.geometry import transforms
    from neuman_tpu.models import smpl as smpl_module

    if mocap_path is None:
        if opt.mocap_path is not None:
            mocap_path = opt.mocap_path
            start, end, skip = opt.mocap_start, opt.mocap_end, opt.mocap_skip
            if end == -1:
                end = None
        else:
            mocap_path, start, end, skip = get_mocap_path(opt)
    motions = np.load(mocap_path)
    poses = motions["poses"][start:end:skip]
    poses = poses[:, :72]
    poses[:, 66:] = 0  # zero the hands
    trans = motions["trans"][start:end:skip]
    beta = scene.smpls[0]["betas"]

    body_model = neuman.NeuManReader._body_model()

    manual_trans, manual_rot, manual_scale = get_manual_alignment(opt)
    m_r = transforms.euler_matrix(*manual_rot)
    m_s = np.eye(4)
    m_s[:3, :3] *= manual_scale
    m_t = transforms.translation_matrix(manual_trans)
    t_mocap2scene = m_t @ m_s @ m_r

    da_smpl = smpl_module.da_pose_vector(body_model.num_joints)

    raw_verts, ts_list = [], []
    for i, p in enumerate(poses):
        _, t_t2mocap = smpl_module.verts_transformations(
            body_model,
            poses=np.asarray(p[None], dtype=np.float32),
            betas=np.asarray(beta[None], dtype=np.float32),
            transl=jnp.asarray(trans[i][None], dtype=jnp.float32),
        )
        t_t2mocap = np.asarray(t_t2mocap[0])
        t_t2scene = t_mocap2scene[None] @ t_t2mocap
        _, t_t2da = smpl_module.verts_transformations(
            body_model,
            poses=da_smpl,
            betas=np.asarray(beta[None], dtype=np.float32),
        )
        t_t2da = np.asarray(t_t2da[0])
        t_da2scene = t_t2scene @ np.linalg.inv(t_t2da)
        static_verts, _ = smpl_module.smpl_forward(
            body_model, da_smpl, np.asarray(beta[None], dtype=np.float32)
        )
        static_verts = np.asarray(static_verts[0])
        verts = np.einsum(
            "BNi,Bi->BN",
            t_da2scene,
            neuman.to_homogeneous(static_verts),
        )[:, :3].astype(np.float32)
        raw_verts.append(verts)
        ts_list.append(t_da2scene)
    return raw_verts, ts_list


def main(opt):
    import imageio.v2 as imageio

    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer
    from neuman_tpu.parallel.mesh import resolve_mesh as _resolve_mesh
    from render_360 import load_net
    from train import auto_geo_threshold

    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir, tgt_size=opt.render_size, normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale, smpl_type="optimized",
    )
    geo_threshold, _ = auto_geo_threshold(scene)

    raw_verts, ts_list = read_human_poses(opt, scene)
    caps = read_novel_caps(opt, len(raw_verts), scene)
    spec = hn.build_human_nerf_spec(opt)
    params = load_net(opt, spec)
    mesh = _resolve_mesh(opt)

    for i in range(len(raw_verts)):
        out = renderer.render_hybrid_nerf(
            spec, params, caps[i], raw_verts[i], scene.faces, ts_list[i],
            rays_per_batch=opt.rays_per_batch,
            samples_per_ray=opt.samples_per_ray,
            importance_samples_per_ray=opt.importance_samples_per_ray,
            geo_threshold=geo_threshold,
            use_pallas=opt.use_pallas,
            knn_stride=getattr(opt, "knn_stride", 1),
            mesh=mesh,
        )
        save_path = os.path.join(
            "./demo", f"reposing/{os.path.basename(opt.scene_dir)}",
            f"out_{str(i).zfill(4)}.png",
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        imageio.imwrite(save_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"image saved: {save_path}")


if __name__ == "__main__":
    from neuman_tpu.options import config as config_module

    cfg = config_module.NeuManConfig(offset_scale=1.0, geo_threshold=-1.0)
    opt = config_module.from_cli(mode_aware=False, base=cfg)
    main(opt)
