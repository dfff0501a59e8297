#!/usr/bin/env python
"""Telegathering: render multiple reconstructed humans in one scene.

CLI parity with the reference render_gathering.py: loads per-actor trained
checkpoints (`ACTOR_WEIGHTS_DICT`), per-actor manual alignments, per-actor
betas from their optimized SMPL fits, drives all actors with one AMASS
motion, orbits an elliptical camera path, and composites with the
multi-person hybrid renderer.
"""

import copy
import os

import numpy as np

ACTOR_WEIGHTS_DICT = {
    "seattle": "seattle_human",
    "citron": "citron_human",
    "parkinglot": "parkinglot_human",
}


def read_novel_caps(opt, num_caps, scene):
    novel_caps = []
    base_id = min(20, len(scene.captures) - 1)
    for i in range(num_caps):
        cap = copy.deepcopy(scene.captures[base_id])
        ellipse_a, ellipse_b = 0.15, 0.05
        x_off = cap.cam_pose.right * ellipse_a * np.cos((i / num_caps) * (4 * np.pi))
        y_off = cap.cam_pose.up * ellipse_b * np.sin((i / num_caps) * (4 * np.pi))
        cap.cam_pose.camera_center_in_world = (
            cap.cam_pose.camera_center_in_world + x_off + y_off
        )
        novel_caps.append(cap)
    return novel_caps


def get_mocap_path(motion_name, actor_name=None):
    if motion_name == "dance_together":
        return "./data/SFU/0018/0018_XinJiang002_poses.npz", 0, 800, 4
    raise ValueError("Define new elif branch")


def get_manual_alignment(motion_name, actor_name):
    presets = {
        ("dance_together", "seattle"): ([0, 0.15, 0.77], [90.4, -10.9, 4], 0.2),
        ("dance_together", "citron"): ([-0.36, 0.13, 0.92], [90, -9.4, 4], 0.2),
        ("dance_together", "parkinglot"): ([0.32, 0.12, 0.96], [90, -11.6, 4], 0.2),
    }
    if (motion_name, actor_name) in presets:
        t, r, s = presets[(motion_name, actor_name)]
        return np.array(t), np.array(r) / 180 * np.pi, s
    return np.array([0, 0, 0]), np.zeros(3), 1


def read_actor(opt, actor_name):
    import jax
    import joblib

    from neuman_tpu.data_io import neuman
    from neuman_tpu.geometry import transforms
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.models import smpl as smpl_module
    from neuman_tpu.trainers import checkpoint as ckpt

    spec = hn.build_human_nerf_spec(opt)
    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    weights_path = f"./out/{ACTOR_WEIGHTS_DICT[actor_name]}/checkpoint.npz"
    data = ckpt.load_checkpoint(weights_path)
    params, _ = ckpt.safe_merge_params(params, data["hybrid_model"])

    mocap_path, start_idx, end_idx, skip = get_mocap_path(opt.motion_name)
    motions = np.load(mocap_path)
    poses = motions["poses"][start_idx:end_idx:skip]
    poses = poses[:, :72]
    poses[:, 66:] = 0
    trans = motions["trans"][start_idx:end_idx:skip]
    smpl_path = os.path.join(
        os.path.join(os.path.dirname(opt.scene_dir), actor_name),
        "smpl_output_optimized.pkl",
    )
    raw_smpl = joblib.load(smpl_path)
    raw_smpl = raw_smpl[list(raw_smpl.keys())[0]]
    beta = np.array(raw_smpl["betas"]).mean(0)

    body_model = neuman.NeuManReader._body_model()

    manual_trans, manual_rot, manual_scale = get_manual_alignment(
        opt.motion_name, actor_name
    )
    m_r = transforms.euler_matrix(*manual_rot)
    m_s = np.eye(4)
    m_s[:3, :3] *= manual_scale
    m_t = transforms.translation_matrix(manual_trans)
    t_mocap2scene = m_t @ m_s @ m_r

    da_smpl = smpl_module.da_pose_vector(body_model.num_joints)
    raw_verts, ts_list = [], []
    for i, p in enumerate(poses):
        import jax.numpy as jnp

        _, t_t2mocap = smpl_module.verts_transformations(
            body_model,
            poses=np.asarray(p[None], dtype=np.float32),
            betas=np.asarray(beta[None], dtype=np.float32),
            transl=jnp.asarray(trans[i][None], dtype=jnp.float32),
        )
        t_t2scene = t_mocap2scene[None] @ np.asarray(t_t2mocap[0])
        _, t_t2da = smpl_module.verts_transformations(
            body_model, poses=da_smpl, betas=np.asarray(beta[None], dtype=np.float32)
        )
        t_da2scene = t_t2scene @ np.linalg.inv(np.asarray(t_t2da[0]))
        static_verts, _ = smpl_module.smpl_forward(
            body_model, da_smpl, np.asarray(beta[None], dtype=np.float32)
        )
        verts = np.einsum(
            "BNi,Bi->BN", t_da2scene,
            neuman.to_homogeneous(np.asarray(static_verts[0])),
        )[:, :3].astype(np.float32)
        raw_verts.append(verts)
        ts_list.append(t_da2scene)
    return spec, params, raw_verts, ts_list


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

    actors = [read_actor(opt, a) for a in opt.actors]
    num_frames = len(actors[0][2])
    caps = read_novel_caps(opt, num_frames, scene)

    bkg_spec = hn.build_human_nerf_spec(opt)
    bkg_params = load_net(opt, bkg_spec)
    mesh = _resolve_mesh(opt)

    for i in range(len(caps)):
        out = renderer.render_hybrid_nerf_multi_persons(
            bkg_spec, bkg_params, caps[i],
            [a[0] for a in actors],
            [a[1] for a in actors],
            [a[2][i] for a in actors],
            [scene.faces] * len(actors),
            [a[3][i] for a in actors],
            rays_per_batch=opt.rays_per_batch,
            samples_per_ray=opt.samples_per_ray,
            importance_samples_per_ray=opt.importance_samples_per_ray,
            geo_threshold=geo_threshold,
            use_pallas=opt.use_pallas,
            knn_stride=getattr(opt, "knn_stride", 1),
            mesh=mesh,
        )
        save_path = os.path.join(
            "./demo", f"gathering/{opt.motion_name}", f"out_{str(i).zfill(4)}.png"
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        imageio.imwrite(save_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"image saved: {save_path}")


if __name__ == "__main__":
    import argparse

    from neuman_tpu.options import config as config_module

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument(
        "--actors", nargs="*", type=str,
        default=["seattle", "citron", "parkinglot"],
    )
    known, rest = pre.parse_known_args()
    cfg = config_module.NeuManConfig(
        offset_scale=1.0, geo_threshold=-1.0, motion_name="dance_together"
    )
    opt = config_module.from_cli(rest, mode_aware=False, base=cfg)
    opt.actors = known.actors
    main(opt)
