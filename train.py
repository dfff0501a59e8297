#!/usr/bin/env python
"""Two-stage NeuMan training CLI (TPU-native).

CLI parity with the reference train.py:157-266: `--train_mode=bkg` trains
the background scene NeRF; `--train_mode=smpl_only|smpl_and_offset` trains
the human canonical NeRF with learnable SMPL (+ offset nets), loading the
pretrained background via `--load_background`. Flags keep the reference
names and mode-dependent defaults; the full config is persisted to
`out/<name>/params.json`.
"""

import os

import numpy as np


def auto_geo_threshold(scene):
    """Mean hip-to-pelvis bone length (ref: train.py:90-96)."""
    bones, can_bones = [], []
    for i in range(len(scene.captures)):
        bones.append(
            np.linalg.norm(
                scene.smpls[i]["joints_3d"][3] - scene.smpls[i]["joints_3d"][0]
            )
        )
        can_bones.append(
            np.linalg.norm(
                scene.smpls[i]["static_joints_3d"][3]
                - scene.smpls[i]["static_joints_3d"][0]
            )
        )
    return float(np.mean(bones)), float(np.mean(can_bones))


def load_lpips_params(opt):
    path = getattr(opt, "lpips_weights", None) or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "data", "lpips_alex.npz"
    )
    if os.path.isfile(path):
        from neuman_tpu.trainers.checkpoint import load_checkpoint

        return load_checkpoint(path)
    if getattr(opt, "lpips_weights", None):
        raise FileNotFoundError(f"--lpips_weights {path} does not exist")
    return None


def train_background(opt):
    import jax

    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import nerf as nerf_module
    from neuman_tpu.trainers.background import NeRFTrainer
    from neuman_tpu.utils.misc import add_border_mask

    assert opt.bkg_rays_ratio == 1
    train_split, val_split, _ = neuman.create_split_files(opt.scene_dir)
    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir,
        tgt_size=opt.tgt_size,
        normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale,
    )
    scene.read_data_to_ram(data_list=["image", "depth"])
    add_border_mask(scene, iterations=opt.dilation)

    train_views = [
        scene.fname_to_index_dict[f] for f in neuman.read_text(train_split)
    ]
    val_views = [scene.fname_to_index_dict[f] for f in neuman.read_text(val_split)]

    spec = nerf_module.build_nerf_specs(opt)
    key = jax.random.PRNGKey(opt.seed)
    params = {
        "coarse": nerf_module.init_nerf_params(key, spec.nerf),
        "fine": nerf_module.init_nerf_params(jax.random.fold_in(key, 1), spec.nerf),
    }
    trainer = NeRFTrainer(opt, spec, params, scene, train_views, val_views)
    trainer.train()


def train_human(opt):
    import jax

    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.trainers import checkpoint as ckpt
    from neuman_tpu.trainers.human import HumanNeRFTrainer
    from neuman_tpu.utils.misc import add_border_mask, add_mesh_cache

    train_split, val_split, _ = neuman.create_split_files(opt.scene_dir)
    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir,
        tgt_size=opt.tgt_size,
        normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale,
        mask_dir=opt.mask_dir,
        smpl_type=opt.smpl_type,
    )
    if opt.geo_threshold < 0:
        opt.geo_threshold, can_bone = auto_geo_threshold(scene)
    else:
        _, can_bone = auto_geo_threshold(scene)
    scene.read_data_to_ram(data_list=["image"])
    add_border_mask(scene, iterations=opt.dilation)
    add_mesh_cache(scene)

    poses = np.stack([s["pose"] for s in scene.smpls])
    betas = np.stack([s["betas"] for s in scene.smpls])
    raw_alignments = np.load(
        os.path.join(opt.scene_dir, "alignments.npy"), allow_pickle=True
    ).item()
    alignments = np.stack(
        [
            raw_alignments[os.path.basename(cap.image_path)]
            for cap in scene.captures
        ]
    )
    alignments2 = np.stack([np.eye(4)] * alignments.shape[0])
    alignments2[..., :3] = alignments

    body_model = neuman.NeuManReader._body_model()
    spec = hn.build_human_nerf_spec(opt)
    params = hn.init_human_nerf_params(
        jax.random.PRNGKey(opt.seed), spec, poses.copy(), betas.copy(),
        alignments2.copy(),
    )

    # pretrained background (ref: human_nerf.py:53-61)
    if opt.load_background:
        bkg_path = os.path.join(opt.out_dir, opt.load_background, "checkpoint.npz")
        try:
            data = ckpt.load_checkpoint(bkg_path)
            params["coarse_bkg_net"], m1 = ckpt.safe_merge_params(
                params["coarse_bkg_net"], data["coarse_model"]
            )
            params["fine_bkg_net"], m2 = ckpt.safe_merge_params(
                params["fine_bkg_net"], data["fine_model"]
            )
            print(f"pretrained background model loaded from {bkg_path}")
        except Exception as e:
            print(e)
            print("train from scratch")
    # pretrained canonical volume (ref: human_nerf.py:63-74)
    if opt.load_can:
        can_path = os.path.join(opt.out_dir, opt.load_can, "checkpoint.npz")
        try:
            data = ckpt.load_checkpoint(can_path)
            params["coarse_human_net"], _ = ckpt.safe_merge_params(
                params["coarse_human_net"], data["hybrid_model"]["coarse_human_net"]
            )
            print(f"pretrained canonical human model loaded from {can_path}")
        except Exception as e:
            print(e)
            print("train from scratch")

    train_views = [
        scene.fname_to_index_dict[f] for f in neuman.read_text(train_split)
    ]
    val_views = [scene.fname_to_index_dict[f] for f in neuman.read_text(val_split)]

    assert opt.bkg_lr == 0
    if opt.train_mode == "smpl_only":
        assert opt.offset_scale == 0

    lpips_params = load_lpips_params(opt) if opt.penalize_lpips > 0 else None
    if opt.penalize_lpips > 0 and lpips_params is None:
        print("warning: no LPIPS weights at data/lpips_alex.npz; lpips loss off")

    trainer = HumanNeRFTrainer(
        opt, spec, params, scene, train_views, val_views, body_model,
        interval_comp=opt.geo_threshold / can_bone,
        lpips_params=lpips_params,
    )
    trainer.train()


if __name__ == "__main__":
    from neuman_tpu.options import config as config_module
    from neuman_tpu.parallel.mesh import maybe_init_distributed

    # multi-host topologies must initialize the multi-process runtime before
    # the first backend touch so the data mesh spans every host's chips
    maybe_init_distributed()
    opt = config_module.from_cli()
    assert opt.scene_dir is not None, "--scene_dir is required"
    assert opt.normalize is True
    config_module.print_opt(opt)
    opt.save()
    if opt.train_mode == "bkg":
        train_background(opt)
    elif opt.train_mode in ("smpl_only", "smpl_and_offset"):
        train_human(opt)
    else:
        raise ValueError(opt.train_mode)
