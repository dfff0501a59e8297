#!/usr/bin/env python
"""Render 360-degree orbits of the reconstructed human.

CLI parity with the reference render_360.py: `--mode canonical_360` orbits
the Da-posed human with a zoomed pinhole camera; `--mode posed_360` orbits
the posed human in scene space (warp enabled). Outputs PNG frames under
./demo/<mode>/<scene>/.

Example:
  python render_360.py --scene_dir ./data/bike --rays_per_batch=2048 \
      --weights_path ./out/bike_human/checkpoint.npz --render_h=72 \
      --render_w=128 --mode canonical_360 --can_posenc rotate
"""

import os

import numpy as np


def load_net(opt, spec):
    import jax

    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.trainers import checkpoint as ckpt

    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    data = ckpt.load_checkpoint(opt.weights_path)
    params, missing = ckpt.safe_merge_params(params, data["hybrid_model"])
    if missing:
        print(f"partial weight load; missing: {missing[:8]}...")
    return params


def main_canonical_360(opt):
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.cameras.pinhole import PinholeCamera
    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import paths, renderer
    from neuman_tpu.parallel.mesh import resolve_mesh as _resolve_mesh
    from neuman_tpu.utils.constants import (
        CANONICAL_CAMERA_DIST,
        CANONICAL_ZOOM_FACTOR,
    )
    from neuman_tpu.utils.misc import smpl_verts_to_center_and_up

    import imageio.v2 as imageio
    from train import auto_geo_threshold

    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir, tgt_size=opt.render_size, normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale,
    )
    geo_threshold, can_bone = auto_geo_threshold(scene)
    spec = hn.build_human_nerf_spec(opt)
    params = load_net(opt, spec)
    mesh = _resolve_mesh(opt)
    body_model = neuman.NeuManReader._body_model()

    center, up = smpl_verts_to_center_and_up(scene.static_vert[0], body_model)
    render_poses = paths.default_360_path(
        center, up, CANONICAL_CAMERA_DIST, opt.trajectory_resolution
    )
    base = scene.captures[0].pinhole_cam
    for i, rp in enumerate(render_poses):
        can_cap = ResizedPinholeCapture(
            PinholeCamera(
                base.width, base.height,
                CANONICAL_ZOOM_FACTOR * base.width,
                CANONICAL_ZOOM_FACTOR * base.width,
                base.width / 2.0, base.height / 2.0,
            ),
            rp, tgt_size=base.shape,
        )
        out = renderer.render_smpl_nerf(
            spec, params, can_cap, scene.static_vert[0], scene.faces, None,
            rays_per_batch=opt.rays_per_batch,
            samples_per_ray=opt.samples_per_ray, render_can=True,
            interval_comp=geo_threshold / can_bone,
            geo_threshold=geo_threshold,
            use_pallas=opt.use_pallas,
            knn_stride=getattr(opt, "knn_stride", 1),
            mesh=mesh,
        )
        save_path = os.path.join(
            "./demo", f"canonical_360/{os.path.basename(opt.scene_dir)}",
            f"out_{str(i).zfill(4)}.png",
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        imageio.imwrite(save_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"image saved: {save_path}")


def main_posed_360(opt):
    from neuman_tpu.cameras.capture import ResizedPinholeCapture
    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import paths, renderer
    from neuman_tpu.parallel.mesh import resolve_mesh as _resolve_mesh
    from neuman_tpu.utils.misc import smpl_verts_to_center_and_up

    import imageio.v2 as imageio
    from train import auto_geo_threshold

    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir, tgt_size=opt.render_size, normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale, smpl_type="optimized",
    )
    geo_threshold, _ = auto_geo_threshold(scene)
    spec = hn.build_human_nerf_spec(opt)
    params = load_net(opt, spec)
    mesh = _resolve_mesh(opt)
    body_model = neuman.NeuManReader._body_model()

    cap_id = 0
    center, up = smpl_verts_to_center_and_up(scene.verts[cap_id], body_model)
    dist = geo_threshold * 36  # camera distance scales with the human size
    render_poses = paths.default_360_path(center, up, dist, opt.trajectory_resolution)

    for i, rp in enumerate(render_poses):
        cap = ResizedPinholeCapture(
            scene.captures[0].pinhole_cam, rp, tgt_size=scene.captures[0].size
        )
        out = renderer.render_smpl_nerf(
            spec, params, cap, scene.verts[cap_id], scene.faces,
            scene.Ts[cap_id], rays_per_batch=opt.rays_per_batch,
            samples_per_ray=opt.samples_per_ray, white_bkg=opt.white_bkg,
            render_can=False, geo_threshold=geo_threshold,
            use_pallas=opt.use_pallas,
            knn_stride=getattr(opt, "knn_stride", 1),
            mesh=mesh,
        )
        save_path = os.path.join(
            "./demo", f"posed_360/{os.path.basename(opt.scene_dir)}",
            f"out_{str(i).zfill(4)}.png",
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        imageio.imwrite(save_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"image saved: {save_path}")


if __name__ == "__main__":
    import argparse

    from neuman_tpu.options import config as config_module

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--mode", required=True, choices=["canonical_360", "posed_360"])
    known, rest = pre.parse_known_args()
    cfg = config_module.NeuManConfig(offset_scale=1.0, geo_threshold=-1.0)
    opt = config_module.from_cli(rest, mode_aware=False, base=cfg)
    assert opt.geo_threshold == -1, "please use auto geo_threshold"
    config_module.print_opt(opt)
    if known.mode == "canonical_360":
        main_canonical_360(opt)
    else:
        main_posed_360(opt)
