#!/usr/bin/env python
"""Render the held-out test views and report PSNR / SSIM / LPIPS.

CLI parity with the reference render_test_views.py: renders every frame of
the test split with the hybrid human+scene renderer, saves PNGs under
./demo/test_views/<scene>/, and evaluates metrics on the saved PNGs vs the
ground-truth captures.
"""

import os

import numpy as np


def main(opt):
    import imageio.v2 as imageio

    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer
    from neuman_tpu.utils.metrics import eval_metrics
    from render_360 import load_net
    from train import auto_geo_threshold, load_lpips_params

    _, _, test_split = neuman.create_split_files(opt.scene_dir)
    test_views = neuman.read_text(test_split)
    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir, tgt_size=opt.render_size, normalize=opt.normalize,
        bkg_range_scale=opt.bkg_range_scale,
        human_range_scale=opt.human_range_scale, smpl_type="optimized",
    )
    geo_threshold, _ = auto_geo_threshold(scene)
    spec = hn.build_human_nerf_spec(opt)
    params = load_net(opt, spec)
    from neuman_tpu.parallel.mesh import resolve_mesh

    mesh = resolve_mesh(opt)  # ray chunks shard across all visible chips

    preds, gts = [], []
    for view_name in test_views:
        cap = scene[view_name]
        i = cap.frame_id["frame_id"]
        out = renderer.render_hybrid_nerf(
            spec, params, cap, scene.verts[i], scene.faces, scene.Ts[i],
            rays_per_batch=opt.rays_per_batch,
            samples_per_ray=opt.samples_per_ray,
            importance_samples_per_ray=opt.importance_samples_per_ray,
            geo_threshold=geo_threshold,
            use_pallas=opt.use_pallas,
            knn_stride=getattr(opt, "knn_stride", 1),
            mesh=mesh,
        )
        save_path = os.path.join(
            "./demo", f"test_views/{os.path.basename(opt.scene_dir)}",
            f"out_{str(i).zfill(4)}.png",
        )
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        imageio.imwrite(save_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        print(f"image saved: {save_path}")
        preds.append(imageio.imread(save_path))
        gts.append(cap.image)

    lpips_params = load_lpips_params(opt)
    results = eval_metrics(gts, preds, lpips_params=lpips_params)
    print(results)
    return results


if __name__ == "__main__":
    from neuman_tpu.options import config as config_module

    cfg = config_module.NeuManConfig(offset_scale=1.0, geo_threshold=-1.0)
    opt = config_module.from_cli(mode_aware=False, base=cfg)
    assert opt.geo_threshold == -1, "please use auto geo_threshold"
    main(opt)
