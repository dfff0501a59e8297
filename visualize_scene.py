#!/usr/bin/env python
"""Visualize the scene: point cloud + per-frame SMPL verts + camera frusta.

Parity with the reference visualize_scene.py (Open3D viewer). Open3D is not
part of the TPU image; when unavailable, falls back to a matplotlib 3D
scatter saved to PNG (headless-friendly).
"""

import argparse
import os

import numpy as np


def camera_poly(cap, size=1.0):
    from neuman_tpu.ops import rays as ray_ops
    import jax.numpy as jnp

    xy = jnp.asarray(
        [[0, 0], [cap.shape[1], 0], [cap.shape[1], cap.shape[0]], [0, cap.shape[0]]],
        dtype=jnp.float32,
    )
    origins, dirs = ray_ops.pixels_to_rays(
        xy, jnp.asarray(cap.intrinsic_matrix), jnp.asarray(cap.cam_pose.camera_to_world)
    )
    orig = np.asarray(origins[0])
    pts = np.asarray(dirs) * size + orig
    return orig, *pts


def main(opt):
    from neuman_tpu.data_io import neuman

    scene = neuman.NeuManReader.read_scene(
        opt.scene_dir, normalize=True, bkg_range_scale=3, human_range_scale=1.5,
        smpl_type=opt.smpl_type,
    )
    try:
        import open3d as o3d

        geoms = []
        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(scene.point_cloud[:, :3])
        pcd.colors = o3d.utility.Vector3dVector(scene.point_cloud[:, 3:6] / 255)
        geoms.append(pcd)
        for verts in scene.verts:
            human = o3d.geometry.PointCloud()
            human.points = o3d.utility.Vector3dVector(verts)
            geoms.append(human)
        for cap in scene.captures:
            pts = np.array(camera_poly(cap, size=0.2))
            lns = [[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]]
            ls = o3d.geometry.LineSet()
            ls.points = o3d.utility.Vector3dVector(pts)
            ls.lines = o3d.utility.Vector2iVector(lns)
            geoms.append(ls)
        o3d.visualization.draw_geometries(geoms)
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(10, 10))
        ax = fig.add_subplot(projection="3d")
        pc = scene.point_cloud
        ax.scatter(pc[:, 0], pc[:, 1], pc[:, 2], s=0.5, c=pc[:, 3:6] / 255)
        for verts in scene.verts[:: max(1, len(scene.verts) // 10)]:
            ax.scatter(verts[:, 0], verts[:, 1], verts[:, 2], s=0.5, c="red")
        for cap in scene.captures:
            pts = np.array(camera_poly(cap, size=0.2))
            for j in range(1, 5):
                ax.plot(
                    [pts[0, 0], pts[j, 0]], [pts[0, 1], pts[j, 1]],
                    [pts[0, 2], pts[j, 2]], c="blue", linewidth=0.5,
                )
        out = opt.save_to or "scene_visualization.png"
        plt.savefig(out, dpi=150)
        print(f"open3d unavailable; saved matplotlib view to {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene_dir", type=str, required=True)
    parser.add_argument("--smpl_type", default="optimized", choices=["romp", "optimized"])
    parser.add_argument("--save_to", type=str, default=None)
    main(parser.parse_args())
