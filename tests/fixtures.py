"""Synthetic NeuMan scene + SMPL model generators for tests.

Builds an on-disk scene directory matching the contract consumed by
`NeuManReader.read_scene` (see SURVEY.md §3.5): images/, sparse/{cameras,
images,points3D}.txt, depth_maps/*.geometric.bin, mono_depth/, segmentations/,
smpl_output_optimized.pkl, alignments.npy — plus a synthetic SMPL body model
pickle under <root>/data/smplx/smpl/SMPL_NEUTRAL.pkl.
"""

import os
import pickle

import joblib
import numpy as np
import imageio.v2 as imageio

from neuman_tpu.cameras.contents import write_colmap_depth_bin

H, W = 48, 64  # >= 32x32 so the LPIPS patch sampler has room
NUM_FRAMES = 10
NUM_JOINTS = 24
NUM_VERTS = 128
NUM_BETAS = 10


def make_synthetic_smpl_pickle(path, num_verts=NUM_VERTS, num_joints=NUM_JOINTS, seed=7,
                               body="random"):
    """Write an SMPL_NEUTRAL.pkl-compatible pickle with synthetic buffers.

    body="sphere" uses a watertight smooth body-proxy surface
    (subdivided icosphere, neuman_tpu/utils/synthetic_body.py) instead of
    a random point cloud — required when the scene needs photometric
    ground truth for the human (a renderable surface)."""
    rng = np.random.default_rng(seed)
    if body == "sphere":
        from neuman_tpu.utils.synthetic_body import synthetic_body_mesh

        v_template, faces = synthetic_body_mesh(subdivisions=3)
        v_template = v_template.astype(np.float64) * 1.2
        faces = faces.astype(np.int32)
        num_verts = len(v_template)
    else:
        # Verts spread around the origin, roughly person-sized.
        v_template = rng.normal(size=(num_verts, 3)).astype(np.float64) * 0.4
        faces = rng.integers(0, num_verts, size=(2 * num_verts, 3)).astype(np.int32)
    shapedirs = rng.normal(size=(num_verts, 3, NUM_BETAS)) * 0.01
    posedirs = rng.normal(size=(num_verts, 3, (num_joints - 1) * 9)) * 0.001
    j_regressor = rng.uniform(size=(num_joints, num_verts))
    j_regressor /= j_regressor.sum(axis=1, keepdims=True)
    weights = rng.uniform(size=(num_verts, num_joints))
    weights /= weights.sum(axis=1, keepdims=True)
    parents = np.array([0] + list(range(num_joints - 1)), dtype=np.uint32)
    kintree_table = np.stack([parents, np.arange(num_joints, dtype=np.uint32)])
    kintree_table[0, 0] = 4294967295  # SMPL convention for the root
    data = {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "posedirs": posedirs,
        "J_regressor": j_regressor,
        "weights": weights,
        "kintree_table": kintree_table,
        "f": faces,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def _backdrop_color(x, y):
    """Low-frequency multi-view-consistent texture on the backdrop plane."""
    r = 0.5 + 0.45 * np.sin(2.2 * x + 0.7)
    g = 0.5 + 0.45 * np.cos(1.7 * y - 0.3)
    b = 0.5 + 0.45 * np.sin(1.3 * (x + y))
    return np.stack([r, g, b], axis=-1)


def build_synthetic_scene(root, num_frames=NUM_FRAMES, h=H, w=W, seed=3,
                          renderable=False, photometric_human=False):
    """Create a synthetic scene directory; returns the scene dir path.

    renderable=True replaces the per-frame random-noise images with
    multi-view-consistent renders of a textured backdrop plane at z=1.0
    (plus true plane depths), so training has a signal to converge to and
    tests can assert an image-quality (PSNR) floor — the reference's
    implicit quality gate is eval PSNR on real scenes
    (render_test_views.py:27-41), which are not mounted in-container.
    """
    root = str(root)
    scene_dir = os.path.join(root, "scene")
    data_dir = os.path.join(root, "data")
    rng = np.random.default_rng(seed)

    make_synthetic_smpl_pickle(
        os.path.join(data_dir, "smplx", "smpl", "SMPL_NEUTRAL.pkl"),
        body="sphere" if photometric_human else "random",
    )
    os.environ["NEUMAN_DATA_ROOT"] = data_dir

    for sub in ["images", "sparse", "depth_maps", "mono_depth", "segmentations"]:
        os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)

    fx = fy = 35.0
    cx, cy = w / 2.0, h / 2.0
    z_plane = 1.0  # backdrop plane (within the points3D z range)

    # Cameras on a small arc at z ~= -2.5 looking towards +z (identity
    # rotation, COLMAP w2c translation t so that camera center = -R^T t).
    fnames = []
    for i in range(num_frames):
        fname = f"{i:05d}.png"
        fnames.append(fname)
        if renderable:
            # project every pixel ray (identity rotation) onto the plane
            cam_center = np.array([0.05 * (i - num_frames / 2), 0.0, -2.5])
            px, py = np.meshgrid(np.arange(w), np.arange(h))
            dx = (px - cx) / fx
            dy = (py - cy) / fy
            s = (z_plane - cam_center[2])  # dz == 1 before normalization
            hit_x = cam_center[0] + dx * s
            hit_y = cam_center[1] + dy * s
            img = (
                np.clip(_backdrop_color(hit_x, hit_y), 0, 1) * 255
            ).astype(np.uint8)
            depth = np.full((h, w), s, dtype=np.float32)
        else:
            img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            depth = rng.uniform(2.0, 3.0, size=(h, w)).astype(np.float32)
        imageio.imwrite(os.path.join(scene_dir, "images", fname), img)

        # mask: 255 = background, 0 = human blob in the middle
        mask = np.full((h, w), 255, dtype=np.uint8)
        mask[h // 2 - 6 : h // 2 + 6, w // 2 - 6 : w // 2 + 6] = 0
        imageio.imwrite(os.path.join(scene_dir, "segmentations", fname), mask)

        write_colmap_depth_bin(
            os.path.join(scene_dir, "depth_maps", fname + ".geometric.bin"), depth
        )

        if renderable:
            mono = (depth * 10000).astype(np.uint16)
        else:
            mono = (rng.uniform(1.5, 3.5, size=(h, w)) * 10000).astype(np.uint16)
        imageio.imwrite(os.path.join(scene_dir, "mono_depth", fname), mono)

    # sparse reconstruction text files
    with open(os.path.join(scene_dir, "sparse", "cameras.txt"), "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        f.write("# Number of cameras: 1\n")
        f.write(f"1 PINHOLE {w} {h} {fx} {fy} {cx} {cy}\n")

    with open(os.path.join(scene_dir, "sparse", "images.txt"), "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        f.write(
            f"# Number of images: {num_frames}, mean observations per image: 100.0\n"
        )
        for i, fname in enumerate(fnames):
            tx = -0.05 * (i - num_frames / 2)
            f.write(f"{i + 1} 1 0 0 0 {tx} 0.0 2.5 1 {fname}\n")
            f.write("\n")

    num_points = 200
    pts = rng.uniform([-1.2, -0.9, 0.0], [1.2, 0.9, 1.0], size=(num_points, 3))
    with open(os.path.join(scene_dir, "sparse", "points3D.txt"), "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write(
            "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, "
            "TRACK[] as (IMAGE_ID, POINT2D_IDX)\n"
        )
        f.write(f"# Number of points: {num_points}, mean track length: 2.0\n")
        for i, p in enumerate(pts):
            f.write(f"{i} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} 128 128 128 0.5\n")

    # SMPL fits: ROMP-format pickle {track_id: {key: [num_video_frames, ...]}}
    pose_scale = 0.05 if photometric_human else 0.1
    poses = rng.normal(size=(num_frames, NUM_JOINTS * 3)).astype(np.float32) * pose_scale
    betas = rng.normal(size=(num_frames, NUM_BETAS)).astype(np.float32) * 0.1
    raw_smpl = {0: {"pose": poses, "betas": betas}}
    joblib.dump(raw_smpl, os.path.join(scene_dir, "smpl_output_optimized.pkl"))
    joblib.dump(raw_smpl, os.path.join(scene_dir, "smpl_output_romp.pkl"))

    alignments = {}
    for fname in fnames:
        a = np.eye(4)[:, :3]  # [4, 3] — transposed-affine layout used on disk
        alignments[fname] = a
    np.save(os.path.join(scene_dir, "alignments.npy"), alignments)

    if photometric_human:
        assert renderable, "photometric human needs the renderable backdrop"
        _composite_photometric_human(scene_dir, fnames)

    return scene_dir


def _human_vertex_colors(template):
    """Smooth view-consistent per-vertex colors from canonical coords."""
    t = (template - template.mean(axis=0)) / (template.std(axis=0) + 1e-9)
    r = 0.5 + 0.4 * np.sin(2.0 * t[:, 0] + 0.5)
    g = 0.5 + 0.4 * np.cos(1.6 * t[:, 1])
    b = 0.5 + 0.4 * np.sin(1.8 * (t[:, 0] + t[:, 2]))
    return np.clip(np.stack([r, g, b], axis=-1), 0.05, 0.95)


def _composite_photometric_human(scene_dir, fnames):
    """Rasterize the (sphere-bodied) SMPL human into every frame with
    view-consistent vertex colors, and rewrite the segmentation masks to
    the true rasterized coverage. Uses the pipeline's own reader so the
    geometry (scene normalization, per-frame T_da2scene, posed verts) is
    exactly what training will later reconstruct against."""
    from neuman_tpu.data_io.neuman import NeuManReader
    from neuman_tpu.render.rasterize import rasterize_mesh

    scene = NeuManReader.read_scene(
        scene_dir, normalize=True, smpl_type="optimized"
    )
    faces = np.asarray(scene.faces)[:, :3]
    colors = _human_vertex_colors(np.asarray(scene.static_vert[0]))
    for i, fname in enumerate(fnames):
        cap = scene.captures[i]
        rgba = rasterize_mesh(
            np.asarray(scene.verts[i]), faces, cap, vert_colors=colors
        )
        a = rgba[..., 3:]
        img_path = os.path.join(scene_dir, "images", fname)
        img = imageio.imread(img_path).astype(np.float64) / 255.0
        out = img * (1 - a) + rgba[..., :3] * a
        imageio.imwrite(img_path, (np.clip(out, 0, 1) * 255).astype(np.uint8))
        seg = np.where(rgba[..., 3] > 0.5, 0, 255).astype(np.uint8)
        imageio.imwrite(
            os.path.join(scene_dir, "segmentations", fname), seg
        )
