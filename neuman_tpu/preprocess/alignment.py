"""SMPL <-> COLMAP scene alignment (preprocess stage 9).

Port of the reference preprocess/export_alignment.py:100-193 with the native
deps swapped: open3d `segment_plane` -> numpy RANSAC; torch Adam translation
refinement -> optax (jitted update); cv2 solvePnPRansac/Rodrigues kept (cv2
is available and preprocess-only).

Pipeline per frame: EPnP camera from ROMP 3D joints + 2D keypoints ->
1000-iter Adam translation refinement on reprojection MSE -> metric scale by
intersecting camera->ankle rays with the RANSAC ground plane -> 4x3
alignment matrix (the on-disk `alignments.npy` format consumed by
data_io/neuman.py).
"""

import copy
import os

import numpy as np

from neuman_tpu.cameras.pose import CameraPose
from neuman_tpu.geometry import transforms
from neuman_tpu.geometry.rotation import Rotation, Translation


def to_homogeneous(pts):
    return np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)


def ransac_plane(points, distance_threshold=0.02, num_iterations=1000, seed=0):
    """Plane RANSAC: returns (a, b, c, d) with |normal| = 1 (open3d
    segment_plane equivalent)."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(points[:, :3], dtype=np.float64)
    n = len(pts)
    best_count = -1
    best_model = None
    for _ in range(num_iterations):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = pts[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-12:
            continue
        normal = normal / norm
        d = -np.dot(normal, p0)
        dist = np.abs(pts @ normal + d)
        count = int((dist < distance_threshold).sum())
        if count > best_count:
            best_count = count
            best_model = np.array([*normal, d])
    assert best_model is not None, "plane RANSAC failed"
    # refine on inliers via SVD
    inliers = np.abs(pts @ best_model[:3] + best_model[3]) < distance_threshold
    sel = pts[inliers]
    centroid = sel.mean(axis=0)
    _, _, vh = np.linalg.svd(sel - centroid)
    normal = vh[-1]
    d = -np.dot(normal, centroid)
    return np.array([*normal, d]), np.where(inliers)[0]


def solve_translation(p3d, p2d, mvp, total_iters=1000, lr=1e-3):
    """Refine a 3D translation minimizing reprojection MSE
    (ref: export_alignment.py:81-103), jitted optax Adam."""
    import jax
    import jax.numpy as jnp
    import optax

    p3d = jnp.asarray(p3d[:, :3], dtype=jnp.float32)
    p2d = jnp.asarray(p2d, dtype=jnp.float32)
    mvp = jnp.asarray(mvp, dtype=jnp.float32)

    def loss_fn(t):
        xyzw = jnp.concatenate(
            [p3d + t, jnp.ones_like(p3d[:, :1])], axis=1
        )
        cam = xyzw @ mvp.T
        img = cam[:, :2] / cam[:, 2:3]
        return jnp.mean((img - p2d) ** 2)

    optimizer = optax.adam(lr)
    t = jnp.zeros((1, 3))
    state = optimizer.init(t)

    @jax.jit
    def step(t, state):
        g = jax.grad(loss_fn)(t)
        updates, state = optimizer.update(g, state, t)
        return optax.apply_updates(t, updates), state

    for _ in range(total_iters):
        t, state = step(t, state)
    return np.asarray(t)


def solve_scale(joints_world, cap, plane_model):
    """Metric scale from camera->joint rays intersecting the ground plane
    (ref: export_alignment.py:106-131)."""
    cam_center = cap.cam_pose.camera_center_in_world
    a, b, c, d = plane_model
    right = -(a * cam_center[0] + b * cam_center[1] + c * cam_center[2] + d)
    scales = []
    for j in joints_world:
        coe = (
            a * (j[0] - cam_center[0])
            + b * (j[1] - cam_center[1])
            + c * (j[2] - cam_center[2])
        )
        s = right / coe
        if s > 0:
            scales.append(s)
    return min(scales)


def solve_transformation(verts, j3d, j2d, plane_model, colmap_cap, smpl_cap):
    """ref: export_alignment.py:134-148."""
    mvp = np.matmul(smpl_cap.intrinsic_matrix, smpl_cap.extrinsic_matrix)
    trans = solve_translation(j3d, j2d, mvp)
    smpl_cap.cam_pose.camera_center_in_world = (
        smpl_cap.cam_pose.camera_center_in_world - trans[0]
    )
    joints_world = (
        to_homogeneous(j3d)
        @ smpl_cap.cam_pose.world_to_camera.T
        @ colmap_cap.cam_pose.camera_to_world.T
    )[:, :3]
    scale = solve_scale(joints_world, colmap_cap, plane_model)
    transf = smpl_cap.cam_pose.world_to_camera.T * scale
    transf[3, 3] = 1
    transf = transf @ colmap_cap.cam_pose.camera_to_world_3x4.T
    verts_world = to_homogeneous(verts) @ transf
    return transf, verts_world


def export_alignments(scene, raw_smpl, save_path, plane_threshold=0.02):
    """Solve per-frame alignments and write `alignments.npy`.

    scene: ColmapAsciiReader scene (video order); raw_smpl: dict with
    'verts', 'joints3d', 'joints2d_img_coord' arrays per frame.
    """
    import cv2

    plane_model, _ = ransac_plane(scene.point_cloud[:, :3], plane_threshold)
    alignments = {}
    for i, cap in enumerate(scene.captures):
        pts_3d = np.asarray(raw_smpl["joints3d"][i], dtype=np.float64)
        pts_2d = np.asarray(
            raw_smpl["joints2d_img_coord"][i], dtype=np.float64
        )
        _, r_rod, t, _ = cv2.solvePnPRansac(
            pts_3d, pts_2d, cap.pinhole_cam.intrinsic_matrix, np.zeros(4),
            flags=cv2.SOLVEPNP_EPNP,
        )
        t = t.astype(np.float32)[:, 0]
        r_mat, _ = cv2.Rodrigues(r_rod)
        quat = transforms.quaternion_from_matrix(r_mat).astype(np.float32)

        smpl_cap = copy.deepcopy(cap)
        smpl_cap.cam_pose = CameraPose(Translation(t), Rotation(quat))
        transf, _ = solve_transformation(
            raw_smpl["verts"][i], raw_smpl["joints3d"][i],
            raw_smpl["joints2d_img_coord"][i], plane_model, cap, smpl_cap,
        )
        alignments[os.path.basename(cap.image_path)] = transf
    np.save(save_path, alignments)
    return alignments
