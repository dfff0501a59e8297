"""Per-frame SMPL pose refinement (preprocess stage 10).

Port of preprocess/optimize_smpl.py:196-295: refine each frame's SMPL pose
against (a) 2D keypoint reprojection (COCO->SMPL joint mapping) and (b) the
detected human silhouette, with DensePose-gated gradients and joint-angle
limits.

Silhouette term: the reference uses pytorch3d's SoftSilhouetteShader
(optimize_smpl.py:84-102). The default here is the matching soft FACE
rasterizer (preprocess/soft_raster.py — per-face sigmoid of the signed
squared pixel-to-boundary distance in NDC, product-of-transparency blend,
BlendParams(sigma=1e-4) semantics), so the silhouette objective is the
reference's, not an approximation. A cheaper per-vertex Gaussian point-splat
(`sil_impl="splat"`) is kept as an option for very dense meshes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from neuman_tpu.models import smpl as smpl_module
from neuman_tpu.preprocess.soft_raster import soft_rasterize_silhouette


def coco_to_smpl(coco2d):
    """COCO-17 keypoints -> SMPL-24 joint slots (ref: optimize_smpl.py:33-54)."""
    assert coco2d.shape == (17, 2)
    smpl2d = np.zeros((24, 2))
    mapping = {
        1: 11, 2: 12, 4: 13, 5: 14, 7: 15, 8: 16,
        16: 5, 17: 6, 18: 7, 19: 8, 20: 9, 21: 10,
    }
    for s, c in mapping.items():
        smpl2d[s] = coco2d[c]
    return smpl2d


def turn_smpl_gradient_on(dp_mask):
    """Limb-only pose gradient mask from DensePose visibility
    (ref: optimize_smpl.py:136-167)."""
    from neuman_tpu.trainers.human import densepose_name_to_idx

    grad_mask = np.zeros([24, 3])
    idx2name = {}
    for name, ids in densepose_name_to_idx().items():
        for i in ids:
            idx2name[i] = name
    visible = {idx2name[i] for i in range(1, 25) if i in np.unique(dp_mask)}
    if "Upper Leg Left" in visible:
        grad_mask[1, 0] = grad_mask[1, 2] = 1
    if "Upper Leg Right" in visible:
        grad_mask[2, 0] = grad_mask[2, 2] = 1
    if "Lower Leg Left" in visible:
        grad_mask[4, 0] = 1
    if "Lower Leg Right" in visible:
        grad_mask[5, 0] = 1
    if "Left Foot" in visible:
        grad_mask[7] = 1
    if "Right Foot" in visible:
        grad_mask[8] = 1
    if "Upper Arm Left" in visible:
        grad_mask[16, 1] = grad_mask[16, 2] = 1
    if "Upper Arm Right" in visible:
        grad_mask[17, 1] = grad_mask[17, 2] = 1
    if "Lower Arm Left" in visible:
        grad_mask[18, 1] = 1
    if "Lower Arm Right" in visible:
        grad_mask[19, 1] = 1
    return grad_mask.reshape(-1)


def clip_smpl_vals():
    """Joint-angle limits in radians, [72, 2] (ref: optimize_smpl.py:170-194)."""
    limits = np.ones([24, 3, 2])
    limits[..., 0] *= -360
    limits[..., 1] *= 360
    limits[4, 0] = [0, 160]
    limits[4, 1] = [0, 0]
    limits[4, 2] = [0, 0]
    limits[5, 0] = [0, 160]
    limits[5, 1] = [0, 0]
    limits[5, 2] = [0, 0]
    limits[7, 0] = [-45, 90]
    limits[7, 1] = [-60, 60]
    limits[7, 2] = [-10, 10]
    limits[8, 0] = [-45, 90]
    limits[8, 1] = [-60, 60]
    limits[8, 2] = [-10, 10]
    limits[18, 1] = [-160, 0]
    limits[19, 2] = [0, 160]
    return limits.reshape(-1, 2) / 180 * np.pi


def vertex_forward(pose, betas, align, body_model, scale):
    """T-pose verts/joints through the per-frame alignment
    (ref: optimize_smpl.py:107-133)."""
    t_pose = jnp.zeros_like(pose)
    _, mesh_transf = smpl_module.verts_transformations(
        body_model, pose[None], betas[None], transl=jnp.zeros((1, 3)),
        concat_joints=True,
    )
    mesh_transf = align.T @ mesh_transf[0]
    s = jnp.eye(4).at[:3, :3].mul(scale)
    mesh_transf = s @ mesh_transf
    t_verts, t_joints = smpl_module.smpl_forward(
        body_model, t_pose[None], betas[None], transl=jnp.zeros((1, 3))
    )
    all_pts = jnp.concatenate([t_verts[0], t_joints[0]], axis=0)
    homog = jnp.concatenate([all_pts, jnp.ones_like(all_pts[:, :1])], axis=-1)
    world = jnp.einsum("nij,nj->ni", mesh_transf, homog)[:, :3]
    nv = body_model.num_verts
    return world[:nv], world[nv:]


def soft_silhouette(verts_img, z, h, w, sigma=2.0, stride=4):
    """Differentiable point-splat silhouette at reduced resolution.

    verts_img: [V, 2] pixel coords; returns [h//stride, w//stride] coverage.
    """
    gy, gx = jnp.meshgrid(
        jnp.arange(0, h, stride, dtype=jnp.float32),
        jnp.arange(0, w, stride, dtype=jnp.float32),
        indexing="ij",
    )
    d2 = (
        (gx[None] - verts_img[:, 0][:, None, None]) ** 2
        + (gy[None] - verts_img[:, 1][:, None, None]) ** 2
    )
    occ = jnp.exp(-d2 / (2 * sigma**2))
    # product-of-transparency composition
    return 1.0 - jnp.prod(1.0 - jnp.clip(occ, 0, 0.9999), axis=0)


def optimize_smpl_frame(
    cap, smpl_frame, body_model, align, scale, num_iters=100, lr=5e-3,
    sil_stride=4, sil_weight=1.0, sil_impl="face", sil_sigma=None,
):
    """Refine one frame's pose (ref: optimize_smpl.py:196-262).

    sil_impl: "face" (default) = soft face rasterizer, the reference's
    SoftSilhouetteShader objective; "splat" = per-vertex Gaussian splat.
    sil_sigma: blend sharpness; None = the impl's default (1e-4 NDC^2 for
    "face" matching pytorch3d BlendParams, 2.0 px for "splat").
    """
    pose0 = jnp.asarray(smpl_frame["pose"], dtype=jnp.float32)
    betas = jnp.asarray(smpl_frame["betas"], dtype=jnp.float32)
    align_j = jnp.asarray(align, dtype=jnp.float32)
    h, w = cap.shape
    k_mat = jnp.asarray(cap.intrinsic_matrix, dtype=jnp.float32)
    w2c = jnp.asarray(cap.cam_pose.world_to_camera, dtype=jnp.float32)
    mask_target = jnp.asarray(
        cap.binary_mask[::sil_stride, ::sil_stride], dtype=jnp.float32
    )

    keypoints = np.asarray(cap.keypoints, dtype=np.float64).copy()
    keypoints[keypoints[:, 2] < 0.3] = 0
    joints_target = coco_to_smpl(keypoints[:, :2])
    joints_mask = (joints_target.sum(axis=1) != 0).astype(np.float32)
    joints_target = jnp.asarray(joints_target, dtype=jnp.float32)
    joints_mask = jnp.asarray(joints_mask)

    grad_mask = jnp.asarray(
        turn_smpl_gradient_on(cap.densepose).astype(np.float32)
    )
    limits = jnp.asarray(clip_smpl_vals().astype(np.float32))
    faces = jnp.asarray(np.asarray(body_model.faces), dtype=jnp.int32)

    def project(pts):
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        img = cam @ k_mat.T
        return img[:, :2] / img[:, 2:3], cam[:, 2]

    def loss_fn(pose):
        verts, joints = vertex_forward(pose, betas, align_j, body_model, scale)
        pj, _ = project(joints)
        kp_loss = (
            jnp.sum(joints_mask[:, None] * (pj - joints_target) ** 2)
            / jnp.maximum(joints_mask.sum() * 2, 1.0)
        )
        vi, vz = project(verts)
        if sil_impl == "face":
            sil = soft_rasterize_silhouette(
                vi, faces, h, w,
                sigma=1e-4 if sil_sigma is None else sil_sigma,
                stride=sil_stride,
                vert_z=vz,
            )
        else:
            sil = soft_silhouette(
                vi, vz, h, w,
                sigma=2.0 if sil_sigma is None else sil_sigma,
                stride=sil_stride,
            )
        sil_loss = jnp.mean((sil - mask_target) ** 2)
        return kp_loss + sil_weight * sil_loss

    optimizer = optax.adam(lr)
    state = optimizer.init(pose0)

    @jax.jit
    def step(pose, state):
        g = jax.grad(loss_fn)(pose)
        valid = ((pose < limits[:, 1]) & (pose > limits[:, 0])).astype(
            jnp.float32
        )
        g = g * grad_mask * valid
        updates, state = optimizer.update(g, state, pose)
        return optax.apply_updates(pose, updates), state

    pose = pose0
    for _ in range(num_iters):
        pose, state = step(pose, state)
    return np.asarray(pose)
