"""Host-side helpers: masks, SMPL-derived camera anchors, notifications.

Parity targets in the reference: utils/utils.py:225-321 (border masks, scene
SMPL caches, spine SVD center/up), with torch/pytorch3d dependencies replaced
by numpy/JAX. Mesh caches are plain arrays — the only pytorch3d surface the
pipeline used was `verts_packed()/faces_packed()` (SURVEY.md §2.9).
"""

import numpy as np

from neuman_tpu import native_bridge
from neuman_tpu.models import smpl as smpl_module


def print_notification(content_list, notification_type="NOTIFICATION"):
    print(f"---------------------- {notification_type} ----------------------")
    for content in content_list:
        print(content)
    print("----------------------------------------------------")


def add_border_mask(scene, iterations=10):
    """Attach `border_mask` (dilation ring around the human) to every capture
    (ref: utils/utils.py:257-262)."""
    for cap in scene.captures:
        if iterations > 0:
            cap.border_mask = (
                native_bridge.binary_dilate(cap.binary_mask, iterations).astype(
                    cap.binary_mask.dtype
                )
                - cap.binary_mask
            )
        else:
            cap.border_mask = cap.binary_mask - cap.binary_mask


def add_mesh_cache(scene):
    """Attach posed/canonical mesh arrays per capture.

    Replaces the reference's pytorch3d `Meshes` caches
    (utils/utils.py:287-304) with plain (verts, faces) numpy arrays — the
    device-side mesh-query kernels consume raw arrays directly.
    """
    faces = scene.faces[:, :3].astype(np.int32)
    for i, cap in enumerate(scene.captures):
        cap.posed_verts = np.asarray(scene.verts[i], dtype=np.float32)
        cap.can_verts = np.asarray(scene.static_vert[i], dtype=np.float32)
        cap.mesh_faces = faces


def smpl_verts_to_center_and_up(verts, body_model=None):
    """Center and up direction of a body from the spine joints' SVD
    (ref: utils/utils.py:265-284)."""
    if body_model is None:
        from neuman_tpu.data_io.neuman import NeuManReader

        body_model = NeuManReader._body_model()
    joints = np.asarray(
        smpl_module.vertices2joints(
            body_model.J_regressor, np.asarray(verts, dtype=np.float32)[None]
        )
    )[0]
    spine_ind = [0, 3, 6, 9]
    spine = joints[spine_ind]
    center = spine.mean(axis=0)
    _, _, vv = np.linalg.svd(spine - center)
    linepts = vv[0] * np.mgrid[-7:7:2j][:, np.newaxis]
    linepts += center
    spine_dir = spine[3] - spine[0]
    up = linepts[1] - linepts[0]
    if np.dot(spine_dir, up) < 0:
        up = linepts[0] - linepts[1]
    up /= np.linalg.norm(up)
    return center, up


def np_img_to_chw(np_img):
    """HWC (or NHWC) image -> CHW (NCHW) float array."""
    if np_img.ndim == 4:
        return np.transpose(np_img, (0, 3, 1, 2))
    if np_img.ndim == 3:
        return np.transpose(np_img, (2, 0, 1))
    return np_img


def chw_img_to_np(img):
    if img.ndim == 4:
        return np.transpose(img, (0, 2, 3, 1))
    if img.ndim == 3:
        return np.transpose(img, (1, 2, 0))
    return img
