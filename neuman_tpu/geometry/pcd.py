"""Point-cloud <-> image projection (host-side numpy).

Used for per-capture near/far estimation from COLMAP sparse points and posed
SMPL vertices. Behavioral parity with the reference's
geometry/pcd_projector.py:80-227 (the `PointCloudProjectorNp` static methods
and `project_point_cloud_at_capture`); the differentiable torch variant is not
needed — device-side projection in JAX lives with the preprocessing ports.
"""

import numpy as np


def pcd_2d_to_pcd_3d(pcd, depth, intrinsic, cam2world=None):
    """Unproject 2D pixel coords (+ optional features) with depth to 3D.

    pcd: [N, 2+F] pixel x, y (+features); depth: [N, 1]; intrinsic: 3x3.
    If cam2world (4x4) is given, output is in world space.
    """
    assert len(pcd.shape) == 2 and pcd.shape[1] >= 2
    assert depth.shape == (pcd.shape[0], 1)
    assert intrinsic.shape == (3, 3)

    x, y, z = pcd[:, 0], pcd[:, 1], depth[:, 0]
    xyz = np.stack([x, y, np.ones_like(x)], axis=1)
    xyz = (np.linalg.inv(intrinsic) @ xyz.T).T * z[..., None]
    valid1 = xyz[:, 2] > 0
    xyz = xyz[valid1]

    valid2 = None
    if cam2world is not None:
        assert cam2world.shape == (4, 4)
        xyzw = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=1)
        xyzw = (cam2world @ xyzw.T).T
        valid2 = xyzw[:, 3] != 0
        xyzw = xyzw[valid2]
        xyzw /= xyzw[:, 3:4]
        xyz = xyzw[:, :3]

    if pcd.shape[1] > 2:
        feats = pcd[:, 2:][valid1]
        if valid2 is not None:
            feats = feats[valid2]
        xyz = np.concatenate([xyz, feats], axis=1)
    return xyz


def img_to_pcd_3d(depth, intrinsic, img=None, cam2world=None):
    """Unproject a full depth map (H, W) to a 3D point cloud."""
    assert len(depth.shape) == 2
    h, w = depth.shape
    x, y = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    z = depth.reshape(-1)
    valid = z > 0
    xy = np.stack([x.reshape(-1), y.reshape(-1)], axis=1)[valid]
    if img is not None:
        assert img.shape[:2] == depth.shape
        feats = img.reshape(-1, img.shape[-1])[valid]
        xy = np.concatenate([xy, feats], axis=1)
    return pcd_2d_to_pcd_3d(xy, z[valid][:, None], intrinsic, cam2world=cam2world)


def pcd_3d_to_pcd_2d(
    pcd, intrinsic, extrinsic, size, keep_z, crop=True, filter_neg=True,
    norm_coord=True, return_index=False,
):
    """Project a 3D point cloud [N, 3+F] into an image.

    extrinsic: 3x4 world-to-camera. size: (H, W). Returns [M, 2(+1 z)(+F)].
    """
    assert len(pcd.shape) == 2 and pcd.shape[1] >= 3
    xyzw = np.concatenate([pcd[:, :3], np.ones_like(pcd[:, :1])], axis=1)
    mvp = intrinsic @ extrinsic
    cam_pts = (mvp @ xyzw.T).T
    if filter_neg:
        valid1 = cam_pts[:, 2] > 0.0
    else:
        valid1 = np.ones_like(cam_pts[:, 2], dtype=bool)
    cam_pts = cam_pts[valid1]
    img_pts = cam_pts / cam_pts[:, 2:3]
    img_pts = img_pts[:, :2]
    if crop:
        valid2 = (
            (img_pts[:, 0] >= 0)
            & (img_pts[:, 0] < size[1] - 1)
            & (img_pts[:, 1] >= 0)
            & (img_pts[:, 1] < size[0] - 1)
        )
    else:
        valid2 = np.ones_like(img_pts[:, 0], dtype=bool)
    if norm_coord:
        img_pts = ((img_pts / np.asarray(size)[::-1]) * 2) - 1
    if keep_z:
        out = np.concatenate(
            [img_pts[valid2], cam_pts[valid2][:, 2:3], pcd[valid1][:, 3:][valid2]],
            axis=1,
        )
    else:
        out = np.concatenate([img_pts[valid2], pcd[valid1][:, 3:][valid2]], axis=1)
    if return_index:
        return out, np.arange(pcd.shape[0])[valid1][valid2]
    return out


def pcd_2d_to_img(pcd, size, has_z=False, keep_z=False):
    """Z-sorted splat of a 2D point cloud onto a canvas of `size` (H, W)."""
    assert len(pcd.shape) == 2 and pcd.shape[-1] >= 2
    if has_z:
        pcd = pcd[pcd[:, 2].argsort()[::-1]]
        if not keep_z:
            pcd = np.delete(pcd, [2], axis=1)
    idx = np.round(pcd[:, :2]).astype(np.int32)
    idx[:, 0] = np.clip(idx[:, 0], 0, size[1] - 1)
    idx[:, 1] = np.clip(idx[:, 1], 0, size[0] - 1)
    h, w, c = *size, pcd.shape[-1] - 2
    if c == 0:
        canvas = np.zeros((h, w, 1))
        canvas[idx[:, 1], idx[:, 0]] = 1.0
    else:
        canvas = np.zeros((h, w, c))
        canvas[idx[:, 1], idx[:, 0]] = pcd[:, 2:]
    return canvas


def project_point_cloud_at_capture(point_cloud, capture, render_type="rgb"):
    """Project a world point cloud at a capture; `pcd` render_type keeps z.

    Parity with the reference geometry/pcd_projector.py:13-39 — the `pcd`
    mode is what near/far estimation consumes.
    """
    if render_type == "rgb":
        assert point_cloud.shape[1] == 6
    else:
        point_cloud = point_cloud[:, :3]
        assert point_cloud.shape[1] == 3
    keep_z = render_type not in ("bw", "rgb")

    pcd_2d = pcd_3d_to_pcd_2d(
        point_cloud,
        capture.intrinsic_matrix,
        capture.extrinsic_matrix,
        capture.size,
        keep_z=True,
        crop=True,
        filter_neg=True,
        norm_coord=False,
        return_index=False,
    )
    if render_type == "pcd":
        return pcd_2d
    return pcd_2d_to_img(pcd_2d, capture.size, has_z=True, keep_z=keep_z)
