"""Captures: pinhole camera + pose + captured contents.

The reference builds an 11-class mixin lattice (cameras/captures.py:21-174,
data_io/neuman_helper.py:22-146). Here the same capability surface is a single
composition-based `Capture` whose optional contents (image / MVS depth / mono
depth / mask / keypoints / densepose) are lazy-loaded, plus a lightweight
`ResizedPinholeCapture` for synthetic render cameras. Resizing is handled by a
`tgt_size` argument instead of parallel Resized* classes.

Property surface kept for parity: image, mask, binary_mask, border_mask,
depth_map, mono_depth_map, fused_depth_map, intrinsic_matrix,
extrinsic_matrix, mvp_mat, shape/size, near/far dicts, frame_id, view_id,
cam_id, captured_depth.scale.
"""

import numpy as np
import PIL

from neuman_tpu.cameras import contents
from neuman_tpu.cameras.pinhole import resize_pinhole_camera


class BasePinholeCapture:
    def __init__(self, pinhole_cam, cam_pose):
        self.cam_pose = cam_pose
        self.pinhole_cam = pinhole_cam

    def __str__(self):
        return f"pinhole camera: {self.pinhole_cam}\ncamera pose: {self.cam_pose}"

    @property
    def mvp_mat(self):
        return np.matmul(self.pinhole_cam.intrinsic_matrix, self.cam_pose.extrinsic_matrix)

    @property
    def intrinsic_matrix(self):
        return self.pinhole_cam.intrinsic_matrix

    @property
    def extrinsic_matrix(self):
        return self.cam_pose.extrinsic_matrix

    @property
    def shape(self):
        return self.pinhole_cam.shape

    @property
    def size(self):
        return self.shape


class ResizedPinholeCapture(BasePinholeCapture):
    """Camera-only capture at a target resolution (synthetic render views)."""

    def __init__(self, pinhole_cam, cam_pose, tgt_size):
        super().__init__(resize_pinhole_camera(pinhole_cam, tgt_size), cam_pose)


class RGBPinholeCapture(BasePinholeCapture):
    """Capture with an image (used by the raw COLMAP scene reader)."""

    def __init__(self, image_path, pinhole_cam, cam_pose, tgt_size=None):
        if tgt_size is not None:
            pinhole_cam = resize_pinhole_camera(pinhole_cam, tgt_size)
        super().__init__(pinhole_cam, cam_pose)
        self.captured_image = contents.CapturedImage(image_path, tgt_size=tgt_size)

    def read_image_to_ram(self):
        return self.captured_image.read_image_to_ram()

    @property
    def image_path(self):
        return self.captured_image.image_path

    @property
    def image(self):
        img = self.captured_image.image
        assert img.shape[0:2] == self.pinhole_cam.shape, (
            f"image does not match with camera model: image shape: {img.shape}, "
            f"pinhole camera: {self.pinhole_cam}"
        )
        return img


class Capture(RGBPinholeCapture):
    """Full NeuMan capture: RGB + MVS depth + mask (+ mono depth, keypoints,
    densepose), with rig ids and per-source near/far planes.

    Parity with `NeuManCapture` / `ResizedNeuManCapture`
    (data_io/neuman_helper.py:22-146).
    """

    def __init__(
        self,
        image_path,
        depth_path,
        mask_path,
        pinhole_cam,
        cam_pose,
        view_id=0,
        cam_id=0,
        tgt_size=None,
        mono_depth_path=None,
        keypoints_path=None,
        densepose_path=None,
    ):
        super().__init__(image_path, pinhole_cam, cam_pose, tgt_size=tgt_size)
        self.view_id = view_id
        self.cam_id = cam_id
        self.captured_depth = contents.CapturedDepth(depth_path, tgt_size=tgt_size)
        self.captured_mask = contents.CapturedImage(
            mask_path, tgt_size=tgt_size, sampling=PIL.Image.NEAREST
        )
        if mono_depth_path is not None:
            self.captured_mono_depth = contents.CapturedDepth(
                mono_depth_path, tgt_size=tgt_size, dataset="mono"
            )
        else:
            self.captured_mono_depth = None
        # Keypoints/densepose are resolution-bound; only load at native size
        # (the reference drops them for resized captures too:
        # data_io/neuman_helper.py:108-117).
        if keypoints_path is not None and tgt_size is None:
            self.keypoints = np.load(keypoints_path)
        else:
            self.keypoints = None
        if densepose_path is not None and tgt_size is None:
            self.densepose = np.load(densepose_path)
        else:
            self.densepose = None
        self._fused_depth_map = None
        self.near = {}
        self.far = {}
        self.frame_id = None

    def read_image_to_ram(self):
        n = self.captured_image.read_image_to_ram()
        n += self.captured_mask.read_image_to_ram()
        if self.captured_mono_depth is not None:
            n += self.captured_mono_depth.read_depth_to_ram()
        return n

    def read_depth_to_ram(self):
        return self.captured_depth.read_depth_to_ram()

    @property
    def depth_path(self):
        return self.captured_depth.depth_path

    @property
    def depth_map(self):
        depth = self.captured_depth.depth_map
        assert (depth >= 0).all()
        return depth

    @property
    def mask(self):
        """Human-foreground mask: 1 on the human, 0 on background.

        Detectron2 masks store 255 on background; invert
        (ref: data_io/neuman_helper.py:54-65).
        """
        m = self.captured_mask.image.copy()
        if m.max() == 255:
            m[m == 255] = 1
            m = 1 - m
        else:
            raise ValueError("expected a 255-valued Detectron2 mask")
        assert m.sum() > 0
        assert m.shape[0:2] == self.pinhole_cam.shape, (
            f"mask does not match camera: {m.shape} vs {self.pinhole_cam}"
        )
        return m

    @property
    def binary_mask(self):
        m = self.mask.copy()
        m[m > 0] = 1
        return m

    @property
    def mono_depth_map(self):
        return self.captured_mono_depth.depth_map

    @property
    def fused_depth_map(self):
        """MVS depth with mono-depth-filled holes.

        Linearly regress mono->MVS depth on valid background pixels, then fill
        invalid pixels with the calibrated mono depth
        (ref: data_io/neuman_helper.py:78-86).
        """
        if self._fused_depth_map is None:
            from neuman_tpu import native_bridge

            self._fused_depth_map = native_bridge.fused_depth(
                self.depth_map.astype(np.float32),
                self.mono_depth_map.astype(np.float32),
                self.binary_mask.astype(np.uint8),
            )
        return self._fused_depth_map

    def point_cloud_world(self):
        from neuman_tpu.geometry import pcd

        return pcd.img_to_pcd_3d(
            self.depth_map,
            self.pinhole_cam.intrinsic_matrix,
            img=None,
            cam2world=self.cam_pose.camera_to_world,
        ).astype(np.float32)
