"""COLMAP ASCII sparse-reconstruction reader.

Parses `cameras.txt` (SIMPLE_RADIAL / PINHOLE / OPENCV models reduced to
pinhole, distortion dropped), `images.txt` (per-image quaternion+translation),
and `points3D.txt` (xyz + rgb). `order='video'` sorts captures by filename and
attaches frame ids. Behavioral parity with the reference
data_io/colmap_helper.py:22-149.
"""

import os
import re
from collections import namedtuple

import numpy as np

from neuman_tpu.cameras.capture import RGBPinholeCapture
from neuman_tpu.cameras.pinhole import PinholeCamera
from neuman_tpu.cameras.pose import CameraPose
from neuman_tpu.geometry.rotation import Rotation, Translation
from neuman_tpu.scenes.scene import ImageFileScene

ImageMeta = namedtuple("ImageMeta", ["image_id", "camera_pose", "camera_id", "image_path"])


class ColmapAsciiReader:
    @classmethod
    def read_scene(cls, scene_dir, images_dir, tgt_size=None, order="default"):
        captures = cls.read_captures(
            os.path.join(scene_dir, "images.txt"),
            os.path.join(scene_dir, "cameras.txt"),
            images_dir,
            tgt_size,
            order,
        )
        point_cloud = cls.read_point_cloud(os.path.join(scene_dir, "points3D.txt"))
        return ImageFileScene(captures, point_cloud)

    @staticmethod
    def read_point_cloud(points_txt_path):
        with open(points_txt_path, "r") as fid:
            line = fid.readline()
            assert line == "# 3D point list with one line of data per point:\n"
            line = fid.readline()
            assert line == (
                "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, "
                "TRACK[] as (IMAGE_ID, POINT2D_IDX)\n"
            )
            line = fid.readline()
            assert re.search(
                r"^# Number of points: \d+, mean track length: [-+]?\d*\.\d+|\d+\n$",
                line,
            )
            num_points = int(re.findall(r"[-+]?\d*\.\d+|\d+", line)[0])
            xyz = np.zeros((num_points, 3), dtype=np.float32)
            rgb = np.zeros((num_points, 3), dtype=np.float32)
            for i in range(num_points):
                elems = fid.readline().split()
                xyz[i] = list(map(float, elems[1:4]))
                rgb[i] = list(map(float, elems[4:7]))
        return np.concatenate([xyz, rgb], axis=1)

    @classmethod
    def read_captures(cls, images_txt_path, cameras_txt_path, images_dir, tgt_size, order="default"):
        captures = []
        cameras = cls.read_cameras(cameras_txt_path)
        images_meta = cls.read_images_meta(images_txt_path, images_dir)
        if order == "default":
            keys = list(images_meta.keys())
        elif order == "video":
            keys = list(images_meta.keys())
            frames = [os.path.basename(images_meta[k].image_path) for k in keys]
            keys = [x for _, x in sorted(zip(frames, keys))]
        else:
            raise ValueError(f"unknown order: {order}")
        for i, key in enumerate(keys):
            meta = images_meta[key]
            cap = RGBPinholeCapture(
                meta.image_path, cameras[meta.camera_id], meta.camera_pose, tgt_size=tgt_size
            )
            if order == "video":
                cap.frame_id = {"frame_id": i, "total_frames": len(images_meta)}
            captures.append(cap)
        return captures

    @classmethod
    def read_cameras(cls, cameras_txt_path):
        cameras = {}
        with open(cameras_txt_path, "r") as fid:
            line = fid.readline()
            assert line == "# Camera list with one line of data per camera:\n"
            line = fid.readline()
            assert line == "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
            line = fid.readline()
            assert re.search(r"^# Number of cameras: \d+\n$", line)
            num_cams = int(re.findall(r"[-+]?\d*\.\d+|\d+", line)[0])
            for _ in range(num_cams):
                elems = fid.readline().split()
                camera_id = int(elems[0])
                model = elems[1]
                if model == "SIMPLE_RADIAL":
                    width, height, f, cx, cy, _ = list(map(float, elems[2:]))
                    cam = PinholeCamera(width, height, f, f, cx, cy)
                elif model == "PINHOLE":
                    width, height, fx, fy, cx, cy = list(map(float, elems[2:]))
                    cam = PinholeCamera(width, height, fx, fy, cx, cy)
                elif model == "OPENCV":
                    width, height, fx, fy, cx, cy = list(map(float, elems[2:8]))
                    cam = PinholeCamera(width, height, fx, fy, cx, cy)
                else:
                    raise ValueError(f"unsupported camera: {model}")
                assert camera_id not in cameras
                cameras[camera_id] = cam
        return cameras

    @classmethod
    def read_images_meta(cls, images_txt_path, images_dir):
        images_meta = {}
        with open(images_txt_path, "r") as fid:
            line = fid.readline()
            assert line == "# Image list with two lines of data per image:\n"
            line = fid.readline()
            assert line == "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
            line = fid.readline()
            assert line == "#   POINTS2D[] as (X, Y, POINT3D_ID)\n"
            line = fid.readline()
            assert re.search(
                r"^# Number of images: \d+, mean observations per image: [-+]?\d*\.\d+|\d+\n$",
                line,
            )
            num_images = int(re.findall(r"[-+]?\d*\.\d+|\d+", line)[0])
            for _ in range(num_images):
                elems = fid.readline().split()
                assert len(elems) == 10
                fid.readline()  # POINTS2D line, unused
                image_path = os.path.join(images_dir, elems[9])
                assert os.path.isfile(image_path), f"missing file: {image_path}"
                image_id = int(elems[0])
                qw, qx, qy, qz, tx, ty, tz = list(map(float, elems[1:8]))
                pose = CameraPose(
                    Translation(np.array([tx, ty, tz], dtype=np.float32)),
                    Rotation(np.array([qw, qx, qy, qz], dtype=np.float32)),
                )
                camera_id = int(elems[8])
                assert image_id not in images_meta, f"duplicated image id: {image_id}"
                images_meta[image_id] = ImageMeta(image_id, pose, camera_id, image_path)
        return images_meta
