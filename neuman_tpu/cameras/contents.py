"""Lazy image / depth content loaders with optional RAM caching.

Parity with the reference cameras/contents.py:43-150:
- images load via imageio with optional bilinear resize;
- masks resize with nearest sampling;
- COLMAP dense `.bin` depth maps are parsed and clipped to the 95th
  percentile of positive depths;
- monocular depth PNGs are scaled by 1/10000;
- a `dummy` suffix path yields a zero depth map matching the image size.
"""

import os

import numpy as np
import imageio.v2 as imageio
import PIL
from PIL import Image


def read_colmap_depth_bin(path):
    """Parse a COLMAP dense-reconstruction binary array (text header + f32).

    Format: "width&height&channels&" header followed by column-major float32
    data (ref: cameras/contents.py:18-36, originally from colmap scripts).
    """
    with open(path, "rb") as fid:
        width, height, channels = np.genfromtxt(
            fid, delimiter="&", max_rows=1, usecols=(0, 1, 2), dtype=int
        )
        fid.seek(0)
        num_delim = 0
        byte = fid.read(1)
        while True:
            if byte == b"&":
                num_delim += 1
                if num_delim >= 3:
                    break
            byte = fid.read(1)
        array = np.fromfile(fid, np.float32)
    array = array.reshape((width, height, channels), order="F")
    return np.transpose(array, (1, 0, 2)).squeeze()


def write_colmap_depth_bin(path, depth):
    """Inverse of `read_colmap_depth_bin` (used by tests / tooling)."""
    h, w = depth.shape
    with open(path, "wb") as fid:
        fid.write(f"{w}&{h}&1&".encode())
        arr = np.transpose(depth[..., None], (1, 0, 2)).astype(np.float32)
        arr.flatten(order="F").tofile(fid)


class CapturedImage:
    def __init__(self, image_path, tgt_size=None, sampling=PIL.Image.BILINEAR):
        assert os.path.isfile(image_path), f"file does not exist: {image_path}"
        self._image = None
        self.image_path = image_path
        self.tgt_size = tgt_size
        self.sampling = sampling

    def read_image(self):
        img = imageio.imread(self.image_path)
        if self.tgt_size is not None:
            img = np.array(
                Image.fromarray(img).resize(self.tgt_size[::-1], self.sampling)
            )
        return img

    def read_image_to_ram(self):
        assert self._image is None
        self._image = self.read_image()
        return self._image.nbytes

    @property
    def image(self):
        if self._image is not None:
            return self._image
        return self.read_image()


class CapturedDepth:
    def __init__(self, depth_path, scale=1, tgt_size=None, dataset="mvs"):
        if not depth_path.endswith("dummy"):
            assert os.path.isfile(depth_path), f"file does not exist: {depth_path}"
        self._depth = None
        self.depth_path = depth_path
        self.scale = scale
        self.tgt_size = tgt_size
        self.dataset = dataset

    def read_depth_png(self):
        assert self.depth_path.endswith(".png")
        assert self.dataset == "mono"
        depth = imageio.imread(self.depth_path) / 10000.0
        assert (depth >= 0).all()
        return depth

    def read_colmap_bin(self):
        assert self.depth_path.endswith(".bin")
        depth = read_colmap_depth_bin(self.depth_path)
        depth[depth < 0] = 0
        try:
            _, max_depth = np.percentile(depth[depth > 0], [0, 95])
        except (IndexError, ValueError):
            max_depth = 0
        depth[depth > max_depth] = 0
        return depth

    def read_depth(self):
        if self.depth_path.endswith("dummy"):
            image_path = self.depth_path[: -len("dummy")]
            w, h = Image.open(image_path).size
            depth = np.zeros([h, w], dtype=np.float32)
        elif self.depth_path.endswith(".png"):
            depth = self.read_depth_png()
        elif self.depth_path.endswith(".bin"):
            depth = self.read_colmap_bin()
        else:
            raise ValueError(f"unsupported depth file: {self.depth_path}")
        if self.tgt_size is not None:
            depth = np.array(
                Image.fromarray(depth).resize(self.tgt_size[::-1], PIL.Image.NEAREST)
            )
        return depth * self.scale

    def read_depth_to_ram(self):
        assert self._depth is None
        self._depth = self.depth_map
        return self._depth.nbytes

    @property
    def depth_map(self):
        if self._depth is not None:
            return self._depth
        return self.read_depth()
