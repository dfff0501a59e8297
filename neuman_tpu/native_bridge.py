"""ctypes bridge to the native host-staging runtime (native/neuman_host.cpp).

Every entry point has a pure-Python fallback, so the framework works without
the compiled library; `make -C native` builds `libneuman_host.so` and the
bridge picks it up automatically. `HAVE_NATIVE` reports availability.
"""

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "libneuman_host.so",
    )
    if not os.path.isfile(path):
        _LIB = False
        return _LIB
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.binary_dilate.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.build_class_perm.argtypes = [u8p, u8p, ctypes.c_int, ctypes.c_int, i32p, i32p]
    lib.fused_depth.argtypes = [f32p, f32p, u8p, ctypes.c_int, ctypes.c_int, f32p]
    lib.fused_depth.restype = ctypes.c_int
    lib.read_colmap_depth_bin.argtypes = [ctypes.c_char_p, ctypes.c_void_p, i32p]
    lib.read_colmap_depth_bin.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def have_native():
    return bool(_load())


def binary_dilate(mask, iterations):
    """Iterative cross-element dilation (scipy binary_dilation parity)."""
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    if not lib:
        from scipy import ndimage

        return ndimage.binary_dilation(mask, iterations=iterations).astype(np.uint8)
    out = np.empty_like(mask)
    lib.binary_dilate(mask, out, mask.shape[0], mask.shape[1], int(iterations))
    return out


def build_class_perm(mask, border):
    """Class-sorted pixel permutation + (body, border) counts."""
    lib = _load()
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    border = np.ascontiguousarray(border, dtype=np.uint8)
    h, w = mask.shape
    if not lib:
        body = mask.reshape(-1) != 0
        bord = (border.reshape(-1) == 1) & ~body
        cls = np.where(body, 0, np.where(bord, 1, 2)).astype(np.int8)
        perm = np.argsort(cls, kind="stable").astype(np.int32)
        return perm, int(body.sum()), int(bord.sum())
    perm = np.empty(h * w, np.int32)
    counts = np.empty(2, np.int32)
    lib.build_class_perm(mask, border, h, w, perm, counts)
    return perm, int(counts[0]), int(counts[1])


def fused_depth(mvs, mono, mask):
    """mono->MVS calibrated hole fill (ref: neuman_helper.py:78-86)."""
    lib = _load()
    mvs = np.ascontiguousarray(mvs, dtype=np.float32)
    mono = np.ascontiguousarray(mono, dtype=np.float32)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    if not lib:
        valid = (mvs > 0) & (mask == 0)
        slope, intercept = np.polyfit(mono[valid], mvs[valid], 1)
        out = mvs.copy()
        out[~valid] = mono[~valid] * slope + intercept
        return out
    out = np.empty_like(mvs)
    rc = lib.fused_depth(mvs, mono, mask, mvs.shape[0], mvs.shape[1], out)
    if rc != 0:
        raise ValueError("degenerate mono->mvs depth fit")
    return out


def read_colmap_depth_bin(path):
    """COLMAP dense .bin depth with 95th-percentile clipping."""
    lib = _load()
    if not lib:
        from neuman_tpu.cameras.contents import (
            read_colmap_depth_bin as py_read,
        )

        depth = py_read(path)
        depth[depth < 0] = 0
        try:
            _, maxd = np.percentile(depth[depth > 0], [0, 95])
        except (IndexError, ValueError):
            maxd = 0
        depth[depth > maxd] = 0
        return depth
    dims = np.empty(2, np.int32)
    rc = lib.read_colmap_depth_bin(path.encode(), None, dims)
    if rc != 0:
        raise IOError(f"failed to read {path}: rc={rc}")
    out = np.empty((int(dims[0]), int(dims[1])), np.float32)
    rc = lib.read_colmap_depth_bin(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), dims
    )
    if rc != 0:
        raise IOError(f"failed to read {path}: rc={rc}")
    return out
