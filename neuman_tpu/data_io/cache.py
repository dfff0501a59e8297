"""Per-pixel human near/far cache (API parity with data_io/cache_helper.py).

The TPU sampler computes near/far on the fly (see datasets/sampler.py), so
this cache is optional — it exists for disk-format parity (same filename
scheme `cache/near_far_cache_{fname}_{h}_{w}_{thresh}_{norm}.npy`, same
[h, w, 3] layout with a validity channel) and for host tools that want the
full-image cache. The computation itself is a single jitted device call per
capture instead of the reference's chunked loop (cache_helper.py:16-36).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.ops import rays as ray_ops


def _cache_path(scene, cap, geo_threshold, normalize):
    h, w = scene.captures[0].shape
    return os.path.abspath(
        os.path.join(
            scene.captures[0].image_path,
            f"../../cache/near_far_cache_{os.path.basename(cap.image_path)}_"
            f"{h}_{w}_{geo_threshold}_{normalize}.npy",
        )
    )


def export_near_far_cache(scene, geo_threshold, chunk=65536, normalize=True):
    h, w = scene.captures[0].shape

    @jax.jit
    def compute(k, c2w, verts):
        coords = ray_ops.image_coords(h, w)
        origin, direction = ray_ops.pixels_to_rays(coords, k, c2w)
        near, far = ray_ops.geometry_guided_near_far(
            origin, direction, verts, geo_threshold
        )
        return near, far

    for cap in scene.captures:
        save_path = _cache_path(scene, cap, geo_threshold, normalize)
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        if os.path.isfile(save_path):
            continue
        idx = scene.image_path_to_index[cap.image_path]
        near, far = compute(
            jnp.asarray(cap.intrinsic_matrix, jnp.float32),
            jnp.asarray(cap.cam_pose.camera_to_world, jnp.float32),
            jnp.asarray(scene.verts[idx], jnp.float32),
        )
        cache = np.stack(
            [np.asarray(near), np.asarray(far), np.ones((h * w,), np.float32)],
            axis=-1,
        ).reshape(h, w, 3)
        np.save(save_path, cache)


def load_near_far_cache(scene, geo_threshold, normalize=True):
    book = {}
    for cap in scene.captures:
        path = _cache_path(scene, cap, geo_threshold, normalize)
        assert os.path.isfile(path), f"{path} not exist"
        book[os.path.basename(cap.image_path)] = np.load(path)
    return book
