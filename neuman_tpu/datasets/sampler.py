"""Jitted ray-batch samplers.

Pure functions (PRNG key, staged arrays) -> ray batch dicts with the same
keys/semantics as the reference datasets:

- `sample_background_batch` — BackgroundRayDataset.__getitem__
  (background_rays.py:42-123): rays spread uniformly over all train views,
  pixels outside the dilated human mask, bkg near/far, fused or MVS depth.
  (Per-ray uniform view choice is the exact distribution the reference's
  multinomial-then-loop construction samples from.)
- `sample_human_batch` — HumanRayDataset.__getitem__ (human_rays.py:102-248):
  one random view per batch; rays stratified into body/border/bkg pools by
  static ratio counts; optional leading 32x32 LPIPS patch seeded on a body
  pixel and clamped in-bounds; per-ray human near/far computed on the fly
  (matching the reference's precomputed cache values) with `is_hit` flags.

Everything is static-shape: pool sampling uses the class-sorted permutation
from datasets/arrays.py.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.datasets.arrays import RaySceneArrays
from neuman_tpu.ops import rays as ray_ops
from neuman_tpu.utils.constants import PATCH_SIZE, PATCH_SIZE_SQUARED


def num_rays_split(num, body_ratio, border_ratio, bkg_ratio, dilation=30):
    """Static body/border/bkg counts (ref: human_rays.py:81-95)."""
    num_body = int(round(num * body_ratio))
    num_border = int(round(num * border_ratio)) if dilation > 0 else 0
    num_bkg = int(round(num * bkg_ratio))
    arr = np.array([num_body, num_border, num_bkg])
    arr[arr.argmax()] += num - arr.sum()
    assert arr.min() >= 0 and arr.sum() == num
    return int(arr[0]), int(arr[1]), int(arr[2])


def _rays_from_pixels(arrays: RaySceneArrays, vids, flat_pix):
    """Per-ray origins/dirs/colors/etc from (view id, flat pixel) pairs."""
    h, w = arrays.hw
    x = (flat_pix % w).astype(jnp.float32)
    y = (flat_pix // w).astype(jnp.float32)
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # [B, 3]
    k_inv = jnp.linalg.inv(arrays.intrinsics)[vids]  # [B, 3, 3]
    cam_pts = jnp.einsum("bij,bj->bi", k_inv, pix)
    c2w = arrays.c2w[vids]
    world = jnp.einsum("bij,bj->bi", c2w[:, :3, :3], cam_pts) + c2w[:, :3, 3]
    origin = c2w[:, :3, 3]
    d = world - origin
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    xi = flat_pix % w
    yi = flat_pix // w
    color = arrays.images[vids, yi, xi].astype(jnp.float32) / 255.0
    mask = arrays.masks[vids, yi, xi]
    return origin, d, color, mask, xi, yi


def _sample_pool(key, arrays, vids, offset, count, n):
    """Uniform flat-pixel sample from a class pool of each ray's view."""
    u = jax.random.uniform(key, (n,))
    idx = offset + jnp.floor(u * count.astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, arrays.perm.shape[1] - 1)
    return arrays.perm[vids, idx]


@partial(jax.jit, static_argnames=("batch_size", "use_fused_depth", "use_border"))
def sample_background_batch(
    key, arrays: RaySceneArrays, view_ids, batch_size, use_fused_depth=True,
    use_border=True,
):
    """Background-stage ray batch over the train views.

    view_ids: [T] capture-array indices of the train split.
    """
    k_view, k_pix = jax.random.split(key)
    vidx = jax.random.randint(k_view, (batch_size,), 0, view_ids.shape[0])
    vids = view_ids[vidx]
    hw = arrays.perm.shape[1]
    if use_border:
        offset = arrays.body_count[vids] + arrays.border_count[vids]
    else:
        offset = arrays.body_count[vids]
    count = hw - offset
    flat_pix = _sample_pool(k_pix, arrays, vids, offset, count, batch_size)
    origin, direction, color, _, xi, yi = _rays_from_pixels(arrays, vids, flat_pix)
    depth_src = arrays.fused_depths if use_fused_depth else arrays.depths
    depth = depth_src[vids, yi, xi]
    near = arrays.near_bkg[vids][:, None]
    far = arrays.far_bkg[vids][:, None]
    return {
        "color": color,
        "depth": depth,
        "origin": origin,
        "direction": direction,
        "near": near,
        "far": far,
        "is_bkg": jnp.ones((batch_size,), jnp.int32),
        "viewf_list": arrays.viewf[vids][:, None],
    }


def _patch_coords(key, arrays, vid):
    """32x32 patch coords seeded on a random body pixel, clamped in-bounds
    (ref: human_rays.py:18-34, 162-178). Returns flat pixel ids [1024]."""
    h, w = arrays.hw
    seed_flat = _sample_pool(
        key, arrays, vid[None], jnp.zeros((1,), jnp.int32),
        arrays.body_count[vid][None], 1,
    )[0]
    sx = seed_flat % w
    sy = seed_flat // w
    lux = jnp.clip(sx - PATCH_SIZE // 2, 0, w - PATCH_SIZE)
    luy = jnp.clip(sy - PATCH_SIZE // 2, 0, h - PATCH_SIZE)
    dy, dx = jnp.meshgrid(
        jnp.arange(PATCH_SIZE), jnp.arange(PATCH_SIZE), indexing="ij"
    )
    return ((luy + dy) * w + (lux + dx)).reshape(-1).astype(jnp.int32)


def _stratified_coords(key, arrays, vid, counts):
    """body/border/bkg stratified flat pixel ids for one view."""
    n_body, n_border, n_bkg = counts
    hw = arrays.perm.shape[1]
    keys = jax.random.split(key, 3)
    segs = []
    if n_body > 0:
        segs.append(
            _sample_pool(
                keys[0], arrays, jnp.broadcast_to(vid, (n_body,)),
                jnp.zeros((n_body,), jnp.int32),
                jnp.broadcast_to(arrays.body_count[vid], (n_body,)), n_body,
            )
        )
    if n_border > 0:
        segs.append(
            _sample_pool(
                keys[1], arrays, jnp.broadcast_to(vid, (n_border,)),
                jnp.broadcast_to(arrays.body_count[vid], (n_border,)),
                jnp.broadcast_to(arrays.border_count[vid], (n_border,)), n_border,
            )
        )
    if n_bkg > 0:
        # human-stage bkg pool is mask==0 (border ring included):
        # perm[body_count:]
        segs.append(
            _sample_pool(
                keys[2], arrays, jnp.broadcast_to(vid, (n_bkg,)),
                jnp.broadcast_to(arrays.body_count[vid], (n_bkg,)),
                jnp.broadcast_to(hw - arrays.body_count[vid], (n_bkg,)), n_bkg,
            )
        )
    return jnp.concatenate(segs, axis=0)


@partial(
    jax.jit,
    static_argnames=("batch_size", "ratios", "use_patch", "dilation"),
)
def sample_human_batch(
    key, arrays: RaySceneArrays, view_ids, geo_threshold, batch_size,
    ratios=(0.95, 0.05, 0.0), use_patch=True, dilation=30,
):
    """Human-stage ray batch from a single random view.

    Returns the reference batch dict (human_rays.py:233-247) plus the chosen
    `cap_id` (index into the staged arrays) as a traced scalar.
    """
    k_view, k_patchp, k_seed, k_seg1, k_seg2 = jax.random.split(key, 5)
    vid = view_ids[jax.random.randint(k_view, (), 0, view_ids.shape[0])]

    body_ratio, border_ratio, bkg_ratio = ratios
    if use_patch:
        assert batch_size > PATCH_SIZE_SQUARED
        counts1 = num_rays_split(
            PATCH_SIZE_SQUARED, body_ratio, border_ratio, bkg_ratio, dilation
        )
        counts2 = num_rays_split(
            batch_size - PATCH_SIZE_SQUARED, body_ratio, border_ratio, bkg_ratio,
            dilation,
        )
        need_patch = jax.random.uniform(k_patchp, ()) < body_ratio
        patch_pix = _patch_coords(k_seed, arrays, vid)
        strat_pix = _stratified_coords(k_seg1, arrays, vid, counts1)
        seg1 = jnp.where(need_patch, patch_pix, strat_pix)
        seg2 = _stratified_coords(k_seg2, arrays, vid, counts2)
        flat_pix = jnp.concatenate([seg1, seg2], axis=0)
        patch_counter = need_patch.astype(jnp.int32)
    else:
        counts = num_rays_split(
            batch_size, body_ratio, border_ratio, bkg_ratio, dilation
        )
        flat_pix = _stratified_coords(k_seg1, arrays, vid, counts)
        patch_counter = jnp.int32(0)

    vids = jnp.broadcast_to(vid, (batch_size,))
    origin, direction, color, mask, xi, yi = _rays_from_pixels(arrays, vids, flat_pix)
    is_bkg = (mask == 0).astype(jnp.int32)

    near, far = ray_ops.geometry_guided_near_far(
        origin, direction, arrays.verts[vid], geo_threshold
    )
    valid = near < far
    human_near = jnp.where(valid, near, arrays.near_human[vid])[:, None]
    human_far = jnp.where(valid, far, arrays.far_human[vid])[:, None]

    return {
        "color": color,
        "origin": origin,
        "direction": direction,
        "human_near": human_near,
        "human_far": human_far,
        "bkg_near": jnp.broadcast_to(arrays.near_bkg[vid], (batch_size,))[:, None],
        "bkg_far": jnp.broadcast_to(arrays.far_bkg[vid], (batch_size,))[:, None],
        "is_bkg": is_bkg,
        "is_hit": valid.astype(jnp.int32),
        "cur_view_f": arrays.viewf[vid],
        "cap_id": vid,
        "patch_counter": patch_counter,
    }
