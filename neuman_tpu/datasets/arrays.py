"""Pre-staged scene arrays for device-side ray sampling.

The reference builds ray batches on CPU inside DataLoader worker processes
(datasets/background_rays.py, datasets/human_rays.py), shipping numpy
tensors to the device every step. TPU-first redesign: all pixel data is
staged into device arrays once, and batch construction becomes a jitted
pure function of a PRNG key (see datasets/sampler.py).

Pixel-class sampling uses a single per-view permutation of flat pixel
indices sorted by class — [body | border | strict-background] — plus class
counts, so "uniform over class-c pixels of view v" is one gather:
perm[v, offset_c(v) + randint(count_c(v))]. This covers all three pools of
the human sampler (human_rays.py:153-185) and the background sampler's
dilated-mask pool (background_rays.py:69-79) with one [N, H*W] int32 array.

The per-pixel human near/far cache (data_io/cache_helper.py) is NOT staged:
on TPU `geometry_guided_near_far` for a 1536-ray batch is two small matmuls,
so near/far is computed on the fly in the sampler (same inputs — the scene's
initial posed verts — hence identical values to the reference's cache).
"""

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RaySceneArrays:
    images: jnp.ndarray  # [N, H, W, 3] uint8
    masks: jnp.ndarray  # [N, H, W] uint8 (human > 0)
    depths: jnp.ndarray  # [N, H, W] f32 (MVS)
    fused_depths: jnp.ndarray  # [N, H, W] f32
    intrinsics: jnp.ndarray  # [N, 3, 3] f32
    c2w: jnp.ndarray  # [N, 4, 4] f32
    near_bkg: jnp.ndarray  # [N]
    far_bkg: jnp.ndarray  # [N]
    near_human: jnp.ndarray  # [N]
    far_human: jnp.ndarray  # [N]
    viewf: jnp.ndarray  # [N] frame_id / total_frames
    perm: jnp.ndarray  # [N, H*W] int32, class-sorted flat pixel ids
    body_count: jnp.ndarray  # [N]
    border_count: jnp.ndarray  # [N]
    verts: jnp.ndarray  # [N, V, 3] posed SMPL verts in scene space

    @property
    def num_views(self):
        return self.images.shape[0]

    @property
    def hw(self):
        return self.images.shape[1], self.images.shape[2]


def build_scene_arrays(scene, view_indices=None, need_depth=True):
    """Stage a (subset of a) NeuMan scene into device arrays.

    view_indices: capture indices to include (default: all). Captures must
    already have border masks (utils.misc.add_border_mask).
    """
    if view_indices is None:
        view_indices = list(range(len(scene.captures)))
    caps = [scene.captures[i] for i in view_indices]
    h, w = caps[0].shape

    images, masks, depths, fused = [], [], [], []
    intr, c2w = [], []
    nb, fb, nh, fh, viewf = [], [], [], [], []
    perms, body_counts, border_counts = [], [], []
    verts = []
    for i, cap in zip(view_indices, caps):
        images.append(np.asarray(cap.image[..., :3], dtype=np.uint8))
        mask = cap.mask
        masks.append(mask.astype(np.uint8))
        if need_depth:
            depths.append(cap.depth_map.astype(np.float32))
            fused.append(cap.fused_depth_map.astype(np.float32))
        else:
            depths.append(np.zeros((h, w), np.float32))
            fused.append(np.zeros((h, w), np.float32))
        intr.append(cap.intrinsic_matrix.astype(np.float32))
        c2w.append(cap.cam_pose.camera_to_world.astype(np.float32))
        nb.append(cap.near["bkg"])
        fb.append(cap.far["bkg"])
        nh.append(cap.near.get("human", 0.0))
        fh.append(cap.far.get("human", 1.0))
        viewf.append(cap.frame_id["frame_id"] / cap.frame_id["total_frames"])

        border = getattr(cap, "border_mask", np.zeros_like(mask))
        # class-sorted permutation: body(0) | border(1) | strict bkg(2)
        # (native counting sort when libneuman_host is built)
        from neuman_tpu import native_bridge

        perm, n_body, n_border = native_bridge.build_class_perm(
            mask.astype(np.uint8), border.astype(np.uint8)
        )
        perms.append(perm)
        body_counts.append(n_body)
        border_counts.append(n_border)
        verts.append(np.asarray(scene.verts[i], dtype=np.float32))

    return RaySceneArrays(
        images=jnp.asarray(np.stack(images)),
        masks=jnp.asarray(np.stack(masks)),
        depths=jnp.asarray(np.stack(depths)),
        fused_depths=jnp.asarray(np.stack(fused)),
        intrinsics=jnp.asarray(np.stack(intr)),
        c2w=jnp.asarray(np.stack(c2w)),
        near_bkg=jnp.asarray(np.array(nb, np.float32)),
        far_bkg=jnp.asarray(np.array(fb, np.float32)),
        near_human=jnp.asarray(np.array(nh, np.float32)),
        far_human=jnp.asarray(np.array(fh, np.float32)),
        viewf=jnp.asarray(np.array(viewf, np.float32)),
        perm=jnp.asarray(np.stack(perms)),
        body_count=jnp.asarray(np.array(body_counts, np.int32)),
        border_count=jnp.asarray(np.array(border_counts, np.int32)),
        verts=jnp.asarray(np.stack(verts)),
    )
