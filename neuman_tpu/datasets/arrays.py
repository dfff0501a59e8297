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


def build_scene_arrays(scene, view_indices=None, need_depth=True,
                       use_fused_depth=None):
    """Stage a (subset of a) NeuMan scene into device arrays.

    view_indices: capture indices to include (default: all). Captures must
    already have border masks (utils.misc.add_border_mask).

    HBM slimming: a stage that never reads a depth source must not stage
    it — at bike-scene scale each [N, H, W] f32 plane is ~369 MB HBM
    (100 x 1280x720 x 4 B). need_depth=False (the human stage) stages
    [N, 1, 1] placeholders for BOTH sources; use_fused_depth=True/False
    (the bkg stage's static sampler flag, sampler.py:91) stages only the
    source that will be gathered. use_fused_depth=None keeps both.
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
    placeholder = np.zeros((1, 1), np.float32)
    for i, cap in zip(view_indices, caps):
        images.append(np.asarray(cap.image[..., :3], dtype=np.uint8))
        mask = cap.mask
        masks.append(mask.astype(np.uint8))
        if need_depth and use_fused_depth is not True:
            depths.append(cap.depth_map.astype(np.float32))
        else:
            depths.append(placeholder)
        if need_depth and use_fused_depth is not False:
            fused.append(cap.fused_depth_map.astype(np.float32))
        else:
            fused.append(placeholder)
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


def staged_nbytes(arrays: RaySceneArrays) -> int:
    """Total HBM bytes of the staged scene arrays."""
    import jax

    return sum(int(a.nbytes) for a in jax.tree_util.tree_leaves(arrays))


def projected_staged_bytes(num_views, h, w, num_verts=6890, need_depth=True,
                           single_depth=True):
    """Predicted staged-array HBM footprint (bytes) for a scene of
    `num_views` x `h`x`w` frames — the budget model documented in
    BASELINE.md ("HBM budget at real-scene scale"). Mirrors
    build_scene_arrays' dtypes/shapes exactly (tested)."""
    hw = h * w
    n_depth_planes = 0 if not need_depth else (1 if single_depth else 2)
    per_view = (
        hw * 3          # images uint8
        + hw            # masks uint8
        + hw * 4 * n_depth_planes  # f32 depth planes
        + hw * 4        # perm int32
        + (9 + 16) * 4  # intrinsics + c2w
        + num_verts * 3 * 4  # posed verts
        + 7 * 4         # near/far x4, viewf, body/border counts
    )
    placeholder = 0 if n_depth_planes == 2 else (2 - n_depth_planes) * num_views * 4
    return num_views * per_view + placeholder
