"""HumanNeRF composite model (functional).

Parity with the reference models/human_nerf.py:20-122:
- coarse+fine background joiners, N offset nets (randomly selected per step),
  a canonical ("coarse human") net with min_freq forced to 0, the
  `can_posenc` mapping ('rotate' by default) and viewdirs gated by
  `specular_can`;
- learnable per-frame SMPL parameters: `poses`, `betas`, `alignments`;
- `vertex_forward`: SMPL per-vertex transforms for the current pose and the
  Da-pose, composed into `T_da2scene = scaleEye @ alignment.T @ T_t2pose @
  inv(T_t2da)` and applied to Da-pose verts.

Specs (static) and params (trainable pytrees) are separate so the whole
model state threads through jit/grad/optax untouched.
"""

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.models import smpl as smpl_module


@struct.dataclass
class HumanNeRFSpec:
    bkg: nerf_module.JoinerSpec = struct.field(pytree_node=False)
    human: nerf_module.JoinerSpec = struct.field(pytree_node=False)
    offset: nerf_module.OffsetNetSpec = struct.field(pytree_node=False)
    num_offset_nets: int = struct.field(pytree_node=False, default=1)


def build_human_nerf_spec(opt):
    bkg = nerf_module.build_nerf_specs(opt)
    # canonical space always uses 0 as minimum frequency, can_posenc mapping,
    # and viewdirs only if specular_can (ref: human_nerf.py:26-30)
    can_opt = copy.copy(opt)
    if dataclasses.is_dataclass(can_opt):
        can_opt = dataclasses.replace(
            opt,
            pos_min_freq=0,
            use_viewdirs=opt.specular_can,
            posenc=opt.can_posenc,
        )
    else:
        can_opt.pos_min_freq = 0
        can_opt.use_viewdirs = opt.specular_can
        can_opt.posenc = opt.can_posenc
    human = nerf_module.build_nerf_specs(can_opt)
    offset = nerf_module.build_offset_net_spec(opt)
    return HumanNeRFSpec(
        bkg=bkg, human=human, offset=offset, num_offset_nets=opt.num_offset_nets
    )


def init_human_nerf_params(key, spec: HumanNeRFSpec, poses=None, betas=None, alignments=None):
    """Initialize all network params (+ optional learnable SMPL state).

    poses: [N, J*3]; betas: [N, nb]; alignments: [N, 4, 4].
    """
    keys = jax.random.split(key, 4 + spec.num_offset_nets)
    params = {
        "coarse_bkg_net": nerf_module.init_nerf_params(keys[0], spec.bkg.nerf),
        "fine_bkg_net": nerf_module.init_nerf_params(keys[1], spec.bkg.nerf),
        "coarse_human_net": nerf_module.init_nerf_params(keys[2], spec.human.nerf),
        "offset_nets": [
            nerf_module.init_nerf_params(keys[4 + i], spec.offset.nerf)
            for i in range(spec.num_offset_nets)
        ],
    }
    if poses is not None:
        assert betas is not None and alignments is not None
        params["poses"] = jnp.asarray(poses, dtype=jnp.float32)
        params["betas"] = jnp.asarray(betas, dtype=jnp.float32)
        params["alignments"] = jnp.asarray(alignments, dtype=jnp.float32)
    return params


def da_pose_params(num_joints=24):
    """Da-pose buffer (non-trainable; ref human_nerf.py:44-48)."""
    return jnp.asarray(smpl_module.da_pose_vector(num_joints))


def vertex_forward(
    spec: HumanNeRFSpec,
    params,
    body_model: smpl_module.SMPLModel,
    da_smpl,
    scale,
    idx,
    pose=None,
    beta=None,
):
    """World-space posed verts + per-vertex Da-pose->scene transforms.

    idx indexes the learnable per-frame SMPL parameters (traced ints are
    fine). Returns (world_verts [1, V, 3], T_da2scene [1, V, 4, 4]) —
    parity with ref models/human_nerf.py:92-122.
    """
    if pose is None:
        pose = params["poses"][idx][None]
    if beta is None:
        beta = params["betas"][idx][None]
    _, t_t2pose = smpl_module.verts_transformations(body_model, pose, beta)
    _, t_t2da = smpl_module.verts_transformations(body_model, da_smpl, beta)
    t_da2pose = t_t2pose @ jnp.linalg.inv(t_t2da)
    t_da2scene = params["alignments"][idx].T @ t_da2pose
    s = jnp.eye(4, dtype=t_da2scene.dtype).at[:3, :3].mul(scale)
    t_da2scene = s @ t_da2scene
    da_verts, _ = smpl_module.smpl_forward(body_model, da_smpl, beta)
    homog = jnp.concatenate(
        [da_verts[0], jnp.ones_like(da_verts[0][:, :1])], axis=-1
    )
    world_verts = jnp.einsum("vij,vj->vi", t_da2scene[0], homog)[:, :3][None]
    return world_verts, t_da2scene


def apply_coarse_bkg(spec, params, pts, dirs, compute_dtype=jnp.float32):
    return nerf_module.apply_joiner(
        spec.bkg, params["coarse_bkg_net"], pts, dirs, compute_dtype=compute_dtype
    )


def apply_fine_bkg(spec, params, pts, dirs, compute_dtype=jnp.float32):
    return nerf_module.apply_joiner(
        spec.bkg, params["fine_bkg_net"], pts, dirs, compute_dtype=compute_dtype
    )


def apply_coarse_human(spec, params, pts, dirs, compute_dtype=jnp.float32):
    return nerf_module.apply_joiner(
        spec.human, params["coarse_human_net"], pts, dirs, compute_dtype=compute_dtype
    )


def apply_offset_net(spec, params, which, pts_t, offset_scale, compute_dtype=jnp.float32):
    """Apply offset net `which` (randomly chosen per step by the trainer —
    ref human_nerf_trainer.py:261). `which` may be traced; nets share a
    spec so lax.switch dispatches between parameter pytrees."""
    if spec.num_offset_nets == 1:
        return nerf_module.apply_offset_net(
            spec.offset, params["offset_nets"][0], pts_t, offset_scale,
            compute_dtype=compute_dtype,
        )
    branches = [
        (lambda p: (lambda _: nerf_module.apply_offset_net(
            spec.offset, p, pts_t, offset_scale, compute_dtype=compute_dtype
        )))(p)
        for p in params["offset_nets"]
    ]
    return jax.lax.switch(which, branches, operand=None)


def load_da_external_pose(poses_np):
    return np.asarray(poses_np, dtype=np.float32)
