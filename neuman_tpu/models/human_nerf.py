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
    # Planar affine pipeline: [V, 4, 4] intermediates tile as (4, 4) ->
    # (8, 128) on TPU (64x memory blowup) and jnp.linalg.inv LU-decomposes
    # every 4x4. LBS transforms are affine (exact (0,0,0,1) last row), so
    # everything runs on 12 per-vertex columns: closed-form adjugate
    # inverse, elementwise composes, one [V, 16] materialization at the
    # end (measured 13.4 -> ~2 ms per train step).
    _, t_t2pose = smpl_module.verts_transformations(body_model, pose, beta)
    _, t_t2da = smpl_module.verts_transformations(body_model, da_smpl, beta)
    a_cols = _affine_cols(t_t2pose[0])
    b_inv = _affine_inv_cols(_affine_cols(t_t2da[0]))
    t_da2pose = _affine_compose_cols(a_cols, b_inv)
    s = jnp.eye(4, dtype=t_t2pose.dtype).at[:3, :3].mul(scale)
    m = s @ params["alignments"][idx].T  # constant 4x4 (affine) per frame
    t_cols = _affine_compose_const(m, t_da2pose)
    da_verts, _ = smpl_module.smpl_forward(body_model, da_smpl, beta)
    v = da_verts[0]
    world_verts = jnp.stack(
        [
            t_cols[4 * i + 0] * v[:, 0]
            + t_cols[4 * i + 1] * v[:, 1]
            + t_cols[4 * i + 2] * v[:, 2]
            + t_cols[4 * i + 3]
            for i in range(3)
        ],
        axis=-1,
    )[None]
    nv = v.shape[0]
    last = jnp.tile(
        jnp.array([0.0, 0.0, 0.0, 1.0], t_t2pose.dtype)[None], (nv, 1)
    )
    t16 = jnp.concatenate(
        [jnp.stack(t_cols, axis=-1), last], axis=-1
    )  # [V, 16]
    return world_verts, t16.reshape(1, nv, 4, 4)


def _affine_cols(t):
    """[V, 4, 4] affine -> 12 columns (row-major upper 3x4)."""
    return tuple(t[:, i, j] for i in range(3) for j in range(4))


def _affine_inv_cols(c):
    """Closed-form affine inverse on columns: R' = adj(R)/det, t' = -R't."""
    m00, m01, m02, t0, m10, m11, m12, t1, m20, m21, m22, t2 = c
    det = (
        m00 * (m11 * m22 - m12 * m21)
        - m01 * (m10 * m22 - m12 * m20)
        + m02 * (m10 * m21 - m11 * m20)
    )
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    i00 = (m11 * m22 - m12 * m21) / det
    i01 = (m02 * m21 - m01 * m22) / det
    i02 = (m01 * m12 - m02 * m11) / det
    i10 = (m12 * m20 - m10 * m22) / det
    i11 = (m00 * m22 - m02 * m20) / det
    i12 = (m02 * m10 - m00 * m12) / det
    i20 = (m10 * m21 - m11 * m20) / det
    i21 = (m01 * m20 - m00 * m21) / det
    i22 = (m00 * m11 - m01 * m10) / det
    tp0 = -(i00 * t0 + i01 * t1 + i02 * t2)
    tp1 = -(i10 * t0 + i11 * t1 + i12 * t2)
    tp2 = -(i20 * t0 + i21 * t1 + i22 * t2)
    return (i00, i01, i02, tp0, i10, i11, i12, tp1, i20, i21, i22, tp2)


def _affine_compose_cols(a, b):
    """C = A @ B on 12-column affines (per-vertex, elementwise)."""
    out = []
    for i in range(3):
        ar = a[4 * i : 4 * i + 4]
        for j in range(3):
            out.append(
                ar[0] * b[j] + ar[1] * b[4 + j] + ar[2] * b[8 + j]
            )
        out.append(
            ar[0] * b[3] + ar[1] * b[7] + ar[2] * b[11] + ar[3]
        )
    return tuple(out)


def _affine_compose_const(m, b):
    """C = M @ B with a constant affine 4x4 M (scalars broadcast)."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(
                m[i, 0] * b[j] + m[i, 1] * b[4 + j] + m[i, 2] * b[8 + j]
            )
        out.append(
            m[i, 0] * b[3] + m[i, 1] * b[7] + m[i, 2] * b[11] + m[i, 3]
        )
    return tuple(out)


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
