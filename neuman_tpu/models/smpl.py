"""SMPL body model in JAX.

Functional re-implementation of linear blend skinning with the same semantics
as the reference (models/smpl.py:266-505, itself based on ROMP/SMPL-X):

- `batch_rodrigues`: axis-angle -> rotation matrices (ref: smpl.py:407-438)
- `batch_rigid_transform`: kinematic-chain accumulation; the reference's
  sequential python loop over 24 joints (smpl.py:487-493) becomes an unrolled
  fixed-topology chain under jit (SMPL's kinematic tree is topologically
  sorted, so parent transforms are always available).
- `lbs`: blend shapes -> joints -> Rodrigues -> chain -> per-vertex T = W @ A
  (ref: smpl.py:266-360). NOTE: the reference computes pose blend-shape
  offsets but then discards them (`v_posed = v_shaped`, smpl.py:325-334); we
  reproduce that behavior (and skip the dead compute).
- `verts_transformations` / `forward`: ref smpl.py:109-215.

All functions are differentiable w.r.t. poses and betas, which the human
trainer relies on (learnable per-frame SMPL parameters,
models/human_nerf.py:35-37).

The neutral-body data file `SMPL_NEUTRAL.pkl` is licensed by MPG and not
shipped; `load_smpl` reads it when present, and tests use
`synthetic_smpl_model`.
"""

import os
import pickle

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SMPLModel:
    """SMPL template buffers as a pytree (static topology kept host-side)."""

    v_template: jnp.ndarray  # [V, 3]
    shapedirs: jnp.ndarray  # [V, 3, B]
    posedirs: jnp.ndarray  # [(J-1)*9, V*3] (kept for API parity; unused, see lbs)
    J_regressor: jnp.ndarray  # [J, V]
    lbs_weights: jnp.ndarray  # [V, J]
    parents: tuple = struct.field(pytree_node=False)  # len J, parents[0] == -1
    faces: np.ndarray = struct.field(pytree_node=False)  # [F, 3] int32

    @property
    def num_verts(self):
        return self.v_template.shape[0]

    @property
    def num_joints(self):
        return self.J_regressor.shape[0]


def _to_dense(a):
    if hasattr(a, "todense"):
        a = a.todense()
    return np.array(a, dtype=np.float32)


def load_smpl(model_path, gender="neutral"):
    """Load an SMPL pickle (`SMPL_NEUTRAL.pkl`) into an `SMPLModel`."""
    if os.path.isdir(model_path):
        model_path = os.path.join(model_path, f"SMPL_{gender.upper()}.pkl")
    assert os.path.exists(model_path), f"Path {model_path} does not exist!"
    with open(model_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    posedirs = _to_dense(data["posedirs"])  # [V, 3, (J-1)*9]
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = _to_dense(data["kintree_table"]).astype(np.int64)[0]
    parents[0] = -1
    return SMPLModel(
        v_template=jnp.asarray(_to_dense(data["v_template"])),
        shapedirs=jnp.asarray(_to_dense(data["shapedirs"])),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(_to_dense(data["J_regressor"])),
        lbs_weights=jnp.asarray(_to_dense(data["weights"])),
        parents=tuple(int(p) for p in parents),
        faces=np.array(data["f"], dtype=np.int32),
    )


def synthetic_smpl_model(num_verts=64, num_joints=6, num_betas=10, seed=0):
    """Small consistent SMPL-like model for tests (chain kinematic tree)."""
    rng = np.random.default_rng(seed)
    v_template = rng.normal(size=(num_verts, 3)).astype(np.float32)
    shapedirs = (rng.normal(size=(num_verts, 3, num_betas)) * 0.01).astype(np.float32)
    posedirs = (
        rng.normal(size=((num_joints - 1) * 9, num_verts * 3)) * 0.001
    ).astype(np.float32)
    j_reg = rng.uniform(size=(num_joints, num_verts)).astype(np.float32)
    j_reg /= j_reg.sum(axis=1, keepdims=True)
    w = rng.uniform(size=(num_verts, num_joints)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    parents = tuple([-1] + list(range(num_joints - 1)))
    # arbitrary but valid triangulation over vertex indices
    faces = rng.integers(0, num_verts, size=(2 * num_verts, 3)).astype(np.int32)
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(w),
        parents=parents,
        faces=faces,
    )


def da_pose_vector(num_joints=24):
    """The 大 ("Da") rest pose: legs spread via +-z axis-angle on the hip
    joints (ref: data_io/neuman_helper.py:292-297). Shape [1, J*3]."""
    da = np.zeros((num_joints, 3), dtype=np.float32)
    da[1] = np.array([0, 0, 1.0])
    da[2] = np.array([0, 0, -1.0])
    return da.reshape(1, -1)


def batch_rodrigues(rot_vecs, epsilon=1e-8):
    """Axis-angle [N, 3] -> rotation matrices [N, 3, 3] (Rodrigues)."""
    angle = jnp.linalg.norm(rot_vecs + epsilon, axis=1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[:, None]
    sin = jnp.sin(angle)[:, None]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    k = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3, dtype=rot_vecs.dtype)[None]
    return ident + sin * k + (1 - cos) * jnp.matmul(k, k)


def blend_shapes(betas, shape_disps):
    """betas [B, nb] x shape_disps [V, 3, nb] -> [B, V, 3]."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor, vertices):
    """J_regressor [J, V] x vertices [B, V, 3] -> [B, J, 3]."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def transform_mat(rot, t):
    """rot [..., 3, 3], t [..., 3] -> homogeneous [..., 4, 4]."""
    batch = rot.shape[:-2]
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(rot_mats, joints, parents):
    """Accumulate rigid transforms along the kinematic tree.

    rot_mats: [B, J, 3, 3]; joints: [B, J, 3]; parents: static tuple.
    Returns (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
    rel_transforms maps rest-pose-relative coordinates (ref: smpl.py:454-505).
    """
    num_joints = len(parents)
    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, [p for p in parents[1:]]]], axis=1
    )
    transforms_mat = transform_mat(rot_mats, rel_joints)  # [B, J, 4, 4]

    # Unrolled chain: SMPL's tree is topologically sorted (parents[i] < i).
    chain = [transforms_mat[:, 0]]
    for i in range(1, num_joints):
        chain.append(jnp.matmul(chain[parents[i]], transforms_mat[:, i]))
    transforms = jnp.stack(chain, axis=1)  # [B, J, 4, 4]

    posed_joints = transforms[:, :, :3, 3]
    # Subtract the transformed rest-joint position from the translation column
    # so T maps rest-space points directly.
    correction = jnp.einsum("bjmk,bjk->bjm", transforms[..., :3, :3], joints)
    rel = transforms.at[..., :3, 3].add(-correction)
    return posed_joints, rel


def lbs(betas, pose, model: SMPLModel, pose2rot=True, return_T=False, concat_joints=False):
    """Linear blend skinning (ref semantics: smpl.py:266-360).

    betas: [B, nb]; pose: [B, J*3] axis-angle (or [B, J, 3, 3] if not
    pose2rot). Returns (verts, joints) or, with return_T, (T [B, V, 4, 4],
    v_posed [B, V, 3]) optionally concatenated with joint transforms.
    """
    batch_size = max(betas.shape[0], pose.shape[0])
    num_joints = model.num_joints

    v_shaped = model.v_template[None] + blend_shapes(betas, model.shapedirs)
    joints = vertices2joints(model.J_regressor, v_shaped)

    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(
            batch_size, -1, 3, 3
        )
    else:
        rot_mats = pose.reshape(batch_size, -1, 3, 3)

    # Pose blend shapes intentionally skipped: the reference computes but
    # discards them (smpl.py:325-334) — v_posed == v_shaped.
    v_posed = v_shaped

    j_transformed, rel_transforms = batch_rigid_transform(
        rot_mats, joints, model.parents
    )

    # T = W @ A : [B, V, J] x [B, J, 16] -> [B, V, 4, 4]
    w = jnp.broadcast_to(
        model.lbs_weights[None], (batch_size,) + model.lbs_weights.shape
    )
    t_per_vert = jnp.matmul(
        w, rel_transforms.reshape(batch_size, num_joints, 16)
    ).reshape(batch_size, -1, 4, 4)

    if return_T:
        if concat_joints:
            return (
                jnp.concatenate([t_per_vert, rel_transforms], axis=1),
                jnp.concatenate([v_posed, joints], axis=1),
            )
        return t_per_vert, v_posed

    homog = jnp.concatenate(
        [v_posed, jnp.ones_like(v_posed[..., :1])], axis=2
    )
    verts = jnp.einsum("bvij,bvj->bvi", t_per_vert, homog)[..., :3]
    return verts, j_transformed


def verts_transformations(model, poses, betas, transl=None, concat_joints=False):
    """Per-vertex 4x4 LBS transforms + rest-pose verts (ref: smpl.py:109-162).

    poses: [1, J*3], betas: [1, nb]. Returns (vertices [1, V, 3], T [1, V, 4, 4]).
    """
    t_per_vert, vertices = lbs(
        betas, poses, model, return_T=True, concat_joints=concat_joints
    )
    if transl is not None:
        transl_mat = jnp.eye(4)[None].at[:, :3, 3].set(transl)
        t_per_vert = jnp.matmul(transl_mat[:, None], t_per_vert)
    return vertices, t_per_vert


def smpl_forward(model, poses, betas, transl=None):
    """Posed vertices and joints (ref: smpl.py:164-215).

    poses: [B, J*3]; betas: [B, nb]. Returns (verts [B, V, 3], joints [B, J, 3]).
    """
    verts, joints = lbs(betas, poses, model)
    if transl is not None:
        verts = verts + transl[:, None]
        joints = joints + transl[:, None]
    return verts, joints
