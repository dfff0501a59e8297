"""Device-side triangle-mesh queries (pure JAX) — the libigl replacement.

The reference makes two GPU->CPU->GPU round trips per training step through
libigl (`point_mesh_squared_distance`, `signed_distance`,
`barycentric_coordinates_tri` — utils/ray_utils.py:48-93,
human_nerf_trainer.py:305-343). Here the same queries run on-device with
static shapes:

- `closest_point_on_triangles`: exact point-triangle closest point
  (Ericson's region classification), vectorized over points x faces.
- `point_mesh_closest`: two modes. `brute` scans all faces (oracle / small
  meshes). `knn` first finds the K nearest vertices via one [N, V] matmul
  (MXU) then scans only faces incident to those vertices (vertex->face
  incidence table, padded static shape) — for SMPL (V=6890, deg<=9) this
  cuts the VPU work ~200x versus brute force and is exact whenever the
  closest triangle touches one of the K nearest vertices (true in practice
  for K>=4 on body meshes; tests verify equivalence with brute force).
- `signed_distance`: sign via angle-weighted vertex pseudonormals
  interpolated at the closest point (watertight meshes).
- `barycentric_coordinates`: the differentiable cross/dot formulation used
  by the reference's training warp (ray_utils.py:73-88), so gradients flow
  to mesh vertices while the discrete face choice is stop-gradient.
- `warp_samples_to_canonical[_diff]`: interpolate per-vertex 4x4 LBS
  transforms with barycentric weights, invert, and warp observation-space
  samples into canonical space (ray_utils.py:48-93).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# static topology helpers
# ---------------------------------------------------------------------------


def build_vertex_face_incidence(faces, num_verts):
    """[V, D] face indices incident to each vertex, padded with -1."""
    faces = np.asarray(faces)
    incidence = [[] for _ in range(num_verts)]
    for f_id, f in enumerate(faces):
        for v in f:
            incidence[int(v)].append(f_id)
    max_deg = max(1, max(len(lst) for lst in incidence))
    table = np.full((num_verts, max_deg), -1, dtype=np.int32)
    for v, lst in enumerate(incidence):
        table[v, : len(lst)] = lst
    return table


@struct.dataclass
class MeshTopology:
    """Static mesh connectivity (faces + vertex->face incidence)."""

    faces: jnp.ndarray  # [F, 3] int32
    incidence: jnp.ndarray  # [V, D] int32, -1 padded

    @classmethod
    def build(cls, faces, num_verts):
        faces = np.asarray(faces, dtype=np.int32)
        return cls(
            faces=jnp.asarray(faces),
            incidence=jnp.asarray(build_vertex_face_incidence(faces, num_verts)),
        )


# ---------------------------------------------------------------------------
# exact point-triangle closest point (Ericson, RTCD 5.1.5)
# ---------------------------------------------------------------------------


def closest_point_on_triangles(p, a, b, c):
    """Closest points on triangles (a, b, c) to points p; all [..., 3].

    Broadcasts elementwise over leading dims. Returns closest points [..., 3].
    """
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)

    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)

    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 0.0
    # region masks
    in_vert_a = (d1 <= eps) & (d2 <= eps)
    in_vert_b = (d3 >= -eps) & (d4 <= d3)
    in_vert_c = (d6 >= -eps) & (d5 <= d6)
    in_edge_ab = (vc <= eps) & (d1 >= -eps) & (d3 <= eps)
    in_edge_ac = (vb <= eps) & (d2 >= -eps) & (d6 <= eps)
    in_edge_bc = (va <= eps) & ((d4 - d3) >= -eps) & ((d5 - d6) >= -eps)

    safe = lambda den: jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    v_ab = d1 / safe(d1 - d3)
    w_ac = d2 / safe(d2 - d6)
    w_bc = (d4 - d3) / safe((d4 - d3) + (d5 - d6))
    denom = safe(va + vb + vc)
    v_int = vb / denom
    w_int = vc / denom

    pt_a = a
    pt_b = b
    pt_c = c
    pt_ab = a + v_ab[..., None] * ab
    pt_ac = a + w_ac[..., None] * ac
    pt_bc = b + w_bc[..., None] * (c - b)
    pt_int = a + v_int[..., None] * ab + w_int[..., None] * ac

    # priority: vertex regions, then edges, then interior
    out = pt_int
    out = jnp.where(in_edge_bc[..., None], pt_bc, out)
    out = jnp.where(in_edge_ac[..., None], pt_ac, out)
    out = jnp.where(in_edge_ab[..., None], pt_ab, out)
    out = jnp.where(in_vert_c[..., None], pt_c, out)
    out = jnp.where(in_vert_b[..., None], pt_b, out)
    out = jnp.where(in_vert_a[..., None], pt_a, out)
    return out


# ---------------------------------------------------------------------------
# point -> mesh closest queries
# ---------------------------------------------------------------------------


def _closest_over_faces(points, verts, face_subset, valid_mask=None):
    """points [N, 3] x face_subset [N, C, 3]-indices -> closest over C.

    face_subset: per-point candidate face vertex ids [N, C, 3].
    Returns (dist2 [N], local_argmin [N], closest [N, 3]).
    """
    tri = verts[face_subset]  # [N, C, 3, 3]
    p = points[:, None, :]
    cp = closest_point_on_triangles(p, tri[..., 0, :], tri[..., 1, :], tri[..., 2, :])
    d2 = jnp.sum((cp - p) ** 2, axis=-1)  # [N, C]
    if valid_mask is not None:
        d2 = jnp.where(valid_mask, d2, jnp.inf)
    idx = jnp.argmin(d2, axis=-1)  # [N]
    n = jnp.arange(points.shape[0])
    return d2[n, idx], idx, cp[n, idx]


def point_mesh_closest(points, verts, topology: MeshTopology, k=8, method="knn"):
    """Closest point on a triangle mesh for each query point.

    points: [N, 3]; verts: [V, 3]. Returns (dist2 [N], f_id [N], closest
    [N, 3]) — the same triple as igl.point_mesh_squared_distance
    (ray_utils.py:53).
    """
    faces = topology.faces
    if method == "brute":
        face_subset = jnp.broadcast_to(
            faces[None], (points.shape[0],) + faces.shape
        )
        d2, local, cp = _closest_over_faces(points, verts, face_subset)
        return d2, local.astype(jnp.int32), cp
    elif method == "knn":
        # [N, V] squared distances via matmul (MXU), then top-k verts.
        v2 = jnp.sum(verts * verts, axis=-1)[None, :]
        p2 = jnp.sum(points * points, axis=-1)[:, None]
        d2_pv = p2 + v2 - 2.0 * (points @ verts.T)
        _, knn_idx = jax.lax.top_k(-d2_pv, k)  # [N, k]
        cand = topology.incidence[knn_idx]  # [N, k, D]
        cand = cand.reshape(points.shape[0], -1)  # [N, k*D]
        valid = cand >= 0
        cand_safe = jnp.maximum(cand, 0)
        face_subset = faces[cand_safe]  # [N, C, 3]
        d2, local, cp = _closest_over_faces(points, verts, face_subset, valid)
        n = jnp.arange(points.shape[0])
        return d2, cand_safe[n, local].astype(jnp.int32), cp
    raise ValueError(method)


def angle_weighted_vertex_normals(verts, faces):
    """[V, 3] pseudonormals: per-face normals scatter-added with corner
    angles as weights (Baerentzen-Aanaes sign test)."""
    tri = verts[faces]  # [F, 3, 3]
    e0 = tri[:, 1] - tri[:, 0]
    e1 = tri[:, 2] - tri[:, 1]
    e2 = tri[:, 0] - tri[:, 2]
    n = jnp.cross(e0, -e2)  # face normal (unnormalized)
    n_unit = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-20)

    def corner_angle(u, v):
        cu = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-20)
        cv = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-20)
        return jnp.arccos(jnp.clip(jnp.sum(cu * cv, axis=-1), -1.0, 1.0))

    a0 = corner_angle(e0, -e2)
    a1 = corner_angle(e1, -e0)
    a2 = corner_angle(e2, -e1)

    vn = jnp.zeros_like(verts)
    vn = vn.at[faces[:, 0]].add(n_unit * a0[:, None])
    vn = vn.at[faces[:, 1]].add(n_unit * a1[:, None])
    vn = vn.at[faces[:, 2]].add(n_unit * a2[:, None])
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-20)


def barycentric_coordinates(closest, tri):
    """Differentiable barycentric coords of points on triangles.

    closest: [N, 3] points on the triangles; tri: [N, 3, 3] vertices.
    Uses the cross/dot formulation of the reference's differentiable warp
    (ray_utils.py:73-88) so gradients flow to the triangle vertices.
    Returns [N, 3] weights for (v0, v1, v2).

    NOTE (parity): like the reference, the weight stack order is (u, v, w)
    where u weights v0, v = weight of v1, w = weight of v2.
    """
    v0v1 = tri[:, 1] - tri[:, 0]
    v0v2 = tri[:, 2] - tri[:, 0]
    v1v2 = tri[:, 2] - tri[:, 1]
    v2v0 = tri[:, 0] - tri[:, 2]
    v1p = closest - tri[:, 1]
    v2p = closest - tri[:, 2]
    n = jnp.cross(v0v1, v0v2)
    denom = jnp.sum(n * n, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    u = jnp.sum(n * jnp.cross(v1v2, v1p), axis=-1) / denom
    v = jnp.sum(n * jnp.cross(v2v0, v2p), axis=-1) / denom
    w = 1.0 - u - v
    return jnp.stack([u, v, w], axis=1)


def signed_distance(points, verts, topology: MeshTopology, k=8, method="knn"):
    """Signed distance to a watertight mesh (negative inside).

    Same contract as igl.signed_distance (human_nerf_trainer.py:310-314):
    returns (signed_dist [N], f_id [N], closest [N, 3]).
    """
    d2, f_id, closest = point_mesh_closest(points, verts, topology, k=k, method=method)
    vn = angle_weighted_vertex_normals(verts, topology.faces)
    tri_ids = topology.faces[f_id]  # [N, 3]
    tri = verts[tri_ids]
    bary = barycentric_coordinates(closest, tri)
    # pseudonormal at the closest point: bary-weighted vertex pseudonormals
    normal = jnp.einsum("nc,ncd->nd", bary, vn[tri_ids])
    sign = jnp.sign(jnp.sum((points - closest) * normal, axis=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return sign * jnp.sqrt(jnp.maximum(d2, 0.0)), f_id, closest


# ---------------------------------------------------------------------------
# canonical-space warps
# ---------------------------------------------------------------------------


def interp_vertex_transforms(closest, f_id, verts, T, topology: MeshTopology,
                             differentiable=False):
    """Blend per-vertex 4x4 transforms at the closest surface point and
    invert: T_interp_inv [N, 4, 4] (ref: ray_utils.py:56-57, 90-92)."""
    tri_ids = topology.faces[f_id]  # [N, 3]
    tri = verts[tri_ids]  # [N, 3, 3]
    if differentiable:
        closest = jax.lax.stop_gradient(closest)
    bary = barycentric_coordinates(closest, tri)
    t_interp = jnp.einsum("nc,ncij->nij", bary, T[tri_ids])
    return jnp.linalg.inv(t_interp)


def warp_samples_to_canonical(pts, verts, T, topology: MeshTopology, k=8, method="knn"):
    """Inference-time warp: observation samples -> canonical space.

    pts: [R, S, 3]; verts: [V, 3]; T: [V, 4, 4] (or [V+J, 4, 4]; only the
    first V rows are indexed). Returns (can_pts [R, S, 3], can_dirs
    [R, S, 3], closest [R, S, 3]) — parity with ray_utils.py:48-66.
    """
    r, s, _ = pts.shape
    flat = pts.reshape(-1, 3)
    _, f_id, closest = point_mesh_closest(flat, verts, topology, k=k, method=method)
    t_inv = interp_vertex_transforms(closest, f_id, verts, T, topology)
    can = jnp.einsum("nij,nj->ni", t_inv, jnp.concatenate(
        [flat, jnp.ones_like(flat[:, :1])], axis=-1))[:, :3]
    can_pts = can.reshape(r, s, 3)
    can_dirs = can_pts[:, 1:] - can_pts[:, :-1]
    can_dirs = jnp.concatenate([can_dirs, can_dirs[:, -1:]], axis=1)
    can_dirs = can_dirs / (jnp.linalg.norm(can_dirs, axis=2, keepdims=True) + 1e-20)
    return can_pts, can_dirs, closest.reshape(r, s, 3)


def warp_samples_to_canonical_diff(pts, verts, T, topology: MeshTopology, k=8, method="knn"):
    """Training-time warp: returns (T_interp_inv [N, 4, 4], f_id, signed_dist).

    Matches the reference contract (ray_utils.py:69-93): the closest point /
    face choice carry no gradient, but the barycentric blend is
    differentiable w.r.t. `verts` (and hence SMPL pose/betas through LBS).
    """
    sd, f_id, closest = signed_distance(pts, jax.lax.stop_gradient(verts), topology, k=k, method=method)
    t_inv = interp_vertex_transforms(
        closest, f_id, verts, T, topology, differentiable=True
    )
    return t_inv, f_id, sd
