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

from typing import NamedTuple

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
# planarized coordinate-column math
#
# Any materialized [N, C, 3]-shaped gather pads its 3-lane tail to the
# 128-lane tile (42x memory/bandwidth). The KNN fast path therefore carries
# every 3-vector as a tuple of coordinate columns ([N, C] or [N] arrays) —
# the same trick as ops/fused.py, applied to the Ericson region test,
# barycentric weights, and the affine transform blend/inverse.
# ---------------------------------------------------------------------------


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _madd3(a, s, b):
    """a + s * b, per coordinate."""
    return (a[0] + s * b[0], a[1] + s * b[1], a[2] + s * b[2])


def _where3(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def closest_point_on_triangles_planar(p, a, b, c):
    """Planarized Ericson closest-point: p/a/b/c are (x, y, z) column tuples
    of identical shapes. Returns the closest point as a column tuple."""
    ab = _sub3(b, a)
    ac = _sub3(c, a)
    ap = _sub3(p, a)
    d1 = _dot3(ab, ap)
    d2 = _dot3(ac, ap)
    bp = _sub3(p, b)
    d3 = _dot3(ab, bp)
    d4 = _dot3(ac, bp)
    cp = _sub3(p, c)
    d5 = _dot3(ab, cp)
    d6 = _dot3(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    safe = lambda den: jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    v_ab = d1 / safe(d1 - d3)
    w_ac = d2 / safe(d2 - d6)
    w_bc = (d4 - d3) / safe((d4 - d3) + (d5 - d6))
    denom = safe(va + vb + vc)
    v_int = vb / denom
    w_int = vc / denom

    pt_ab = _madd3(a, v_ab, ab)
    pt_ac = _madd3(a, w_ac, ac)
    pt_bc = _madd3(b, w_bc, _sub3(c, b))
    pt_int = _madd3(_madd3(a, v_int, ab), w_int, ac)

    out = pt_int
    out = _where3(in_edge_bc, pt_bc, out)
    out = _where3(in_edge_ac, pt_ac, out)
    out = _where3(in_edge_ab, pt_ab, out)
    out = _where3(in_vert_c, c, out)
    out = _where3(in_vert_b, b, out)
    out = _where3(in_vert_a, a, out)
    return out


def barycentric_planar(closest, v0, v1, v2):
    """Differentiable barycentric weights on column tuples
    (same formulation as `barycentric_coordinates`). Returns (u, v, w)."""
    v0v1 = _sub3(v1, v0)
    v0v2 = _sub3(v2, v0)
    v1v2 = _sub3(v2, v1)
    v2v0 = _sub3(v0, v2)
    v1p = _sub3(closest, v1)
    v2p = _sub3(closest, v2)
    n = _cross3(v0v1, v0v2)
    denom = _dot3(n, n)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    u = _dot3(n, _cross3(v1v2, v1p)) / denom
    v = _dot3(n, _cross3(v2v0, v2p)) / denom
    return u, v, 1.0 - u - v


def _gather_corner_coords(verts, faces, corner, idx):
    """verts [V, 3]; faces [F, 3]; idx [..] face ids -> (x, y, z) columns."""
    vid = faces[:, corner][idx]
    return (verts[:, 0][vid], verts[:, 1][vid], verts[:, 2][vid]), vid


def _packed_face_table(values, faces, pad_to=None):
    """Pack per-vertex values at the 3 corners of every face into one
    row-gatherable table.

    TPU gathers pay per-INDEX, not per-byte: nine separate [N, C] scalar
    gathers measured 2.5s where ONE [N, C] row gather with a packed payload
    takes ~0.1s. values: [V(+J), E]; returns [F, 3*E (padded)] with layout
    [corner0 | corner1 | corner2].
    """
    f = faces.shape[0]
    packed = values[faces].reshape(f, -1)  # [F, 3*E], corner-major
    if pad_to is not None and packed.shape[1] < pad_to:
        packed = jnp.pad(packed, ((0, 0), (0, pad_to - packed.shape[1])))
    return packed


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


def stride_for(samples_per_ray, knn_stride):
    """Legal group-KNN stride for [R, S]-flattened ray samples.

    Groups of `knn_stride` consecutive flat points must stay within one
    ray: if S % stride != 0 a group straddles a ray boundary and its
    midpoint representative can sit far from the group's tail samples,
    silently degrading KNN recall. Falls back to stride 1 in that case.
    """
    if knn_stride > 1 and samples_per_ray % knn_stride == 0:
        return knn_stride
    return 1


class QueryTables(NamedTuple):
    """Precomputed per-mesh tables for the closest-point / signed-distance
    queries. For a mesh whose verts are CONSTANT across queries (the
    canonical Da-pose body: 2 of the train step's 3 queries), building
    these once at setup instead of per query saves the angle-weighted
    normal accumulation (~2.6 ms/query at V=10k) and the packed-corner
    joins. Build with `build_query_tables`."""

    vtab9: jnp.ndarray  # [V, inc_width*9] coordinate rows of incident faces
    vn_pack: jnp.ndarray  # [F, 16] packed per-corner pseudonormals
    vntab9: jnp.ndarray  # [V, inc_width*9] pseudonormal rows of incident faces


def build_query_tables(verts, topology: "MeshTopology"):
    """Precompute QueryTables for constant-vertex meshes (see QueryTables)."""
    inc_width = topology.incidence.shape[1]
    vtab9 = _packed_face_table(verts, topology.faces)[
        jnp.maximum(topology.incidence, 0)
    ].reshape(verts.shape[0], inc_width * 9)
    vn = angle_weighted_vertex_normals(verts, topology.faces)
    vn_pack = _packed_face_table(vn, topology.faces, pad_to=16)
    vntab9 = _packed_face_table(vn, topology.faces)[
        jnp.maximum(topology.incidence, 0)
    ].reshape(verts.shape[0], inc_width * 9)
    return QueryTables(vtab9=vtab9, vn_pack=vn_pack, vntab9=vntab9)


def _query_knn(points, verts, k, exact_knn=False, knn_stride=1,
               knn_impl=None):
    """Vertex-KNN phase shared by the closest-point and fused
    signed-distance queries. Returns (knn_idx [Nq, k], stride) with Nq =
    N // stride (group-KNN: one query per group of `knn_stride`
    consecutive points, represented by its MIDDLE sample — halves the
    worst-case offset vs using the first).

    TPU default: approx_max_k, the hardware bucketed top-k (exact
    lax.top_k lowers to full per-row sorts — measured seconds per step at
    [200k, 6890]). knn_impl="bucketed" selects the streaming Pallas kernel
    instead: equal recall (interleaved buckets, tools/bench_mesh_query.py
    --recall) and the [N, V] distance matrix (8 GB at training size) never
    touches HBM, but it measured ~1.3 ms slower per query on v5e — use it
    when HBM is the constraint. CPU (tests): exact top_k."""
    n_pts = points.shape[0]
    stride = knn_stride if (knn_stride > 1 and n_pts % knn_stride == 0) else 1
    q = (
        points
        if stride == 1
        else points.reshape(n_pts // stride, stride, 3)[:, stride // 2]
    )
    if knn_impl is None:
        knn_impl = (
            "approx"
            if jax.default_backend() == "tpu" and not exact_knn
            else "exact"
        )
    if knn_impl == "bucketed":
        from neuman_tpu.ops.pallas.meshquery import bucketed_knn_pallas

        knn_idx = bucketed_knn_pallas(q, verts, k)
    else:
        v2 = jnp.sum(verts * verts, axis=-1)[None, :]
        p2 = jnp.sum(q * q, axis=-1)[:, None]
        d2_pv = p2 + v2 - 2.0 * (q @ verts.T)
        if knn_impl == "approx":
            _, knn_idx = jax.lax.approx_max_k(-d2_pv, k, recall_target=0.95)
        else:
            _, knn_idx = jax.lax.top_k(-d2_pv, k)
    return knn_idx, stride


def _pallas_candidate_rows(joined_tab, knn_idx_s, nq, c_cands):
    """Join-table rows -> coordinate-major [9*C, Nq] kernel operand."""
    g9 = joined_tab[knn_idx_s].reshape(nq, c_cands, 9)
    return g9.transpose(2, 1, 0).reshape(9 * c_cands, nq)


def point_mesh_closest_planar(points, verts, topology: MeshTopology, k=8,
                              exact_knn=False, knn_stride=1, knn_impl=None,
                              tables: QueryTables = None, use_pallas=None):
    """KNN-accelerated closest point with planarized internals.

    points: [N, 3]; verts: [V, 3]. Returns (dist2 [N], f_id [N], closest as
    an (x, y, z) column tuple of [N] arrays). No [N, C, 3]-shaped
    intermediate is ever materialized. `exact_knn=True` forces exact top-k
    vertex selection on every backend (recall studies / oracles).

    knn_stride > 1 amortizes the vertex-KNN phase over groups of
    `knn_stride` CONSECUTIVE query points: only every stride-th point runs
    the [N, V] distance + top-k, and its candidate faces serve the whole
    group. Sound when consecutive points are spatially adjacent — ray
    samples are ~4 mm apart vs ~2 cm vertex spacing (recall measured in
    tools/bench_mesh_query.py --recall). The Ericson candidate phase still
    runs exactly per point. Callers flattening [R, S, 3] ray samples must
    keep groups within one ray (samples_per_ray % knn_stride == 0 — see
    `stride_for`); this function cannot check that itself.

    NON-DIFFERENTIABLE w.r.t. `verts` on every backend (matching igl,
    whose queries carry no gradient — ref ray_utils.py:69-93): the TPU
    Ericson kernel's custom VJP drops the d2->verts cotangent, so the
    XLA path stop-gradients verts to keep backend-independent semantics.
    Differentiable consumers (the barycentric T-blend) re-derive their
    verts dependence from the returned closest points / face ids.

    use_pallas: None = backend default (Pallas candidate phase on TPU,
    XLA feature-major elsewhere); False = force the XLA path even on TPU
    (the crash-proof fallback bench.py's _pallas_guard relies on);
    True = force the Pallas kernel (interpret-mode off-TPU).
    """
    verts = jax.lax.stop_gradient(verts)
    faces = topology.faces
    n_pts = points.shape[0]
    knn_idx_s, stride = _query_knn(
        points, verts, k, exact_knn=exact_knn, knn_stride=knn_stride,
        knn_impl=knn_impl,
    )
    knn_idx = knn_idx_s

    # Gathers pay per INDEX: fetching the C = k*I candidate faces as [N, C]
    # row gathers costs N*C indices (measured 43 ms of a 53 ms query at
    # C=64). Instead pre-join each VERTEX's incident faces into one
    # [V, I*16] row (V*I indices, negligible) and fetch k rows per point —
    # N*k indices, a 16x reduction for identical candidates.
    inc_width = topology.incidence.shape[1]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # Pallas candidate phase: XLA re-fuses the gather+transpose into
        # every elementwise consumer of the Ericson test and recomputes it
        # (measured 96 ms for 3 ms of math at N=196k, C=24; optimization
        # barriers don't stop it). pallas_call operands are materialized
        # exactly once and the whole region test + select stays in VMEM.
        from neuman_tpu.ops.pallas.meshquery import ericson_select_pallas

        # Every candidate-side table stays at the STRIDED group size: the
        # kernel is group-aware (meshquery._kernel loops the stride members
        # over shared [C, TN] corner planes), so the former host-side lane
        # repeat (170 MB materialized per query at N=196k, C=24, stride=4)
        # and the full-N incidence gather are gone.
        # Layout is COORDINATE-MAJOR ([9*C, Nq], one [C, Nq] sublane block
        # per corner coordinate) so the region test runs at full sublane
        # occupancy.
        vtab9 = (
            tables.vtab9
            if tables is not None
            else _packed_face_table(verts, faces)[
                jnp.maximum(topology.incidence, 0)
            ].reshape(verts.shape[0], inc_width * 9)
        )
        nq = n_pts // stride
        c_cands = k * inc_width
        cand_s = topology.incidence[knn_idx_s].reshape(nq, -1)  # [Nq, C]
        rows9 = _pallas_candidate_rows(vtab9, knn_idx_s, nq, c_cands)
        p3 = points.T  # [3, N]
        d2, f_id, closest = ericson_select_pallas(
            p3, rows9, cand_s.T, stride=stride
        )
        return d2, f_id, closest
    if stride > 1:
        knn_idx = jnp.repeat(knn_idx, stride, axis=0)  # [N, k]
    cand = topology.incidence[knn_idx].reshape(n_pts, -1)  # [N, C]
    valid = cand >= 0
    cand_safe = jnp.maximum(cand, 0)
    tri = _packed_face_table(verts, faces, pad_to=16)
    vtab = tri[jnp.maximum(topology.incidence, 0)].reshape(
        verts.shape[0], inc_width * 16
    )
    rows = vtab[knn_idx].reshape(n_pts, k * inc_width, 16)  # [N, C, 16]
    # Feature-major candidate phase (CPU/tests): the Ericson region test
    # runs on [C, N] columns (lane axis = N, the big one) instead of
    # [N, C] (C = k*I is 9..36, padding the 128-lane tile 4-14x).
    rows = rows.transpose(1, 2, 0)  # [C, 16, N]
    a = (rows[:, 0], rows[:, 1], rows[:, 2])  # each [C, N]
    b = (rows[:, 3], rows[:, 4], rows[:, 5])
    c = (rows[:, 6], rows[:, 7], rows[:, 8])
    p_cols = (points[None, :, 0], points[None, :, 1], points[None, :, 2])  # [1, N]
    cp = closest_point_on_triangles_planar(p_cols, a, b, c)  # tuple of [C, N]
    d2 = (
        (cp[0] - p_cols[0]) ** 2
        + (cp[1] - p_cols[1]) ** 2
        + (cp[2] - p_cols[2]) ** 2
    )
    d2 = jnp.where(valid.T, d2, jnp.inf)
    sel = jnp.argmin(d2, axis=0)  # [N]
    ridx = jnp.arange(n_pts)
    f_id = cand_safe[ridx, sel].astype(jnp.int32)
    closest = (cp[0][sel, ridx], cp[1][sel, ridx], cp[2][sel, ridx])
    return d2[sel, ridx], f_id, closest


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
        d2, f_id, closest = point_mesh_closest_planar(points, verts, topology, k)
        return d2, f_id, jnp.stack(closest, axis=-1)
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


def _corners_at(verts, topology, f_id):
    """Corner coordinate tuples at face ids via one packed row gather."""
    rows = _packed_face_table(verts, topology.faces, pad_to=16)[f_id]  # [N, 16]
    return (
        (rows[:, 0], rows[:, 1], rows[:, 2]),
        (rows[:, 3], rows[:, 4], rows[:, 5]),
        (rows[:, 6], rows[:, 7], rows[:, 8]),
    )


def _signed_distance_planar(points, verts, topology: MeshTopology, k=8,
                            knn_stride=1, tables: QueryTables = None,
                            use_pallas=None, knn_impl=None):
    """(signed_dist [N], f_id [N], closest column-tuple). Planar internals.

    use_pallas: None (auto) / False (pure XLA) / True (Ericson Pallas
    closest-point kernel + XLA sign tail — the TPU default) / "fused"
    (single Ericson+sign kernel, meshquery._signed_kernel). Fusing the
    sign into the kernel was measured SLOWER at the production config
    (N=196k, k=4, tables: 7.2 ms default vs 8.5 ms fused at stride=4;
    20.8 vs 29.4 at stride=1, v5e) — the 9 extra [C, TN] pseudonormal
    input planes cost more than the XLA tail's [Nq, 16] gathers save.
    Kept as an option for HBM-constrained shapes."""
    faces = topology.faces
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas == "fused":
        from neuman_tpu.ops.pallas.meshquery import (
            ericson_signed_select_pallas,
        )

        verts_sg = jax.lax.stop_gradient(verts)
        n_pts = points.shape[0]
        inc_width = topology.incidence.shape[1]
        knn_idx_s, stride = _query_knn(
            points, verts_sg, k, knn_stride=knn_stride, knn_impl=knn_impl
        )
        nq = n_pts // stride
        c_cands = k * inc_width
        if tables is not None:
            vtab9, vntab9 = tables.vtab9, tables.vntab9
        else:
            inc = jnp.maximum(topology.incidence, 0)
            vtab9 = _packed_face_table(verts_sg, faces)[inc].reshape(
                verts_sg.shape[0], inc_width * 9
            )
            vntab9 = _packed_face_table(
                angle_weighted_vertex_normals(verts_sg, faces), faces
            )[inc].reshape(verts_sg.shape[0], inc_width * 9)
        cand_s = topology.incidence[knn_idx_s].reshape(nq, -1)
        rows9 = _pallas_candidate_rows(vtab9, knn_idx_s, nq, c_cands)
        vn9 = _pallas_candidate_rows(vntab9, knn_idx_s, nq, c_cands)
        sd, f_id, closest = ericson_signed_select_pallas(
            points.T, rows9, vn9, cand_s.T, stride=stride
        )
        return sd, f_id, closest

    d2, f_id, closest = point_mesh_closest_planar(
        points, verts, topology, k=k, knn_stride=knn_stride, tables=tables,
        use_pallas=use_pallas, knn_impl=knn_impl,
    )
    c0, c1, c2 = _corners_at(verts, topology, f_id)
    u, v, w = barycentric_planar(closest, c0, c1, c2)
    # pseudonormal at the closest point: bary-weighted vertex pseudonormals
    vn_pack = (
        tables.vn_pack
        if tables is not None
        else _packed_face_table(
            angle_weighted_vertex_normals(verts, faces), faces, pad_to=16
        )
    )
    vrows = vn_pack[f_id]  # [N, 16]
    normal = tuple(
        u * vrows[:, a] + v * vrows[:, 3 + a] + w * vrows[:, 6 + a]
        for a in range(3)
    )
    p_cols = (points[:, 0], points[:, 1], points[:, 2])
    sign = jnp.sign(_dot3(_sub3(p_cols, closest), normal))
    sign = jnp.where(sign == 0, 1.0, sign)
    return sign * jnp.sqrt(jnp.maximum(d2, 0.0)), f_id, closest


def signed_distance(points, verts, topology: MeshTopology, k=8, method="knn",
                    knn_stride=1, tables: QueryTables = None, use_pallas=None,
                    knn_impl=None):
    """Signed distance to a watertight mesh (negative inside).

    Same contract as igl.signed_distance (human_nerf_trainer.py:310-314):
    returns (signed_dist [N], f_id [N], closest [N, 3]). `tables`:
    precomputed QueryTables when `verts` are constant across queries.
    """
    if method == "knn":
        sd, f_id, closest = _signed_distance_planar(
            points, verts, topology, k=k, knn_stride=knn_stride,
            tables=tables, use_pallas=use_pallas, knn_impl=knn_impl,
        )
        return sd, f_id, jnp.stack(closest, axis=-1)
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


def _blend_inverse_affine(closest, f_id, verts, T, topology: MeshTopology,
                          differentiable=False):
    """Barycentric-blend per-vertex 4x4 transforms at the closest point and
    invert, entirely on coordinate/element columns.

    closest: (x, y, z) tuple of [N]; T: [V(+J), 4, 4]. LBS transforms (and
    their convex blends) have an exact (0, 0, 0, 1) last row, so the inverse
    is the affine closed form: R' = inv3x3(R) via adjugate, t' = -R' t.
    Returns 12 columns (i00..i22, t0', t1', t2') of shape [N].
    """
    c0, c1, c2 = _corners_at(verts, topology, f_id)
    if differentiable:
        closest = tuple(jax.lax.stop_gradient(c) for c in closest)
    u, v, w = barycentric_planar(closest, c0, c1, c2)

    # rows 0..2 of each corner's 4x4 (last row is (0,0,0,1)), one row gather
    t12 = T.reshape(T.shape[0], 16)[:, :12]
    trows = _packed_face_table(t12, topology.faces)[f_id]  # [N, 36]
    m = [
        u * trows[:, j] + v * trows[:, 12 + j] + w * trows[:, 24 + j]
        for j in range(12)
    ]
    m00, m01, m02, t0, m10, m11, m12, t1, m20, m21, m22, t2 = m
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
    return (i00, i01, i02, i10, i11, i12, i20, i21, i22, tp0, tp1, tp2)


def apply_affine_cols(aff, p):
    """Apply 12-column affine transform to a point column tuple."""
    (i00, i01, i02, i10, i11, i12, i20, i21, i22, t0, t1, t2) = aff
    return (
        i00 * p[0] + i01 * p[1] + i02 * p[2] + t0,
        i10 * p[0] + i11 * p[1] + i12 * p[2] + t1,
        i20 * p[0] + i21 * p[1] + i22 * p[2] + t2,
    )


def warp_samples_to_canonical(pts, verts, T, topology: MeshTopology, k=8, method="knn",
                              knn_stride=1, use_pallas=None):
    """Inference-time warp: observation samples -> canonical space.

    pts: [R, S, 3]; verts: [V, 3]; T: [V, 4, 4] (or [V+J, 4, 4]; only the
    first V rows are indexed). Returns (can_pts [R, S, 3], can_dirs
    [R, S, 3], closest [R, S, 3]) — parity with ray_utils.py:48-66.
    """
    r, s, _ = pts.shape
    flat = pts.reshape(-1, 3)
    if method == "knn":
        _, f_id, closest_cols = point_mesh_closest_planar(
            flat, verts, topology, k=k, knn_stride=knn_stride,
            use_pallas=use_pallas,
        )
        aff = _blend_inverse_affine(closest_cols, f_id, verts, T, topology)
        can_cols = apply_affine_cols(aff, (flat[:, 0], flat[:, 1], flat[:, 2]))
        can_pts = jnp.stack(can_cols, axis=-1).reshape(r, s, 3)
        closest = jnp.stack(closest_cols, axis=-1)
    else:
        _, f_id, closest = point_mesh_closest(flat, verts, topology, k=k, method=method)
        t_inv = interp_vertex_transforms(closest, f_id, verts, T, topology)
        can = jnp.einsum("nij,nj->ni", t_inv, jnp.concatenate(
            [flat, jnp.ones_like(flat[:, :1])], axis=-1))[:, :3]
        can_pts = can.reshape(r, s, 3)
    can_dirs = can_pts[:, 1:] - can_pts[:, :-1]
    can_dirs = jnp.concatenate([can_dirs, can_dirs[:, -1:]], axis=1)
    can_dirs = can_dirs / (jnp.linalg.norm(can_dirs, axis=2, keepdims=True) + 1e-20)
    return can_pts, can_dirs, closest.reshape(r, s, 3)


def warp_points_to_canonical_diff(pts, verts, T, topology: MeshTopology, k=8,
                                  knn_stride=1, use_pallas=None,
                                  knn_impl=None, need_sd=False):
    """Training-time warp, planar internals: pts [N, 3] -> (can [N, 3],
    f_id [N], signed_dist [N] or None). Same gradient semantics as
    `warp_samples_to_canonical_diff` (closest point / face choice
    stop-gradient; barycentric T-blend differentiable w.r.t. `verts`).

    need_sd=False (production default — both trainer call sites discard
    it): skips the pseudonormal sign explicitly instead of relying on XLA
    DCE to delete it, which keeps the skip independent of the sd
    implementation (the "fused" Pallas variant is an opaque pallas_call
    XLA could NOT dead-code-eliminate) and avoids rebuilding the
    angle-weighted normal join for the warp's per-step posed verts."""
    if need_sd:
        sd, f_id, closest_cols = _signed_distance_planar(
            pts, jax.lax.stop_gradient(verts), topology, k=k,
            knn_stride=knn_stride, use_pallas=use_pallas, knn_impl=knn_impl,
        )
    else:
        sd = None
        _, f_id, closest_cols = point_mesh_closest_planar(
            pts, jax.lax.stop_gradient(verts), topology, k=k,
            knn_stride=knn_stride, use_pallas=use_pallas, knn_impl=knn_impl,
        )
    aff = _blend_inverse_affine(
        closest_cols, f_id, verts, T, topology, differentiable=True
    )
    can_cols = apply_affine_cols(aff, (pts[:, 0], pts[:, 1], pts[:, 2]))
    return jnp.stack(can_cols, axis=-1), f_id, sd


def warp_samples_to_canonical_diff(pts, verts, T, topology: MeshTopology, k=8, method="knn"):
    """Training-time warp: returns (T_interp_inv [N, 4, 4], f_id, signed_dist).

    Matches the reference contract (ray_utils.py:69-93): the closest point /
    face choice carry no gradient, but the barycentric blend is
    differentiable w.r.t. `verts` (and hence SMPL pose/betas through LBS).
    Prefer `warp_points_to_canonical_diff` in new code — it avoids
    materializing [N, 4, 4] transforms.
    """
    sd, f_id, closest = signed_distance(pts, jax.lax.stop_gradient(verts), topology, k=k, method=method)
    t_inv = interp_vertex_transforms(
        closest, f_id, verts, T, topology, differentiable=True
    )
    return t_inv, f_id, sd
