"""Mesh-query tests: closest point, signed distance, barycentric warp.

Oracles: brute-force numpy implementations and analytically known shapes
(unit cube, icosphere-like meshes).
"""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.ops import mesh as mesh_ops


def make_cube():
    """Unit cube centered at origin, 12 triangles, outward normals."""
    v = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        dtype=np.float32,
    ) * 0.5
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom (z=-.5), outward -z
            [4, 5, 6], [4, 6, 7],  # top (+z)
            [0, 1, 5], [0, 5, 4],  # -y
            [2, 3, 7], [2, 7, 6],  # +y
            [0, 4, 7], [0, 7, 3],  # -x
            [1, 2, 6], [1, 6, 5],  # +x
        ],
        dtype=np.int32,
    )
    return v, f


def brute_closest_numpy(points, verts, faces):
    """Reference oracle: exact closest point via per-face computation."""
    tri = verts[faces]  # [F, 3, 3]
    best_d2 = np.full(len(points), np.inf)
    best_f = np.zeros(len(points), dtype=np.int64)
    best_p = np.zeros((len(points), 3))
    for fi in range(len(faces)):
        a, b, c = tri[fi]
        cp = np.asarray(
            mesh_ops.closest_point_on_triangles(
                jnp.asarray(points), jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
            )
        )
        d2 = ((cp - points) ** 2).sum(axis=1)
        upd = d2 < best_d2
        best_d2[upd] = d2[upd]
        best_f[upd] = fi
        best_p[upd] = cp[upd]
    return best_d2, best_f, best_p


def test_closest_point_on_triangle_regions():
    a = jnp.array([0.0, 0.0, 0.0])
    b = jnp.array([1.0, 0.0, 0.0])
    c = jnp.array([0.0, 1.0, 0.0])
    # interior projection
    p = jnp.array([0.25, 0.25, 1.0])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.closest_point_on_triangles(p, a, b, c)),
        [0.25, 0.25, 0.0],
        atol=1e-6,
    )
    # vertex region
    p = jnp.array([-1.0, -1.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.closest_point_on_triangles(p, a, b, c)), [0, 0, 0], atol=1e-6
    )
    # edge ab region
    p = jnp.array([0.5, -2.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.closest_point_on_triangles(p, a, b, c)), [0.5, 0, 0], atol=1e-6
    )
    # edge bc region
    p = jnp.array([1.0, 1.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.closest_point_on_triangles(p, a, b, c)), [0.5, 0.5, 0], atol=1e-6
    )


def test_point_mesh_closest_cube_analytic():
    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    pts = jnp.array([[0.0, 0.0, 2.0], [2.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d2, f_id, cp = mesh_ops.point_mesh_closest(pts, jnp.asarray(v), topo, method="brute")
    d = np.sqrt(np.asarray(d2))
    np.testing.assert_allclose(d[0], 1.5, atol=1e-5)
    np.testing.assert_allclose(d[1], 1.5, atol=1e-5)
    np.testing.assert_allclose(d[2], 0.5, atol=1e-5)  # center -> face
    np.testing.assert_allclose(np.asarray(cp[0]), [0, 0, 0.5], atol=1e-5)


def test_knn_matches_brute_on_random_mesh():
    rng = np.random.default_rng(0)
    # a random blobby mesh: perturbed sphere triangulation via convex hull
    from scipy.spatial import ConvexHull

    dirs = rng.normal(size=(80, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    verts = (dirs * (1 + 0.2 * rng.uniform(size=(80, 1)))).astype(np.float32)
    hull = ConvexHull(verts)
    faces = hull.simplices.astype(np.int32)
    topo = mesh_ops.MeshTopology.build(faces, len(verts))

    points = rng.normal(size=(200, 3)).astype(np.float32) * 1.5
    d2_b, f_b, cp_b = mesh_ops.point_mesh_closest(
        jnp.asarray(points), jnp.asarray(verts), topo, method="brute"
    )
    d2_k, f_k, cp_k = mesh_ops.point_mesh_closest(
        jnp.asarray(points), jnp.asarray(verts), topo, method="knn", k=8
    )
    np.testing.assert_allclose(np.asarray(d2_k), np.asarray(d2_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp_k), np.asarray(cp_b), atol=1e-4)

    # and against the numpy oracle
    d2_o, _, _ = brute_closest_numpy(points, verts, faces)
    np.testing.assert_allclose(np.asarray(d2_b), d2_o, atol=1e-5)


def test_signed_distance_cube():
    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],  # inside center
            [0.3, 0.3, 0.3],  # inside corner-ish
            [0.0, 0.0, 1.0],  # outside above
            [1.0, 1.0, 1.0],  # outside corner
        ]
    )
    sd, _, _ = mesh_ops.signed_distance(pts, jnp.asarray(v), topo, method="brute")
    sd = np.asarray(sd)
    assert sd[0] < 0 and np.isclose(abs(sd[0]), 0.5, atol=1e-5)
    assert sd[1] < 0
    assert sd[2] > 0 and np.isclose(sd[2], 0.5, atol=1e-5)
    assert sd[3] > 0 and np.isclose(sd[3], np.sqrt(3 * 0.25), atol=1e-5)


def test_barycentric_coordinates():
    tri = jnp.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    # vertex order in weights: [u(v0), v(v1), w(v2)]
    p = jnp.array([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.barycentric_coordinates(p, tri))[0], [1, 0, 0], atol=1e-6
    )
    p = jnp.array([[1.0, 0.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.barycentric_coordinates(p, tri))[0], [0, 1, 0], atol=1e-6
    )
    p = jnp.array([[1 / 3, 1 / 3, 0.0]])
    np.testing.assert_allclose(
        np.asarray(mesh_ops.barycentric_coordinates(p, tri))[0],
        [1 / 3, 1 / 3, 1 / 3],
        atol=1e-6,
    )
    # reconstruction property for arbitrary points in the plane
    rng = np.random.default_rng(0)
    pts = np.zeros((10, 3))
    pts[:, :2] = rng.uniform(0, 0.5, size=(10, 2))
    bary = np.asarray(mesh_ops.barycentric_coordinates(jnp.asarray(pts), jnp.tile(tri, (10, 1, 1))))
    recon = np.einsum("nc,ncd->nd", bary, np.tile(np.asarray(tri), (10, 1, 1)))
    np.testing.assert_allclose(recon, pts, atol=1e-5)


def test_warp_identity_transforms():
    """With identity per-vertex transforms the warp is a no-op."""
    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    T = jnp.tile(jnp.eye(4)[None], (len(v), 1, 1))
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-0.4, 0.4, size=(4, 6, 3)).astype(np.float32)
    )
    can_pts, can_dirs, closest = mesh_ops.warp_samples_to_canonical(
        pts, jnp.asarray(v), T, topo, method="brute"
    )
    np.testing.assert_allclose(np.asarray(can_pts), np.asarray(pts), atol=1e-5)
    assert np.allclose(np.linalg.norm(np.asarray(can_dirs), axis=-1), 1.0, atol=1e-5)


def test_warp_rigid_transform_inverts():
    """If all vertex transforms are a rigid motion M, warp applies M^-1."""
    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    from neuman_tpu.geometry import transforms

    m = transforms.rotation_matrix(0.7, [0, 0, 1]) @ transforms.translation_matrix(
        [0.2, -0.1, 0.3]
    )
    # posed verts = M @ rest verts; T per vertex = M
    v_posed = (np.asarray(v) @ m[:3, :3].T) + m[:3, 3]
    T = jnp.tile(jnp.asarray(m, dtype=jnp.float32)[None], (len(v), 1, 1))
    pts_obs = jnp.asarray(v_posed[None, :5] * 0.9, dtype=jnp.float32)  # near surface
    can_pts, _, _ = mesh_ops.warp_samples_to_canonical(
        pts_obs, jnp.asarray(v_posed, dtype=jnp.float32), T, topo, method="brute"
    )
    minv = np.linalg.inv(m)
    expected = np.asarray(pts_obs[0]) @ minv[:3, :3].T + minv[:3, 3]
    np.testing.assert_allclose(np.asarray(can_pts[0]), expected, atol=1e-4)


def test_warp_diff_gradients_flow_to_verts():
    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    T = jnp.tile(jnp.eye(4)[None], (len(v), 1, 1))
    pts = jnp.asarray([[0.2, 0.1, 0.6]], dtype=jnp.float32)

    def loss(verts):
        t_inv, f_id, sd = mesh_ops.warp_samples_to_canonical_diff(
            pts, verts, T, topo, method="brute"
        )
        return jnp.sum(t_inv[:, :3, 3] ** 2) + jnp.sum(sd)

    g = jax.grad(loss)(jnp.asarray(v))
    assert np.isfinite(np.asarray(g)).all()


def test_signed_distance_knn_matches_brute():
    rng = np.random.default_rng(2)
    from scipy.spatial import ConvexHull

    dirs = rng.normal(size=(60, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    verts = dirs.astype(np.float32)
    hull = ConvexHull(verts)
    faces = hull.simplices.astype(np.int32)
    # Fix winding to outward (ConvexHull does not guarantee orientation)
    tri = verts[faces]
    centroids = tri.mean(axis=1)
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = (normals * centroids).sum(axis=1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]
    topo = mesh_ops.MeshTopology.build(faces, len(verts))

    points = rng.normal(size=(100, 3)).astype(np.float32)
    sd_b, _, _ = mesh_ops.signed_distance(jnp.asarray(points), jnp.asarray(verts), topo, method="brute")
    sd_k, _, _ = mesh_ops.signed_distance(jnp.asarray(points), jnp.asarray(verts), topo, method="knn", k=8)
    np.testing.assert_allclose(np.asarray(sd_k), np.asarray(sd_b), atol=1e-4)
    # unit sphere-ish: points with |p| < 1 are inside
    inside = np.linalg.norm(points, axis=1) < 0.8
    assert (np.asarray(sd_b)[inside] < 0).all()
    outside = np.linalg.norm(points, axis=1) > 1.2
    assert (np.asarray(sd_b)[outside] > 0).all()


def test_planar_warp_matches_dense():
    """The planar-internals diff warp equals the dense [N,4,4] formulation."""
    rng = np.random.default_rng(5)
    from scipy.spatial import ConvexHull

    dirs = rng.normal(size=(60, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    verts = dirs.astype(np.float32)
    faces = ConvexHull(verts).simplices.astype(np.int32)
    topo = mesh_ops.MeshTopology.build(faces, len(verts))
    # random affine-ish per-vertex transforms with exact (0,0,0,1) last row
    T = np.tile(np.eye(4, dtype=np.float32)[None], (len(verts), 1, 1))
    T[:, :3, :3] += rng.normal(size=(len(verts), 3, 3)).astype(np.float32) * 0.05
    T[:, :3, 3] = rng.normal(size=(len(verts), 3)).astype(np.float32) * 0.1
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 1.2

    t_inv, f_id_d, sd_d = mesh_ops.warp_samples_to_canonical_diff(
        jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(T), topo, k=8
    )
    can_dense = np.einsum(
        "nij,nj->ni", np.asarray(t_inv),
        np.concatenate([pts, np.ones((50, 1), np.float32)], axis=1),
    )[:, :3]
    can_planar, f_id_p, sd_p = mesh_ops.warp_points_to_canonical_diff(
        jnp.asarray(pts), jnp.asarray(verts), jnp.asarray(T), topo, k=8,
        need_sd=True,
    )
    np.testing.assert_array_equal(np.asarray(f_id_p), np.asarray(f_id_d))
    np.testing.assert_allclose(np.asarray(sd_p), np.asarray(sd_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(can_planar), can_dense, atol=1e-4)


def test_planar_warp_gradients():
    import jax

    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    # non-identity per-vertex transforms so the barycentric blend carries
    # gradient (with identity T the blend is constant in verts)
    rng = np.random.default_rng(0)
    T = np.tile(np.eye(4, dtype=np.float32)[None], (len(v), 1, 1))
    T[:, :3, 3] = rng.normal(size=(len(v), 3)).astype(np.float32) * 0.2
    T = jnp.asarray(T)
    pts = jnp.asarray([[0.2, 0.1, 0.6], [0.0, -0.3, 0.1]], dtype=jnp.float32)

    def loss(verts):
        can, f_id, sd = mesh_ops.warp_points_to_canonical_diff(
            pts, verts, T, topo, k=4, need_sd=True
        )
        return jnp.sum(can**2) + jnp.sum(sd)

    g = jax.grad(loss)(jnp.asarray(v))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_pallas_ericson_select_matches_xla_path():
    """The TPU candidate-phase kernel (interpret mode on CPU) must agree
    with the XLA feature-major path bit-for-bit on the same candidates."""
    from neuman_tpu.ops.pallas.meshquery import ericson_select_pallas
    from neuman_tpu.utils.synthetic_body import (
        sample_query_points,
        synthetic_body_mesh,
    )

    verts_np, faces_np = synthetic_body_mesh(subdivisions=2)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)
    pts_np = sample_query_points(verts_np, 300, seed=5)
    pts = jnp.asarray(pts_np)
    k = 4

    # XLA path (default off-TPU)
    d2_ref, f_ref, cp_ref = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=k
    )

    # kernel path: same candidate construction as the TPU branch
    inc_width = topo.incidence.shape[1]
    _, knn_idx = jax.lax.top_k(
        -(
            jnp.sum(pts**2, -1)[:, None]
            + jnp.sum(verts**2, -1)[None, :]
            - 2.0 * pts @ verts.T
        ),
        k,
    )
    cand = topo.incidence[knn_idx].reshape(pts.shape[0], -1)
    tri9 = mesh_ops._packed_face_table(verts, topo.faces)
    vtab9 = tri9[jnp.maximum(topo.incidence, 0)].reshape(
        verts.shape[0], inc_width * 9
    )
    n, c = pts.shape[0], k * inc_width
    rows9 = vtab9[knn_idx].reshape(n, c, 9).transpose(2, 1, 0).reshape(9 * c, n)
    d2_p, f_p, cp_p = ericson_select_pallas(
        pts.T, rows9, cand.T, True
    )

    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_ref), atol=1e-6)
    # f_id may differ only on exact ties (closest point on a shared
    # edge/vertex: adjacent faces reach bit-equal d2 and backends
    # tie-break differently) — behaviorally identical since the closest
    # point, and hence the warp, agrees.
    for a, b in zip(cp_p, cp_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    agree = np.mean(np.asarray(f_p) == np.asarray(f_ref))
    assert agree > 0.9, agree


def test_pallas_ericson_select_envelope_gradient():
    """d(d2)/d(p) == 2*(p - cp) (envelope theorem); triangle data gets no
    gradient — the reference's stop-grad warp contract (ray_utils.py:69-93)."""
    from neuman_tpu.ops.pallas.meshquery import ericson_select_pallas

    v, f = make_cube()
    topo = mesh_ops.MeshTopology.build(f, len(v))
    verts = jnp.asarray(v)
    pts = jnp.asarray(
        np.array([[0.9, 0.1, 0.0], [0.0, 0.0, 1.3], [-0.2, 0.1, 0.05]],
                 dtype=np.float32)
    )
    k = 4
    inc_width = topo.incidence.shape[1]
    _, knn_idx = jax.lax.top_k(
        -(
            jnp.sum(pts**2, -1)[:, None]
            + jnp.sum(verts**2, -1)[None, :]
            - 2.0 * pts @ verts.T
        ),
        k,
    )
    cand = topo.incidence[knn_idx].reshape(pts.shape[0], -1)
    tri9 = mesh_ops._packed_face_table(verts, topo.faces)
    vtab9 = tri9[jnp.maximum(topo.incidence, 0)].reshape(len(v), inc_width * 9)
    n, c = pts.shape[0], k * inc_width
    rows9 = vtab9[knn_idx].reshape(n, c, 9).transpose(2, 1, 0).reshape(9 * c, n)

    def loss(p3):
        d2, _, _ = ericson_select_pallas(p3, rows9, cand.T, True)
        return jnp.sum(d2)

    g = jax.grad(loss)(pts.T)
    d2, _, cp = ericson_select_pallas(pts.T, rows9, cand.T, True)
    expected = 2.0 * (pts.T - jnp.stack(cp, axis=0))
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), atol=1e-6)


def test_knn_stride_group_query():
    """Group-KNN (knn_stride > 1): candidates come from the group's middle
    sample; on a smooth body mesh with ray-ordered points the result is
    exact for almost all points and never better than the true distance."""
    import jax.numpy as jnp

    from neuman_tpu.ops import mesh as mesh_ops
    from neuman_tpu.utils.synthetic_body import synthetic_body_mesh

    verts_np, faces_np = synthetic_body_mesh(subdivisions=3)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)

    # ray-ordered points: 32 rays x 16 samples marching past the surface
    rng = np.random.default_rng(0)
    num_rays, s = 32, 16
    targets = verts_np[rng.integers(0, len(verts_np), num_rays)]
    origins = targets * 3.0
    t = np.linspace(0.85, 1.15, s)[None, :, None]
    pts = jnp.asarray(
        (origins[:, None] * (1 - t) + targets[:, None] * t).reshape(-1, 3),
        jnp.float32,
    )

    d2_ref, f_ref, _ = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=4
    )
    d2_brute, _, _ = mesh_ops.point_mesh_closest(
        np.asarray(pts), verts, topo, method="brute"
    )
    d2_s, f_s, _ = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=4, knn_stride=4
    )
    # never better than the true distance (it's a candidate-set restriction)
    assert np.all(np.asarray(d2_s) >= np.asarray(d2_brute) - 1e-6)
    # distances stay accurate even where the argmin face differs (test rays
    # are far coarser than production sampling: here ~5% of the body radius
    # per step vs ~0.4% in training, so this is a conservative bound)
    match = np.mean(np.asarray(f_s) == np.asarray(f_ref))
    assert match > 0.85, match
    d_s = np.sqrt(np.maximum(np.asarray(d2_s), 0))
    d_b = np.sqrt(np.maximum(np.asarray(d2_brute), 0))
    rel = (d_s - d_b) / np.maximum(d_b, 1e-6)
    assert np.mean(rel) < 0.02, np.mean(rel)
    # group size not dividing N: silently falls back to stride 1
    d2_f, _, _ = mesh_ops.point_mesh_closest_planar(
        pts[:-3], verts, topo, k=4, knn_stride=4
    )
    np.testing.assert_allclose(
        np.asarray(d2_f), np.asarray(d2_ref)[:-3], rtol=1e-5, atol=1e-7
    )


def test_bucketed_knn_per_bucket_argmin():
    """Every index the streaming KNN returns is its (8-aligned) bucket's
    true argmin, and the k winners are the k closest bucket minima."""
    from neuman_tpu.ops.pallas.meshquery import bucketed_knn_pallas

    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
    pts = jnp.asarray(rng.normal(size=(40, 3)) * 1.5, jnp.float32)
    d2 = jnp.sum((pts[:, None] - verts[None]) ** 2, axis=-1)
    d2n = np.asarray(d2)

    for num_buckets, k in ((12, 4), (6, 3)):
        got = bucketed_knn_pallas(
            pts, verts, k, num_buckets=num_buckets, interpret=True
        )
        # interleaved buckets: vertex i belongs to bucket i % B
        members = [
            np.arange(96)[np.arange(96) % num_buckets == b]
            for b in range(num_buckets)
        ]
        mins = np.stack(
            [d2n[:, m].min(axis=1) for m in members], axis=1
        )  # [N, B] per-bucket minima
        expect_scores = np.sort(mins, axis=1)[:, :k]
        for n in range(pts.shape[0]):
            for j in range(k):
                idx = int(got[n, j])
                m = members[idx % num_buckets]
                assert idx == m[np.argmin(d2n[n, m])], (n, j, idx)
                # winner j is the j-th best bucket minimum
                np.testing.assert_allclose(
                    d2n[n, idx], expect_scores[n, j], rtol=1e-5
                )


def test_bucketed_knn_tiny_mesh_index_clamp():
    """v < num_buckets leaves whole bucket slots as padding; winner indices
    must still be < v (clamped), never JAX-clamped downstream onto an
    arbitrary vertex's incident faces."""
    from neuman_tpu.ops.pallas.meshquery import bucketed_knn_pallas

    rng = np.random.default_rng(1)
    verts = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)  # v=5 < B=8
    pts = jnp.asarray(rng.normal(size=(9, 3)), jnp.float32)
    got = np.asarray(bucketed_knn_pallas(pts, verts, 4, num_buckets=8,
                                         interpret=True))
    assert got.min() >= 0 and got.max() <= 4, got


def test_lane_tile_vmem_budget():
    """The Ericson kernel's lane tile must scale down with the candidate
    count so the ~52 [C, tn] f32 planes stay under the scoped-VMEM budget
    (the BENCH_r03 OOM: C=48 at the old fixed tn=2048 allocated 19.62 MB
    vs the 16 MB limit). C=24 (training) must KEEP tn=2048."""
    from neuman_tpu.ops.pallas.meshquery import (
        _VMEM_BUDGET,
        _VMEM_PLANES,
        _lane_tile,
    )

    assert _lane_tile(24, 10**6) == 2048
    for c in (24, 48, 72, 80):
        for stride in (1, 4, 8):
            tn = _lane_tile(c, 10**6, stride=stride)
            assert tn >= 128 and tn % 128 == 0
            assert (_VMEM_PLANES * c + 8 * stride) * tn * 4 <= _VMEM_BUDGET, (
                c, stride, tn,
            )
    # the stride surcharge must not shrink the training tile (C=24, k=4)
    assert _lane_tile(24, 10**6, stride=8) == 2048
    # small-N: one lane-aligned tile covering all points
    assert _lane_tile(24, 100) == 128
    assert _lane_tile(48, 3000) % 128 == 0


def test_point_mesh_closest_use_pallas_flag():
    """use_pallas=True (interpret off-TPU) and use_pallas=False (the XLA
    fallback bench.py relies on) must agree through the PUBLIC entry point
    — the r3 artifact was lost because False didn't actually bypass the
    kernel (ops/mesh.py hard-selected it on backend)."""
    from neuman_tpu.utils.synthetic_body import (
        sample_query_points,
        synthetic_body_mesh,
    )

    verts_np, faces_np = synthetic_body_mesh(subdivisions=2)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)
    pts = jnp.asarray(sample_query_points(verts_np, 256, seed=11))

    d2_x, _, cp_x = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=4, use_pallas=False
    )
    d2_p, _, cp_p = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=4, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x), atol=1e-6)
    for a, b in zip(cp_p, cp_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # the signed-distance / warp wrappers must thread the flag through
    sd_x, _, _ = mesh_ops.signed_distance(
        pts, verts, topo, k=4, use_pallas=False
    )
    sd_p, _, _ = mesh_ops.signed_distance(
        pts, verts, topo, k=4, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(sd_p), np.asarray(sd_x), atol=1e-5)


def test_pallas_grouped_kernel_matches_unstrided_path():
    """The GROUP-AWARE kernel (stride > 1: one candidate set shared by each
    group of consecutive points, expanded inside the kernel) must agree
    with running the stride=1 kernel on host-side lane-repeated candidates
    — the exact layout it replaced. Also checks the full
    point_mesh_closest_planar(use_pallas=True, knn_stride=4) path against
    the XLA path at the same stride."""
    from neuman_tpu.ops.pallas.meshquery import ericson_select_pallas
    from neuman_tpu.utils.synthetic_body import (
        sample_query_points,
        synthetic_body_mesh,
    )

    verts_np, faces_np = synthetic_body_mesh(subdivisions=2)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)
    stride, k = 4, 4
    n = 320
    pts = jnp.asarray(sample_query_points(verts_np, n, seed=6))

    inc_width = topo.incidence.shape[1]
    q = pts.reshape(n // stride, stride, 3)[:, stride // 2]
    _, knn_idx = jax.lax.top_k(
        -(
            jnp.sum(q**2, -1)[:, None]
            + jnp.sum(verts**2, -1)[None, :]
            - 2.0 * q @ verts.T
        ),
        k,
    )
    nq, c = q.shape[0], k * inc_width
    cand_s = topo.incidence[knn_idx].reshape(nq, -1)  # [Nq, C]
    tri9 = mesh_ops._packed_face_table(verts, topo.faces)
    vtab9 = tri9[jnp.maximum(topo.incidence, 0)].reshape(
        verts.shape[0], inc_width * 9
    )
    rows9_s = (
        vtab9[knn_idx].reshape(nq, c, 9).transpose(2, 1, 0).reshape(9 * c, nq)
    )

    # grouped kernel at stride=4
    d2_g, f_g, cp_g = ericson_select_pallas(
        pts.T, rows9_s, cand_s.T, True, stride
    )
    # stride=1 kernel on host-side repeated candidates (the old layout)
    rows9_rep = jnp.repeat(rows9_s, stride, axis=1)
    cand_rep = jnp.repeat(cand_s.T, stride, axis=1)
    d2_r, f_r, cp_r = ericson_select_pallas(
        pts.T, rows9_rep, cand_rep, True, 1
    )
    np.testing.assert_allclose(np.asarray(d2_g), np.asarray(d2_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(f_g), np.asarray(f_r))
    for a, b in zip(cp_g, cp_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # full entry point: pallas (interpret) vs XLA at the same stride
    d2_p, _, cp_p = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=k, knn_stride=stride, use_pallas=True
    )
    d2_x, _, cp_x = mesh_ops.point_mesh_closest_planar(
        pts, verts, topo, k=k, knn_stride=stride, use_pallas=False
    )
    np.testing.assert_allclose(np.asarray(d2_p), np.asarray(d2_x), atol=1e-6)
    for a, b in zip(cp_p, cp_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # gradient parity at stride > 1: envelope theorem through the grouped
    # kernel must match the XLA select's gradient
    def loss(p, up):
        d2, _, _ = mesh_ops.point_mesh_closest_planar(
            p, verts, topo, k=k, knn_stride=stride, use_pallas=up
        )
        return jnp.sum(d2 * jnp.arange(1.0, n + 1.0))

    g_p = jax.grad(lambda p: loss(p, True))(pts)
    g_x = jax.grad(lambda p: loss(p, False))(pts)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-4)


def test_fused_signed_kernel_stride_tables_and_grads():
    """The opt-in fused Ericson+sign kernel (use_pallas="fused",
    meshquery._signed_kernel) must match the default path exactly —
    values at stride 1 and 4, with and without prebuilt QueryTables, and
    the custom-VJP gradient w.r.t. the query points
    (sign * (p - cp)/|sd|, the envelope gradient the XLA expression
    yields at the argmin)."""
    import jax

    from neuman_tpu.utils.synthetic_body import (
        sample_query_points,
        synthetic_body_mesh,
    )

    verts_np, faces_np = synthetic_body_mesh(subdivisions=2)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)
    base = sample_query_points(verts_np, 64, seed=7)
    # group-KNN shares one candidate set per 4 CONSECUTIVE points — valid
    # only for spatially coherent groups (ray samples); build each group
    # as tiny jitters of one base point
    rng = np.random.default_rng(8)
    grouped = (
        base[:, None, :] + rng.normal(size=(64, 4, 3)).astype(np.float32) * 0.01
    ).reshape(256, 3)
    pts = jnp.asarray(grouped)
    tables = mesh_ops.build_query_tables(verts, topo)

    sd_x, fid_x, _ = mesh_ops.signed_distance(
        pts, verts, topo, k=4, use_pallas=False
    )
    for stride in (1, 4):
        for tb in (None, tables):
            sd_p, fid_p, cp_p = mesh_ops.signed_distance(
                pts, verts, topo, k=4, use_pallas="fused",
                knn_stride=stride, tables=tb,
            )
            label = f"stride={stride} tables={tb is not None}"
            if stride == 1:
                # f_id may differ on exact closest-point ties (the two
                # formulations round d2 differently); sd must not
                np.testing.assert_allclose(
                    np.asarray(sd_p), np.asarray(sd_x), atol=1e-5,
                    err_msg=label,
                )
            else:
                # group-KNN may pick different (equal-distance) candidates;
                # magnitudes and signs must still agree on this smooth body
                np.testing.assert_allclose(
                    np.asarray(sd_p), np.asarray(sd_x), atol=1e-4,
                    err_msg=label,
                )

    def f_pallas(p):
        sd, _, _ = mesh_ops.signed_distance(
            p, verts, topo, k=4, use_pallas="fused"
        )
        return jnp.sum(sd**2)

    def f_xla(p):
        sd, _, _ = mesh_ops.signed_distance(
            p, verts, topo, k=4, use_pallas=False
        )
        return jnp.sum(sd**2)

    g_p = jax.grad(f_pallas)(pts)
    g_x = jax.grad(f_xla)(pts)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), atol=1e-4)
