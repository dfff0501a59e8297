"""Pallas candidate-phase kernel for the mesh closest-point query.

The XLA formulation of the Ericson candidate phase (ops/mesh.py) is
catastrophically mis-fused on TPU: the candidate-row gather + transpose get
re-fused into each of the ~50 elementwise consumers and recomputed
(measured 96 ms for math whose pre-staged cost is 3 ms, at N=196k, C=24;
`lax.optimization_barrier` does not stop it). A pallas_call's operands are
always materialized, which both forces the gather to run exactly once and
keeps the whole region test + argmin-select VMEM-resident.

Replaces the hot phase of the libigl closest-point/signed-distance queries
(reference: utils/ray_utils.py:48-93, human_nerf_trainer.py:305-343) in the
human training step (3 queries/step).

Gradient semantics (custom VJP) match the reference warp contract
(ray_utils.py:69-93): the closest point / face choice are non-differentiable
(zero cotangent into triangle data), and d2 gets the envelope-theorem
gradient 2*(p - cp) w.r.t. the query points — identical to what
differentiating the XLA select would yield at the argmin.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuman_tpu.ops.mesh import (
    barycentric_planar,
    closest_point_on_triangles_planar,
)

_LANE_TILE = 2048
# The kernel's live set scales linearly with the candidate count C: ~52
# [C, tn] f32 planes (9C packed input rows + cand + the Ericson region
# test temporaries + selects; 19.62 MB measured by the Mosaic scoped-VMEM
# allocator at C=48, tn=2048 => 52.3 planes). Budget the lane tile against
# 10 MB — conservative vs the 16 MB scoped limit — so C=24 (training,
# k=4 x incidence 6) keeps tn=2048 while C=48 (render CLIs, k=8) drops to
# 1024 and C=72 (real SMPL, deg 9, k=8) to 512 instead of OOMing.
# 10.5 MB: still conservative vs the 16 MB scoped limit, with the extra
# 0.5 MB absorbing the group-KNN IO surcharge (8*stride [1, tn] planes,
# see _lane_tile) without shrinking any previously-validated tile choice
# (C=24 -> 2048, C=48 -> 1024, C=72 -> 512, at any stride <= 8).
_VMEM_BUDGET = 10 * 2**20 + 2**19
_VMEM_PLANES = 52


def _lane_tile(num_cands, n, stride=1, planes=None, budget=None):
    # stride > 1 (group-KNN) grows the point block to [3*stride, tn] and
    # the outputs to [5*stride, tn], and the unrolled per-member loop can
    # extend temporary liveness — charge ~8 extra [1, tn] planes per member
    # on top of the [C, tn] estimate so grouped corners keep headroom.
    planes = (planes or _VMEM_PLANES) * num_cands + 8 * stride
    tn = _LANE_TILE
    while tn > 128 and planes * tn * 4 > (budget or _VMEM_BUDGET):
        tn //= 2
    if n < tn:
        # one lane-aligned tile covering all points
        tn = max(128, -(-n // 128) * 128)
    return tn


def _kernel(p_ref, rows_ref, cand_ref, outf_ref, outi_ref, *, num_cands,
            stride=1):
    """Coordinate-major candidate phase: every op runs on [C, TN] blocks.

    The first version looped over candidates with [1, TN] row slices — one
    of eight sublanes live, so the whole Ericson region test paid an 8x
    VPU-utilization tax (measured 4.8 ms/query at N=196k, C=24; this
    layout: ~8x less VPU work). rows_ref is [9*C, TN] with row j*C + ci =
    coordinate j of candidate ci, so each coordinate plane rows[j*C:(j+1)*C]
    is one aligned [C, TN] sublane block (C padded to 8 host-side).

    GROUP-AWARE (stride > 1): each lane holds a group-KNN GROUP of `stride`
    consecutive query points (p_ref rows 3m..3m+2 = member m's xyz) sharing
    one candidate set, so the candidate corner planes are fetched from HBM
    once per group instead of lane-repeated `stride`x host-side (the repeat
    materialized 170 MB per query at N=196k, C=24, stride=4 — measured
    ~2.4 ms of a 4.0 ms prep). The Ericson region test runs once per member
    on the SAME [C, TN] corner planes."""
    c_ = num_cands
    rows = rows_ref[:]  # [9*C, TN]
    coord = lambda j: rows[j * c_ : (j + 1) * c_]  # [C, TN]
    a = (coord(0), coord(1), coord(2))
    b = (coord(3), coord(4), coord(5))
    c = (coord(6), coord(7), coord(8))
    fid = cand_ref[:]  # [C, TN] int32, -1 invalid
    ci = jax.lax.broadcasted_iota(jnp.int32, fid.shape, 0)
    for m in range(stride):
        p = (
            p_ref[3 * m : 3 * m + 1, :],
            p_ref[3 * m + 1 : 3 * m + 2, :],
            p_ref[3 * m + 2 : 3 * m + 3, :],
        )  # [1, TN] broadcasts

        cp = closest_point_on_triangles_planar(p, a, b, c)  # [C, TN] each
        d2 = sum((cp[i] - p[i]) ** 2 for i in range(3))
        d2 = jnp.where(fid >= 0, d2, jnp.inf)

        best_d2 = jnp.min(d2, axis=0, keepdims=True)  # [1, TN]
        # earliest-candidate tie-break (== the sequential argmin): among
        # rows attaining the min, pick the smallest candidate index
        pri = jnp.where(d2 == best_d2, ci, num_cands)
        sel = jnp.min(pri, axis=0, keepdims=True)
        msk = pri == sel  # exactly one true row per lane (ci distinct)

        outf_ref[4 * m : 4 * m + 1, :] = best_d2
        for i in range(3):
            outf_ref[4 * m + 1 + i : 4 * m + 2 + i, :] = jnp.sum(
                jnp.where(msk, cp[i], 0.0), axis=0, keepdims=True
            )
        outi_ref[m : m + 1, :] = jnp.sum(
            jnp.where(msk, jnp.maximum(fid, 0), 0), axis=0, keepdims=True
        )


def _signed_kernel(p_ref, rows_ref, vn_ref, cand_ref, outf_ref, outi_ref, *,
                   num_cands, stride=1):
    """Ericson candidate phase + pseudonormal SIGN, fully in VMEM.

    Same layout as `_kernel`, plus vn_ref: [9*C, TN] packed per-corner
    angle-weighted vertex pseudonormals at the group-KNN stride. After the
    argmin select, the kernel computes per-candidate sign dots on the VPU,
    mask-reduces the winner's, and writes sign * sqrt(d2) in the distance
    channel. NOT the default: at the production config (N=196k, k=4,
    tables) this measured ~18% slower at stride=4 and ~40% at stride=1
    than the default Ericson kernel + XLA sign tail — the 9 extra [C, TN]
    pseudonormal input planes (HBM reads + VMEM pressure) outweigh the
    [Nq, 16] gathers the tail costs. Select via
    signed_distance(use_pallas="fused") when HBM is the constraint.
    (Reference counterpart: igl.signed_distance, human_nerf_trainer.py:
    305-343.)"""
    c_ = num_cands
    rows = rows_ref[:]
    vnr = vn_ref[:]
    coord = lambda t, j: t[j * c_ : (j + 1) * c_]  # [C, TN]
    a = (coord(rows, 0), coord(rows, 1), coord(rows, 2))
    b = (coord(rows, 3), coord(rows, 4), coord(rows, 5))
    c = (coord(rows, 6), coord(rows, 7), coord(rows, 8))
    fid = cand_ref[:]
    ci = jax.lax.broadcasted_iota(jnp.int32, fid.shape, 0)
    for m in range(stride):
        p = (
            p_ref[3 * m : 3 * m + 1, :],
            p_ref[3 * m + 1 : 3 * m + 2, :],
            p_ref[3 * m + 2 : 3 * m + 3, :],
        )
        cp = closest_point_on_triangles_planar(p, a, b, c)
        d2 = sum((cp[i] - p[i]) ** 2 for i in range(3))
        d2 = jnp.where(fid >= 0, d2, jnp.inf)
        best_d2 = jnp.min(d2, axis=0, keepdims=True)
        pri = jnp.where(d2 == best_d2, ci, num_cands)
        sel = jnp.min(pri, axis=0, keepdims=True)
        msk = pri == sel

        pick = lambda t: jnp.sum(
            jnp.where(msk, t, 0.0), axis=0, keepdims=True
        )  # [1, TN]
        # sign dot computed PER CANDIDATE (elementwise [C, TN] — cheap on
        # the VPU), then ONE masked reduction selects the winner's dot; the
        # earlier formulation mask-reduced the 9 corners + 9 normals first
        # (18 reductions/member) and measured ~20% slower than unfused
        u, v, w = barycentric_planar(cp, a, b, c)
        na, nb, nc = (
            (coord(vnr, 0), coord(vnr, 1), coord(vnr, 2)),
            (coord(vnr, 3), coord(vnr, 4), coord(vnr, 5)),
            (coord(vnr, 6), coord(vnr, 7), coord(vnr, 8)),
        )
        dotc = sum(
            (p[i] - cp[i]) * (u * na[i] + v * nb[i] + w * nc[i])
            for i in range(3)
        )  # [C, TN]
        dot = pick(dotc)
        sign = jnp.where(dot < 0, -1.0, 1.0)  # dot==0 -> +1 (mesh.py parity)
        sd = sign * jnp.sqrt(jnp.maximum(best_d2, 0.0))

        outf_ref[4 * m : 4 * m + 1, :] = sd
        for i in range(3):
            outf_ref[4 * m + 1 + i : 4 * m + 2 + i, :] = pick(cp[i])
        outi_ref[m : m + 1, :] = jnp.sum(
            jnp.where(msk, jnp.maximum(fid, 0), 0), axis=0, keepdims=True
        )


# vn_ref adds 9 more [C, TN] input planes to the signed kernel's live set
_VMEM_PLANES_SIGNED = _VMEM_PLANES + 9


def _signed_select_impl(p3, rows9, vn9, cand, interpret, stride):
    n = p3.shape[1]
    assert n % stride == 0, (n, stride)
    nq = n // stride
    num_cands = cand.shape[0]
    assert rows9.shape == (num_cands * 9, nq)
    assert vn9.shape == (num_cands * 9, nq)
    c_pad = (-num_cands) % 8
    if c_pad:
        rows9 = jnp.pad(
            rows9.reshape(9, num_cands, nq), ((0, 0), (0, c_pad), (0, 0))
        ).reshape(9 * (num_cands + c_pad), nq)
        vn9 = jnp.pad(
            vn9.reshape(9, num_cands, nq), ((0, 0), (0, c_pad), (0, 0))
        ).reshape(9 * (num_cands + c_pad), nq)
        cand = jnp.pad(cand, ((0, c_pad), (0, 0)), constant_values=-1)
        num_cands += c_pad
    p3g = (
        p3.reshape(3, nq, stride).transpose(2, 0, 1).reshape(3 * stride, nq)
    )
    # the signed kernel's 9 extra read-only input planes would drop the
    # lane tile to 1024 under the conservative default budget; its
    # 61-plane live set at C=24, tn=2048 measures 12.0 MB — grant it a
    # 12.6 MB budget (still 3.4 MB under the 16 MB scoped limit) so the
    # training-shape tile stays 2048. Larger C still steps down (C=48 ->
    # 1024, C=72 -> 512), validated by tools/sweep_pallas_envelope.py.
    tn = _lane_tile(num_cands, nq, stride=stride,
                    planes=_VMEM_PLANES_SIGNED,
                    budget=12 * 2**20 + 5 * 2**17)
    pad = (-nq) % tn
    if pad:
        p3g = jnp.pad(p3g, ((0, 0), (0, pad)), mode="edge")
        rows9 = jnp.pad(rows9, ((0, 0), (0, pad)), mode="edge")
        vn9 = jnp.pad(vn9, ((0, 0), (0, pad)), mode="edge")
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
    cand = jnp.where(
        jnp.arange(cand.shape[1])[None, :] < nq, cand,
        jnp.where(jnp.arange(num_cands)[:, None] == 0, 0, -1),
    )
    nq_pad = nq + pad
    grid = (nq_pad // tn,)
    outf, outi = pl.pallas_call(
        functools.partial(_signed_kernel, num_cands=num_cands, stride=stride),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3 * stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands * 9, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands * 9, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (4 * stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4 * stride, nq_pad), jnp.float32),
            jax.ShapeDtypeStruct((stride, nq_pad), jnp.int32),
        ],
        interpret=interpret,
    )(p3g, rows9, vn9, cand)
    outf = (
        outf.reshape(stride, 4, nq_pad)
        .transpose(1, 2, 0)
        .reshape(4, nq_pad * stride)
    )
    outi = outi.T.reshape(1, nq_pad * stride)
    sd = outf[0, :n]
    cp = (outf[1, :n], outf[2, :n], outf[3, :n])
    f_id = outi[0, :n]
    return sd, f_id, cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ericson_signed_select_pallas(p3, rows9, vn9, cand, interpret=None,
                                 stride=1):
    """Fused closest-point + pseudonormal-sign query (see _signed_kernel).

    Same contract as ericson_select_pallas plus vn9: [9*C, N//stride]
    coordinate-major packed per-corner pseudonormals. Returns
    (signed_dist [N], f_id [N] int32, closest (x, y, z) of [N]).

    VJP: d(sd)/d(points) = sign(sd) * (p - cp) / |sd| (the envelope
    gradient of sign * sqrt(d2); face choice / closest point / normals
    carry no gradient — igl parity, ref ray_utils.py:69-93)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _signed_select_impl(p3, rows9, vn9, cand, interpret, stride)


def _signed_fwd(p3, rows9, vn9, cand, interpret, stride):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _signed_select_impl(p3, rows9, vn9, cand, interpret, stride)
    sd, f_id, cp = out
    return out, (p3, cp, sd)


def _signed_bwd(interpret, stride, res, g):
    p3, cp, sd = res
    g_sd, _, _ = g
    inv = jnp.where(jnp.abs(sd) < 1e-12, 0.0, 1.0 / jnp.abs(sd))
    sign = jnp.where(sd < 0, -1.0, 1.0)
    gp = jnp.stack(
        [g_sd * sign * (p3[i] - cp[i]) * inv for i in range(3)], axis=0
    )
    return gp, None, None, None


ericson_signed_select_pallas.defvjp(_signed_fwd, _signed_bwd)


def _ericson_select_impl(p3, rows9, cand, interpret, stride):
    n = p3.shape[1]
    assert n % stride == 0, (n, stride)
    nq = n // stride
    num_cands = cand.shape[0]
    assert rows9.shape == (num_cands * 9, nq), (rows9.shape, num_cands, nq)
    assert cand.shape[1] == nq
    # pad the candidate axis to 8 sublanes so every [C, TN] coordinate
    # plane the kernel slices is sublane-aligned
    c_pad = (-num_cands) % 8
    if c_pad:
        rows9 = jnp.pad(
            rows9.reshape(9, num_cands, nq), ((0, 0), (0, c_pad), (0, 0))
        ).reshape(9 * (num_cands + c_pad), nq)
        cand = jnp.pad(cand, ((0, c_pad), (0, 0)), constant_values=-1)
        num_cands += c_pad
    # group the query points: lane g holds group g's `stride` members in
    # sublanes (row 3*m + j = coordinate j of member m)
    p3g = (
        p3.reshape(3, nq, stride).transpose(2, 0, 1).reshape(3 * stride, nq)
    )
    tn = _lane_tile(num_cands, nq, stride=stride)
    pad = (-nq) % tn
    if pad:
        p3g = jnp.pad(p3g, ((0, 0), (0, pad)), mode="edge")
        rows9 = jnp.pad(rows9, ((0, 0), (0, pad)), mode="edge")
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
    # padded lanes: edge-pad keeps >=1 valid candidate so no inf/0 garbage
    cand = jnp.where(
        jnp.arange(cand.shape[1])[None, :] < nq, cand,
        jnp.where(jnp.arange(num_cands)[:, None] == 0, 0, -1),
    )
    nq_pad = nq + pad
    grid = (nq_pad // tn,)
    outf, outi = pl.pallas_call(
        functools.partial(_kernel, num_cands=num_cands, stride=stride),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (3 * stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands * 9, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (4 * stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (stride, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4 * stride, nq_pad), jnp.float32),
            jax.ShapeDtypeStruct((stride, nq_pad), jnp.int32),
        ],
        interpret=interpret,
    )(p3g, rows9, cand)
    # ungroup: row 4*m + c of lane g is (channel c, point g*stride + m)
    outf = (
        outf.reshape(stride, 4, nq_pad)
        .transpose(1, 2, 0)
        .reshape(4, nq_pad * stride)
    )
    outi = outi.T.reshape(1, nq_pad * stride)
    d2 = outf[0, :n]
    cp = (outf[1, :n], outf[2, :n], outf[3, :n])
    f_id = outi[0, :n]
    return d2, f_id, cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ericson_select_pallas(p3, rows9, cand, interpret=None, stride=1):
    """Closest point over per-point candidate triangles, fused on TPU.

    p3: [3, N] query point coordinate rows; rows9: [9*C, N//stride]
    COORDINATE-MAJOR packed candidate corners AT THE GROUP-KNN STRIDE —
    row j*C + ci holds coordinate j (ax ay az bx by bz cx cy cz) of
    candidate ci for each group of `stride` consecutive points (see
    mesh_ops.point_mesh_closest_planar for the builder); cand:
    [C, N//stride] int32 candidate face ids, -1 = invalid. The kernel
    expands groups internally (no host-side lane repeat). Returns
    (d2 [N], f_id [N] int32, closest (x, y, z) of [N]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ericson_select_impl(p3, rows9, cand, interpret, stride)


def _fwd(p3, rows9, cand, interpret, stride):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _ericson_select_impl(p3, rows9, cand, interpret, stride)
    d2, f_id, cp = out
    return out, (p3, cp)


def _bwd(interpret, stride, res, g):
    p3, cp = res
    g_d2, _, _ = g  # closest point / face choice: no gradient (ref parity)
    gp = jnp.stack(
        [2.0 * (p3[i] - cp[i]) * g_d2 for i in range(3)], axis=0
    )
    return gp, None, None


ericson_select_pallas.defvjp(_fwd, _bwd)


def bucketed_knn_pallas(points, verts, k, num_buckets=64, interpret=None):
    """Approximate vertex KNN without materializing [N, V] in HBM.

    Streams the distance computation in VMEM: the vertex table (xyz + |v|^2,
    [V, 4]) stays resident, each grid step computes per-bucket argmins for a
    lane-tile of points, and the k best bucket winners are selected outside
    with a tiny [N, B] top-k + one-hot matmul (no integer gathers). Same
    structure as jax.lax.approx_max_k (per-bucket extremum + exact top-k of
    winners), but the XLA path writes + re-reads the full [N, V] distance
    matrix (8 GB at N=196k, V=10k) while this never leaves the chip.

    Kernel formulation (v2): ONE MXU matmul computes every bucket's scores
    at once — |v|^2 - 2 v.p == [V, 4] @ [(-2x, -2y, -2z, 1), TN] with |v|^2
    folded in as the 4th vertex coordinate — then per-bucket min + the
    earliest-tie iota reduction (the Ericson-kernel pattern) run vectorized
    on the [B, VB, TN] reshape. The first version looped buckets with
    fori_loop + dynamic-slice stores + Mosaic argmin and measured ~1.3 ms
    SLOWER than the XLA matmul path; this one does the same math with no
    serialization and the pairwise-distance FLOPs on the MXU.

    Buckets are INTERLEAVED (vertex i -> bucket i % B, via a one-time row
    permutation of the table): mesh orderings put spatially adjacent
    vertices at adjacent indices, so contiguous buckets would hold a
    point's k nearest vertices in one bucket and keep only one of them —
    interleaving spreads them across buckets (measured 96.1% -> 98.9%
    exact-face recall at k=4/stride=4 on the body proxy).

    points: [N, 3]; verts: [V, 3]. Returns knn_idx [N, k] int32.
    Recall measured in tools/bench_mesh_query.py --recall.
    """
    n = points.shape[0]
    v = verts.shape[0]
    b = num_buckets
    vb = -(-(-(-v // b)) // 8) * 8  # bucket size rounded to 8 sublanes
    v_pad = b * vb
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    v2 = jnp.sum(verts * verts, axis=-1, keepdims=True)
    vtab = jnp.concatenate([verts, v2], axis=-1)  # [V, 4]
    if v_pad > v:
        # big-finite (not inf: 0*inf = nan inside a matmul accumulation)
        pad = jnp.full((v_pad - v, 4), 1e30, vtab.dtype)
        vtab = jnp.concatenate([vtab, pad.at[:, :3].set(0.0)], axis=0)
    # interleave: permuted row (bucket, pos) = original index pos*B + bucket
    vtab = vtab.reshape(vb, b, 4).transpose(1, 0, 2).reshape(v_pad, 4)

    # lane tile bounded by the [V_pad, TN] f32 score plane (+ the int32
    # tie-break transients of the same shape) against ~16 MB scoped VMEM
    tn = 128
    while tn < 2048 and v_pad * tn * 2 * 4 * 2 <= 12 * 2**20 and tn < n:
        tn *= 2
    pad_n = (-n) % tn
    # p4 rows: (-2x, -2y, -2z, 1) so score = vtab @ p4 in one MXU pass
    p4 = jnp.concatenate(
        [-2.0 * points.T, jnp.ones((1, n), points.dtype)], axis=0
    )  # [4, N]
    if pad_n:
        p4 = jnp.pad(p4, ((0, 0), (0, pad_n)), mode="edge")
    n_pad = n + pad_n

    def kernel(p_ref, v_ref, sc_ref, ix_ref):
        score = jnp.dot(
            v_ref[:], p_ref[:], preferred_element_type=jnp.float32
        )  # [V_pad, TN]
        s3 = score.reshape(b, vb, tn)
        bmin = jnp.min(s3, axis=1)  # [B, TN]
        # earliest-position tie-break via iota min (Mosaic-proven pattern;
        # argmin lowers worse)
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, vb, tn), 1)
        pri = jnp.where(s3 == bmin[:, None, :], pos, vb)
        am = jnp.min(pri, axis=1)  # [B, TN]
        sc_ref[:] = bmin
        # interleaved bucketing: permuted (bucket bi, pos am) was original
        # index am * B + bi
        ix_ref[:] = am * b + jax.lax.broadcasted_iota(jnp.int32, (b, tn), 0)

    grid = (n_pad // tn,)
    sc, ix = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (v_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((b, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(p4, vtab)
    sc = sc[:, :n].T  # [N, B]
    ix = ix[:, :n].T
    _, arg = jax.lax.top_k(-sc, k)  # [N, k] positions into the bucket axis
    # winner indices via one-hot contraction (gather-free)
    onehot = (
        arg[..., None] == jnp.arange(b, dtype=jnp.int32)[None, None, :]
    )  # [N, k, B]
    knn_idx = jnp.sum(
        jnp.where(onehot, ix[:, None, :], 0), axis=-1, dtype=jnp.int32
    )
    # A bucket slot made entirely of padding rows (v < B, or heavy vb
    # rounding on tiny meshes) wins with index am*b+bi >= v; clamp so the
    # downstream topology.incidence gather stays in-range instead of being
    # silently JAX-clamped onto an arbitrary vertex's faces.
    return jnp.minimum(knn_idx, v - 1)
