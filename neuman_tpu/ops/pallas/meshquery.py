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

from neuman_tpu.ops.mesh import closest_point_on_triangles_planar

_LANE_TILE = 2048


def _kernel(p_ref, rows_ref, cand_ref, outf_ref, outi_ref, *, num_cands):
    rows = rows_ref[:]  # [C*16, TN]
    cand = cand_ref[:]  # [C, TN] int32, -1 invalid
    p = (p_ref[0:1, :], p_ref[1:2, :], p_ref[2:3, :])  # [1, TN] each

    best_d2 = jnp.full(p[0].shape, jnp.inf, jnp.float32)
    best_f = jnp.zeros(p[0].shape, jnp.int32)
    best_cp = (jnp.zeros_like(best_d2),) * 3
    for ci in range(num_cands):
        base = ci * 16
        a = (rows[base + 0 : base + 1], rows[base + 1 : base + 2],
             rows[base + 2 : base + 3])
        b = (rows[base + 3 : base + 4], rows[base + 4 : base + 5],
             rows[base + 5 : base + 6])
        c = (rows[base + 6 : base + 7], rows[base + 7 : base + 8],
             rows[base + 8 : base + 9])
        cp = closest_point_on_triangles_planar(p, a, b, c)
        fid = cand[ci : ci + 1]
        d2 = sum((cp[i] - p[i]) ** 2 for i in range(3))
        d2 = jnp.where(fid >= 0, d2, jnp.inf)
        take = d2 < best_d2  # strict: ties keep the earliest (== argmin)
        best_d2 = jnp.where(take, d2, best_d2)
        best_f = jnp.where(take, fid, best_f)
        best_cp = tuple(jnp.where(take, cp[i], best_cp[i]) for i in range(3))

    outf_ref[0:1, :] = best_d2
    outf_ref[1:2, :] = best_cp[0]
    outf_ref[2:3, :] = best_cp[1]
    outf_ref[3:4, :] = best_cp[2]
    outi_ref[:] = best_f


def _ericson_select_impl(p3, rows2d, cand, interpret):
    n = p3.shape[1]
    num_cands = cand.shape[0]
    assert rows2d.shape[0] == num_cands * 16, (rows2d.shape, num_cands)
    tn = min(_LANE_TILE, n)
    pad = (-n) % tn
    if pad:
        p3 = jnp.pad(p3, ((0, 0), (0, pad)), mode="edge")
        rows2d = jnp.pad(rows2d, ((0, 0), (0, pad)), mode="edge")
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
    # padded lanes: edge-pad keeps >=1 valid candidate so no inf/0 garbage
    cand = jnp.where(
        jnp.arange(cand.shape[1])[None, :] < n, cand,
        jnp.where(jnp.arange(num_cands)[:, None] == 0, 0, -1),
    )
    n_pad = n + pad
    grid = (n_pad // tn,)
    outf, outi = pl.pallas_call(
        functools.partial(_kernel, num_cands=num_cands),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_cands * 16, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (num_cands, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((4, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(p3, rows2d, cand)
    d2 = outf[0, :n]
    cp = (outf[1, :n], outf[2, :n], outf[3, :n])
    f_id = outi[0, :n]
    return d2, f_id, cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ericson_select_pallas(p3, rows2d, cand, interpret=None):
    """Closest point over per-point candidate triangles, fused on TPU.

    p3: [3, N] query point coordinate rows; rows2d: [C*16, N] packed
    candidate corner table (corner0 xyz | corner1 xyz | corner2 xyz | pad,
    transposed feature-major); cand: [C, N] int32 candidate face ids, -1 =
    invalid. Returns (d2 [N], f_id [N] int32, closest (x, y, z) of [N]).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _ericson_select_impl(p3, rows2d, cand, interpret)


def _fwd(p3, rows2d, cand, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _ericson_select_impl(p3, rows2d, cand, interpret)
    d2, f_id, cp = out
    return out, (p3, cp)


def _bwd(interpret, res, g):
    p3, cp = res
    g_d2, _, _ = g  # closest point / face choice: no gradient (ref parity)
    gp = jnp.stack(
        [2.0 * (p3[i] - cp[i]) * g_d2 for i in range(3)], axis=0
    )
    return gp, None, None


ericson_select_pallas.defvjp(_fwd, _bwd)
