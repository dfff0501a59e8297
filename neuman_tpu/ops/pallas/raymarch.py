"""Pallas fused ray-march kernel: PE + NeRF MLP in one VMEM-resident pass.

The whole 8x256 MLP (weights ~600KB bf16) fits VMEM, so a tile of samples
runs positional encoding and every layer without touching HBM between
layers — HBM traffic reduces to the planar sample coordinates in (3 x
[R, S] tiles) and one [4, N] raw-output plane (sigma, r, g, b rows).

Layout follows ops/fused.py's feature-major formulation: activations are
[C, TN] inside the kernel (features in sublanes, samples in lanes), weights
are passed pre-transposed, and the view-direction head uses the per-ray
factorization (`dir_part = W_dirs.T @ dir_pe`, [W/2, R], broadcast across
samples inside the kernel).

Tiling: a tile is RT whole rays *flattened into the lane axis* — inputs
are reshaped host-side to [R/RT, RT*S] so each block is one [1, TN] lane
vector and the kernel needs no in-kernel reshapes. This only requires
RT*S % 128 == 0, so odd sample counts (e.g. the hybrid path's S=64 human
segments) run pad-free; the per-ray direction broadcast is a matmul with a
0/1 segment matrix instead of a [W/2, RT, S] reshape. Falls back to
interpret mode off-TPU so tests run on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuman_tpu.models.nerf import JoinerSpec
from neuman_tpu.ops import fused


def _weights_t(params, use_viewdirs, width, compute_dtype):
    """Ordered list of (transposed) weight/bias arrays for the kernel."""
    ws = []

    def add(w, b):
        # biases as [C, 1] column vectors: broadcasting along lanes needs no
        # relayout (a [1, C]-row -> column transpose crashes Mosaic)
        ws.extend([w.T.astype(compute_dtype), b.reshape(-1, 1)])

    for p in params["pts_linears"]:
        add(p["w"], p["b"])
    if use_viewdirs:
        add(params["alpha_linear"]["w"], params["alpha_linear"]["b"])
        add(params["feature_linear"]["w"], params["feature_linear"]["b"])
        wv = params["views_linears"][0]
        add(wv["w"][:width], wv["b"])
        add(params["rgb_linear"]["w"], params["rgb_linear"]["b"])
    else:
        add(params["output_linear"]["w"], params["output_linear"]["b"])
    return ws


def pick_tile(r, s, rays_per_tile):
    """Largest rt <= rays_per_tile with r % rt == 0 and (rt*s) % 128 == 0.

    Returns (rt, pad_s): pad_s > 0 only when no such rt exists (then the
    sample axis is padded to a 128 multiple and any rt dividing r works)."""
    for rt in range(min(rays_per_tile, r), 0, -1):
        if r % rt == 0 and (rt * s) % 128 == 0:
            return rt, 0
    pad_s = (-s) % 128
    rt = min(rays_per_tile, r)
    while r % rt:
        rt -= 1
    return rt, pad_s


def pick_tile_tape(r, s, rays_per_tile, tape_rows, itemsize):
    """Tile for tape-emitting forwards, or None when no legal tile fits.

    The [tape_rows, TN] tape output block is double-buffered by Mosaic's
    scoped-VMEM allocator, so an unconstrained TN blows the 16 MB limit
    (measured on v5e: 16.04M scoped at TN=1024/f32/tape_rows=2048 — 36.5K
    over — for the viewdirs forward; 16.79M for the 4-plane offset
    forward). Cap the tape block at ~4 MB per buffer so activations,
    weights and the main output keep their headroom. Only divisor-legal,
    unpadded tiles qualify (sample padding misaligns the flat tape
    layout); the caller falls back to tapeless on None."""
    max_tn = max(128, (4 * 1024 * 1024) // (tape_rows * itemsize))
    for rt in range(min(rays_per_tile, r), 0, -1):
        if r % rt == 0 and (rt * s) % 128 == 0 and rt * s <= max_tn:
            return rt
    return None


def _seg_matrix(rt, s, dtype):
    """[RT, RT*S] 0/1 matrix: row r marks ray r's lanes."""
    seg = np.zeros((rt, rt * s), np.float32)
    for i in range(rt):
        seg[i, i * s : (i + 1) * s] = 1.0
    return jnp.asarray(seg, dtype)


def _pack_planes(planes, rt):
    """3 x [R, S] -> [R/RT, 3, RT*S]: whole rays flattened into the lane
    axis, xyz stacked on a middle axis so the block shape (1, 3, TN) is
    tileable (the trailing dims equal the array dims / are 128-aligned —
    a (1, TN) 2D block would violate the 8-sublane constraint)."""
    r, s = planes[0].shape
    return jnp.stack([p.reshape(r // rt, rt * s) for p in planes], axis=1)


def nerf_mlp_pallas(
    spec: JoinerSpec, params, px, py, pz, dir_part, compute_dtype=jnp.bfloat16,
    rays_per_tile=8, interpret=None, dir_planes=None, emit_tape=False,
):
    """Fused PE+MLP over planar sample coordinates.

    px/py/pz: [R, S]. View directions, one of:
    - dir_part [R, W/2]: precomputed per-RAY dir projection
      (`dir_projection`) broadcast across samples — the vanilla path;
    - dir_planes (dx, dy, dz) each [R, S]: per-SAMPLE dirs (the canonical
      human net after the LBS warp); dir PE + the views matmul run
      in-kernel (pass dir_part=None).

    Returns (sigma [R, S], rgb 3 x [R, S]); with emit_tape=True returns
    ((sigma, rgb), tape) where tape is the [depth*W, R*S] post-relu trunk
    activation stack (compute dtype) for the HBM-tape backward
    (raymarch_vjp._mlp_bwd), or None when the sample axis had to be
    padded (the bwd's own padding would misalign the flat lane layout).
    """
    nspec = spec.nerf
    assert nspec.use_viewdirs, "pallas path currently covers the viewdirs MLP"
    per_sample = dir_planes is not None
    r, s_orig = px.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and compute_dtype == jnp.bfloat16:
        # CPU's unfused DotThunk rejects bf16 x bf16 -> f32; interpret-mode
        # kernels lower dots unfused, so promote (TPU behavior unchanged).
        compute_dtype = jnp.float32
    rt, pad_s = pick_tile(r, s_orig, rays_per_tile)
    if emit_tape and pad_s == 0 and not interpret:
        # the tape output block's double buffering dominates scoped VMEM;
        # re-pick under the tape budget or drop the tape for this shape
        rt_tape = pick_tile_tape(
            r, s_orig, rays_per_tile,
            nspec.depth * nspec.width, jnp.dtype(compute_dtype).itemsize,
        )
        if rt_tape is None:
            emit_tape_ok = False
        else:
            emit_tape_ok = True
            rt = rt_tape
    else:
        emit_tape_ok = pad_s == 0
    if pad_s:
        epad = lambda a: jnp.pad(a, ((0, 0), (0, pad_s)), mode="edge")
        px, py, pz = epad(px), epad(py), epad(pz)
        if per_sample:
            dir_planes = tuple(epad(d) for d in dir_planes)
    s = s_orig + pad_s
    tn = rt * s
    n = r * s

    weights = _weights_t(params, True, nspec.width, compute_dtype)
    if per_sample:
        wv = params["views_linears"][0]
        w_vd_t = wv["w"][nspec.width :].T.astype(compute_dtype)  # [W/2, Cd]
        dir_inputs = [_pack_planes(dir_planes, rt)]
    else:
        w_vd_t = None
        # [G, RT, W/2]: trailing dims equal the array dims, so ANY rt is a
        # legal block (a 2D [rt, W/2] block violates the 8-sublane rule at
        # the tape-capped rt=4) — same packing as the backward's dirp.
        dir_inputs = [dir_part.reshape(r // rt, rt, dir_part.shape[1])]
    depth = nspec.depth
    skips = nspec.skips
    # 'rotate' PE bases must be kernel INPUTS (Pallas rejects captured
    # constant arrays); None entries keep the ref indexing aligned.
    pos_bvals = (
        jnp.asarray(np.array(spec.pos_pe.bvals, dtype=np.float32).reshape(-1, 3))
        if spec.pos_pe.mapping == "rotate"
        else None
    )
    dir_bvals = (
        jnp.asarray(np.array(spec.dir_pe.bvals, dtype=np.float32).reshape(-1, 3))
        if (per_sample and spec.dir_pe.mapping == "rotate")
        else None
    )

    extra_weights = [] if per_sample else [_seg_matrix(rt, s, compute_dtype)]
    if per_sample:
        extra_weights += [w_vd_t]
    extra_weights += [b for b in (pos_bvals, dir_bvals) if b is not None]
    n_extra = len(extra_weights)

    write_tape = emit_tape and emit_tape_ok

    def kernel(pts_ref, *refs):
        nd = len(dir_inputs)
        dir_refs = refs[:nd]
        wrefs = refs[nd : nd + len(weights) + n_extra]
        out_ref = refs[nd + len(weights) + n_extra]
        tape_ref = refs[nd + len(weights) + n_extra + 1] if write_tape else None
        ei = len(weights)
        if not per_sample:
            seg_t = wrefs[ei][:]  # [RT, TN]
            ei += 1
        else:
            ei += 1  # w_vd_t slot
        pos_bv = wrefs[ei][:] if pos_bvals is not None else None
        dir_bv = (
            wrefs[ei + (pos_bvals is not None)][:]
            if dir_bvals is not None
            else None
        )
        axes = pts_ref[0]  # [3, TN] — one whole-ray tile, no reshapes
        pe = fused.pe_rows(spec.pos_pe, axes, bvals=pos_bv).astype(
            compute_dtype
        )  # [C, TN]

        h = pe
        wi = 0
        for i in range(depth):
            wt = wrefs[wi][:]
            b = wrefs[wi + 1][:]  # [C, 1] column bias
            wi += 2
            h = jnp.dot(
                wt, h.astype(compute_dtype), preferred_element_type=jnp.float32
            ) + b
            h = jnp.maximum(h, 0.0)
            if write_tape:
                w_ = nspec.width
                tape_ref[i * w_ : (i + 1) * w_] = h.astype(compute_dtype)
            if i in skips:
                h = jnp.concatenate([pe, h.astype(compute_dtype)], axis=0)

        wt_a, b_a = wrefs[wi][:], wrefs[wi + 1][:]
        wt_f, b_f = wrefs[wi + 2][:], wrefs[wi + 3][:]
        wt_vf, b_v = wrefs[wi + 4][:], wrefs[wi + 5][:]
        wt_rgb, b_rgb = wrefs[wi + 6][:], wrefs[wi + 7][:]
        # biases are [C, 1] columns (broadcast along lanes)

        alpha = jnp.dot(
            wt_a, h.astype(compute_dtype), preferred_element_type=jnp.float32
        ) + b_a  # [1, TN]
        feature = jnp.dot(
            wt_f, h.astype(compute_dtype), preferred_element_type=jnp.float32
        ) + b_f  # [W, TN]
        feat_part = jnp.dot(
            wt_vf, feature.astype(compute_dtype), preferred_element_type=jnp.float32
        )  # [W/2, TN]
        if per_sample:
            d_axes = dir_refs[0][0]  # [3, TN]
            dir_pe = fused.pe_rows(spec.dir_pe, d_axes, bvals=dir_bv).astype(
                compute_dtype
            )
            wt_vd = wrefs[len(weights)][:]
            dir_term = jnp.dot(
                wt_vd, dir_pe, preferred_element_type=jnp.float32
            )  # [W/2, TN]
            h2 = jnp.maximum(feat_part + dir_term + b_v, 0.0)
        else:
            dirp_t = dir_refs[0][0].T  # [1, RT, W/2] block -> [W/2, RT]
            dir_term = jnp.dot(
                dirp_t.astype(compute_dtype), seg_t,
                preferred_element_type=jnp.float32,
            )  # [W/2, TN] — segment matmul instead of a 3D broadcast
            h2 = jnp.maximum(feat_part + dir_term + b_v, 0.0)
        rgb = jnp.dot(
            wt_rgb, h2.astype(compute_dtype), preferred_element_type=jnp.float32
        ) + b_rgb  # [3, TN]
        out_ref[:] = jnp.concatenate([alpha, rgb], axis=0)  # [4, TN]

    grid = (r // rt,)
    plane_spec = pl.BlockSpec(
        (1, 3, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if per_sample:
        dir_specs = [plane_spec]
    else:
        dir_specs = [
            pl.BlockSpec(
                (1, rt, dir_part.shape[1]), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    all_weights = weights + extra_weights
    weight_specs = [
        pl.BlockSpec(
            w.shape,
            (lambda nd_: lambda i: (0,) * nd_)(w.ndim),
            memory_space=pltpu.VMEM,
        )
        for w in all_weights
    ]
    out_spec = pl.BlockSpec((4, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_specs = [out_spec]
    out_shapes = [jax.ShapeDtypeStruct((4, n), jnp.float32)]
    if write_tape:
        tw = depth * nspec.width
        out_specs.append(
            pl.BlockSpec((tw, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((tw, n), compute_dtype))

    pts = _pack_planes((px, py, pz), rt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[plane_spec] + dir_specs + weight_specs,
        out_specs=out_specs if write_tape else out_spec,
        out_shape=out_shapes if write_tape else out_shapes[0],
        interpret=interpret,
    )(pts, *dir_inputs, *all_weights)
    out = outs[0] if write_tape else outs
    sigma = out[0].reshape(r, s)[:, :s_orig]
    rgb = [out[1 + c].reshape(r, s)[:, :s_orig] for c in range(3)]
    if emit_tape:
        return (sigma, rgb), (outs[1] if write_tape else None)
    return sigma, rgb


def dir_projection(spec: JoinerSpec, params, dirs, compute_dtype=jnp.bfloat16):
    """Per-ray dir_pe @ W_dirs: dirs [R, 3] -> [R, W/2] f32."""
    width = spec.nerf.width
    if jax.default_backend() != "tpu" and compute_dtype == jnp.bfloat16:
        compute_dtype = jnp.float32  # CPU DotThunk rejects unfused bf16 dots
    w_dirs = params["views_linears"][0]["w"][width:]
    d_cn = jnp.stack([dirs[:, a] for a in range(3)], axis=0)  # [3, R]
    dir_pe = fused.pe_rows(spec.dir_pe, d_cn).astype(compute_dtype)  # [C, R]
    return jnp.dot(
        w_dirs.T.astype(compute_dtype), dir_pe,
        preferred_element_type=jnp.float32,
    ).T  # [R, W/2]


def make_fused_render(spec: JoinerSpec, samples_per_ray, importance_samples_per_ray,
                      compute_dtype=jnp.bfloat16, rays_per_tile=8):
    """Render chunk using the Pallas MLP: signature matches bench.py."""

    def render_chunk(coarse_p, fine_p, origins, dirs, near, far):
        o_ax = [origins[:, a] for a in range(3)]
        d_ax = [dirs[:, a] for a in range(3)]
        dir_norm = jnp.sqrt(d_ax[0] ** 2 + d_ax[1] ** 2 + d_ax[2] ** 2)

        z = fused.sample_z(near, far, samples_per_ray)
        planes = [o_ax[a][:, None] + d_ax[a][:, None] * z for a in range(3)]
        dirp_c = dir_projection(spec, coarse_p, dirs, compute_dtype)
        sigma, rgb_c = nerf_mlp_pallas(
            spec, coarse_p, *planes, dirp_c, compute_dtype, rays_per_tile
        )
        rgb, _, _, weights, depth = fused.integrate_planar(
            sigma, rgb_c, z, dir_norm
        )
        z_f = fused.importance_z(z, weights, importance_samples_per_ray, det=True)
        planes = [o_ax[a][:, None] + d_ax[a][:, None] * z_f for a in range(3)]
        dirp_f = dir_projection(spec, fine_p, dirs, compute_dtype)
        sigma, rgb_c = nerf_mlp_pallas(
            spec, fine_p, *planes, dirp_f, compute_dtype, rays_per_tile
        )
        rgb, _, _, weights, depth = fused.integrate_planar(
            sigma, rgb_c, z_f, dir_norm
        )
        return rgb, depth

    return render_chunk
