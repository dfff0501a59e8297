"""Custom-VJP Pallas NeRF MLP: fused forward + recompute-in-VMEM backward.

The XLA backward of the 8x256 MLP is HBM-bound: every layer's [256, N]
activation round-trips HBM between the forward tape and the transposed
matmuls (measured 11.9 ms fwd+bwd vs 2.9 ms Pallas fwd per [1536, 128]
application — BASELINE.md). This module keeps the whole fwd+bwd in VMEM:

- forward is the existing `raymarch.nerf_mlp_pallas` kernel;
- backward is ONE Pallas kernel per tile of rays that (a) recomputes the
  forward activations in VMEM (bf16), (b) backpropagates the head + trunk,
  (c) writes per-tile input cotangents, and (d) accumulates weight
  cotangents across the sequential TPU grid into revisited output blocks.
  Bias gradients ride along as a trailing ones-row on each activation, so
  each layer emits a single [O, I+1] block whose last column is db
  (one output per layer instead of two).

HBM traffic of the backward: sample planes + cotangents + the ~600 KB of
weight grads — activations never leave the chip.

Gradient semantics match `ops.fused.mlp_planar` under jax.grad (the
trainer's parity oracle): bf16 dots with f32 accumulation, relu masks from
the forward values, PE trig recomputed in f32.

Reference being replaced: torch autograd through the MLP family of
models/vanilla.py:95-152 (the human canonical/offset nets of
human_nerf_trainer.py:241-380, applied 5x per training step).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuman_tpu.models.nerf import JoinerSpec
from neuman_tpu.ops import fused
from neuman_tpu.ops.pallas import raymarch


def _pick_bwd_tile(r, s, rays_per_tile, target_tn):
    """Backward tile: largest rt <= rays_per_tile with r % rt == 0 and
    (rt*s) % 128 == 0 whose lane count rt*s stays within target_tn (the
    bwd holds ~9 activation tensors + dW accumulators per tile: measured
    19.9 MB at TN=1024/f32 vs the 16 MB scoped-vmem limit). Falls back to
    the smallest legal tile, then to sample-axis padding."""
    valid = [
        rt
        for rt in range(min(rays_per_tile, r), 0, -1)
        if r % rt == 0 and (rt * s) % 128 == 0
    ]
    for rt in valid:
        if rt * s <= target_tn:
            return rt, 0
    # No divisor-legal tile fits the lane budget: prefer padding the sample
    # axis (whose minimum tile is 1*sp lanes) over returning an over-budget
    # tile that blows the scoped-VMEM limit at Mosaic compile time.
    pad_s = (-s) % 128
    sp = s + pad_s
    for cand in range(min(rays_per_tile, r), 0, -1):
        if r % cand == 0 and cand * sp <= target_tn:
            return cand, pad_s
    # Nothing fits the budget either way; take whichever minimal tile has
    # the smaller lane count (both may exceed target_tn, e.g. huge S).
    if valid and valid[-1] * s <= sp:
        return valid[-1], 0
    return 1, pad_s


def _bvals_arrays(pe_spec):
    if pe_spec.mapping != "rotate":
        return None, None
    b = np.array(pe_spec.bvals, dtype=np.float32).reshape(-1, 3)
    return jnp.asarray(b), jnp.asarray(b.T.copy())


def _mlp_bwd(
    spec: JoinerSpec, params, planes, dir_inputs, g_sigma, g_rgb,
    compute_dtype, rays_per_tile, per_sample, interpret, tape=None,
):
    """Backward pass. planes: 3 x [R, S]; dir_inputs: 3 x [R, S] planes
    (per_sample) or a [R, W/2] `dir_projection` (per-ray). Returns
    (d_params_pytree_leaves..., d_planes 3 x [R, S], d_dir) with d_dir the
    matching cotangent ([R, S] planes or [R, W/2]).

    tape: optional [depth*W, R*S] post-relu trunk activations from the
    forward (`nerf_mlp_pallas(emit_tape=True)`, compute dtype). When given
    the kernel streams the tape from HBM instead of recomputing the trunk
    matmuls — the DMA pipelines behind the MXU-bound dW/d_h contractions,
    trading ~0.4 GB of (overlappable) traffic per cached layer for 1/3 of
    the backward's matmul FLOPs. Values are bit-identical to the
    recompute path (same bf16 post-relu activations either way)."""
    nspec = spec.nerf
    depth, width, skips = nspec.depth, nspec.width, nspec.skips
    half = width // 2
    px, py, pz = planes
    r, s_orig = px.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cd = compute_dtype
    if interpret and cd == jnp.bfloat16:
        cd = jnp.float32  # CPU interpret mode: unfused bf16 dots unsupported
        if tape is not None:
            tape = tape.astype(cd)
    # lane-budgeted backward tile (f32 doubles the activation footprint;
    # the streamed tape block [depth*W, TN] halves it again)
    target_tn = 512 if cd == jnp.float32 else 1024
    if tape is not None:
        target_tn //= 2
    if interpret:
        rt, pad_s = raymarch.pick_tile(r, s_orig, rays_per_tile)
    else:
        rt, pad_s = _pick_bwd_tile(r, s_orig, rays_per_tile * 4, target_tn)
    if pad_s and tape is not None:
        # sample-axis padding would misalign the tape's flat lane layout;
        # fall back to the recompute path for this shape
        tape = None
        if not interpret:
            target_tn *= 2
            rt, pad_s = _pick_bwd_tile(r, s_orig, rays_per_tile * 4, target_tn)
    if pad_s:
        epad = lambda a: jnp.pad(a, ((0, 0), (0, pad_s)), mode="edge")
        zpad = lambda a: jnp.pad(a, ((0, 0), (0, pad_s)))
        px, py, pz = epad(px), epad(py), epad(pz)
        g_sigma = zpad(g_sigma)
        g_rgb = [zpad(c) for c in g_rgb]
        if per_sample:
            dir_inputs = [epad(d) for d in dir_inputs]
    s = s_orig + pad_s
    tn = rt * s
    n = r * s
    pts = raymarch._pack_planes((px, py, pz), rt)  # [G, 3, TN]
    if per_sample:
        dir_packed = raymarch._pack_planes(tuple(dir_inputs), rt)
    else:
        # per-ray mode: dirp packed as [G, RT, W/2] — the trailing dims
        # equal the array dims so ANY rt is a legal block (a 2D [rt, W/2]
        # block violates the 8-sublane rule at small rt, and a
        # pre-broadcast [W/2, N] dir_term costs 0.5 GB HBM at bkg sizes)
        dir_packed = dir_inputs[0].reshape(r // rt, rt, half)

    g = jnp.concatenate(
        [g_sigma.reshape(1, -1)] + [c.reshape(1, -1) for c in g_rgb], axis=0
    ).astype(jnp.float32)  # [4, N]

    # weights in both orientations (cd) + the biases the recompute needs
    trunk = params["pts_linears"]
    fan_ins = [trunk[i]["w"].shape[0] for i in range(depth)]
    w_list = []
    for p in trunk:
        w_list += [p["w"].T.astype(cd), p["w"].astype(cd)]
    wv = params["views_linears"][0]
    w_list += [
        params["alpha_linear"]["w"].T.astype(cd),
        params["alpha_linear"]["w"].astype(cd),
        params["feature_linear"]["w"].T.astype(cd),
        params["feature_linear"]["w"].astype(cd),
        wv["w"][:width].T.astype(cd),
        wv["w"][:width].astype(cd),
        params["rgb_linear"]["w"].T.astype(cd),
        params["rgb_linear"]["w"].astype(cd),
    ]
    if per_sample:
        w_list += [wv["w"][width:].T.astype(cd), wv["w"][width:].astype(cd)]
    b_list = [p["b"].reshape(-1, 1) for p in trunk]
    b_list += [
        params["feature_linear"]["b"].reshape(-1, 1),
        wv["b"].reshape(-1, 1),
    ]

    pos_bv, pos_bvt = _bvals_arrays(spec.pos_pe)
    dir_bv, dir_bvt = (
        _bvals_arrays(spec.dir_pe) if per_sample else (None, None)
    )
    extra = [a for a in (pos_bv, pos_bvt, dir_bv, dir_bvt) if a is not None]
    n_pos_bv = 2 if pos_bv is not None else 0
    if not per_sample:
        # dir_term = dirp_t @ seg_t (row r of seg_t marks ray r's lanes);
        # d_dirp = seg_t (contract lanes) d_pre2
        extra = extra + [raymarch._seg_matrix(rt, s, cd)]
    n_w = len(w_list)
    n_b = len(b_list)
    cd_dim = spec.dir_pe.out_dim

    def kernel(*refs):
        pts_ref, dir_ref, g_ref = refs[0], refs[1], refs[2]
        base = 3
        tape_ref = None
        if tape is not None:
            tape_ref = refs[3]
            base = 4
        wrefs = refs[base : base + n_w]
        brefs = refs[base + n_w : base + n_w + n_b]
        erefs = refs[base + n_w + n_b : base + n_w + n_b + len(extra)]
        out_refs = refs[base + n_w + n_b + len(extra) :]

        p_bv = erefs[0][:] if pos_bv is not None else None
        p_bvt = erefs[1][:] if pos_bv is not None else None
        if per_sample:
            d_bv = erefs[n_pos_bv][:] if dir_bv is not None else None
            d_bvt = erefs[n_pos_bv + 1][:] if dir_bv is not None else None
        else:
            seg_t = erefs[-1][:]

        first = pl.program_id(0) == 0

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[:] = val

            @pl.when(jnp.logical_not(first))
            def _():
                ref[:] = ref[:] + val

        def dot_cd(a, b):
            return jnp.dot(
                a.astype(cd), b.astype(cd), preferred_element_type=jnp.float32
            )

        def contract_n(a, b):
            # [O, TN] x [I, TN] -> [O, I] (both contract on lanes)
            return jax.lax.dot_general(
                a.astype(cd), b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        ones = jnp.ones((1, tn), cd)

        # ---- forward activations: streamed tape or recompute-in-VMEM ----
        axes = pts_ref[0]  # [3, TN] f32, whole-ray lane tile
        pe32 = fused.pe_rows(spec.pos_pe, axes, bvals=p_bv)
        pe = pe32.astype(cd)
        hins, posts = [], []
        h = pe
        for i in range(depth):
            hins.append(h)
            if tape_ref is not None:
                post = tape_ref[i * width : (i + 1) * width].astype(cd)
            else:
                pre = dot_cd(wrefs[2 * i][:], h) + brefs[i][:]
                post = jnp.maximum(pre, 0.0).astype(cd)
            posts.append(post)
            h = jnp.concatenate([pe, post], axis=0) if i in skips else post
        h_final = h  # == posts[-1] (no skip after the last layer here)
        wt_f, w_f = wrefs[2 * depth + 2][:], wrefs[2 * depth + 3][:]
        wt_vf, w_vf = wrefs[2 * depth + 4][:], wrefs[2 * depth + 5][:]
        w_rgb = wrefs[2 * depth + 7][:]
        b_f, b_v = brefs[depth][:], brefs[depth + 1][:]
        feature = (dot_cd(wt_f, h_final) + b_f).astype(cd)
        feat_part = dot_cd(wt_vf, feature)
        if per_sample:
            d_axes_in = dir_ref[0]  # [3, TN]
            dir_pe32 = fused.pe_rows(spec.dir_pe, d_axes_in, bvals=d_bv)
            dir_pe = dir_pe32.astype(cd)
            wt_vd = wrefs[2 * depth + 8][:]
            pre2 = feat_part + dot_cd(wt_vd, dir_pe) + b_v[:]
        else:
            dirp_t = dir_ref[0].T  # [RT, W/2] tile -> [W/2, RT]
            pre2 = feat_part + dot_cd(dirp_t, seg_t) + b_v[:]
        h2 = jnp.maximum(pre2, 0.0).astype(cd)

        # ---- backward ----
        gv = g_ref[:]
        g_alpha, g_rgb_rows = gv[0:1], gv[1:4]
        # output block order: d_pts, d_dir, trunk dwts, head dwts
        o_trunk = out_refs[2 : 2 + depth]
        o_a = out_refs[2 + depth]
        o_f = out_refs[2 + depth + 1]
        o_vf = out_refs[2 + depth + 2]
        o_rgb = out_refs[2 + depth + 3]

        acc(o_rgb, contract_n(g_rgb_rows, jnp.concatenate([h2, ones], 0)))
        d_h2 = dot_cd(w_rgb, g_rgb_rows)
        d_pre2 = jnp.where(pre2 > 0, d_h2, 0.0)
        if per_sample:
            o_vd = out_refs[2 + depth + 4]
            acc(o_vd, contract_n(d_pre2, dir_pe))
            w_vd = wrefs[2 * depth + 9][:]
            d_dirpe = dot_cd(w_vd, d_pre2)
            dd = fused.pe_rows_bwd(
                spec.dir_pe, d_axes_in, d_dirpe, bvals=d_bv, bvals_t=d_bvt
            )
            out_refs[1][0] = dd  # [3, TN]
        else:
            out_refs[1][0] = contract_n(seg_t, d_pre2)  # d(dirp), [RT, W/2]
        acc(o_vf, contract_n(d_pre2, jnp.concatenate([feature, ones], 0)))
        d_feature = dot_cd(w_vf, d_pre2)
        acc(o_f, contract_n(d_feature, jnp.concatenate([h_final, ones], 0)))
        d_h = dot_cd(w_f, d_feature)
        acc(o_a, contract_n(g_alpha, jnp.concatenate([h_final, ones], 0)))
        d_h = d_h + dot_cd(wrefs[2 * depth + 1][:], g_alpha)

        d_pe_acc = jnp.zeros_like(pe32)
        for i in reversed(range(depth)):
            if i in skips:
                d_pe_acc = d_pe_acc + d_h[: pe.shape[0]]
                d_h = d_h[pe.shape[0] :]
            # mask compare in f32 (Mosaic rejects bf16 cmpf)
            d_pre = jnp.where(posts[i].astype(jnp.float32) > 0, d_h, 0.0)
            acc(
                o_trunk[i],
                contract_n(d_pre, jnp.concatenate([hins[i], ones], 0)),
            )
            d_h = dot_cd(wrefs[2 * i + 1][:], d_pre)
        d_pe_acc = d_pe_acc + d_h
        d_axes = fused.pe_rows_bwd(
            spec.pos_pe, axes, d_pe_acc, bvals=p_bv, bvals_t=p_bvt
        )
        out_refs[0][0] = d_axes  # [3, TN]

    plane_spec = pl.BlockSpec(
        (1, 3, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if per_sample:
        dir_specs = [plane_spec]
    else:
        dir_specs = [
            pl.BlockSpec(
                (1, rt, half), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
    g_spec = pl.BlockSpec((4, tn), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full_spec(a):
        return pl.BlockSpec(
            a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
            memory_space=pltpu.VMEM,
        )

    tape_specs, tape_args = [], []
    if tape is not None:
        tape_specs = [
            pl.BlockSpec(
                (depth * width, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ]
        tape_args = [tape]
    in_specs = (
        [plane_spec] + dir_specs + [g_spec] + tape_specs
        + [full_spec(w) for w in w_list]
        + [full_spec(b) for b in b_list]
        + [full_spec(e) for e in extra]
    )

    acc_spec = lambda shape: (
        pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct(shape, jnp.float32),
    )
    out_specs = [plane_spec]
    out_shapes = [jax.ShapeDtypeStruct((r // rt, 3, tn), jnp.float32)]
    if per_sample:
        out_specs += [plane_spec]
        out_shapes += [jax.ShapeDtypeStruct((r // rt, 3, tn), jnp.float32)]
    else:
        out_specs += [
            pl.BlockSpec(
                (1, rt, half), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ]
        out_shapes += [jax.ShapeDtypeStruct((r // rt, rt, half), jnp.float32)]
    head_shapes = [(width, f + 1) for f in fan_ins]
    head_shapes += [(1, width + 1), (width, width + 1), (half, width + 1),
                    (3, half + 1)]
    if per_sample:
        head_shapes += [(half, cd_dim)]
    for shape in head_shapes:
        sp, sh = acc_spec(shape)
        out_specs.append(sp)
        out_shapes.append(sh)

    outs = pl.pallas_call(
        kernel,
        grid=(r // rt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pts, dir_packed, g, *tape_args, *w_list, *b_list, *extra)

    def unpack(o):  # [G, 3, TN] -> 3 x [R, s_orig]
        return [o[:, a].reshape(r, s)[:, :s_orig] for a in range(3)]

    d_planes = unpack(outs[0])
    if per_sample:
        d_dir = unpack(outs[1])
    else:
        d_dir = outs[1].reshape(r, half)
    base = 2
    dwt_trunk = outs[base : base + depth]
    dwt_a, dwt_f, dwt_vf, dwt_rgb = outs[base + depth : base + depth + 4]
    dwt_vd = outs[base + depth + 4] if per_sample else None

    d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(depth):
        d_params["pts_linears"][i]["w"] = dwt_trunk[i][:, : fan_ins[i]].T
        d_params["pts_linears"][i]["b"] = dwt_trunk[i][:, fan_ins[i]]
    d_params["alpha_linear"]["w"] = dwt_a[:, :width].T
    d_params["alpha_linear"]["b"] = dwt_a[:, width]
    d_params["feature_linear"]["w"] = dwt_f[:, :width].T
    d_params["feature_linear"]["b"] = dwt_f[:, width]
    dw_views_top = dwt_vf[:, :width].T  # [W, W/2]
    if per_sample:
        dw_views_bot = dwt_vd.T  # [Cd, W/2]
    else:
        dw_views_bot = jnp.zeros(
            (wv["w"].shape[0] - width, half), jnp.float32
        )  # dir rows get their grad via dir_projection outside
    d_params["views_linears"][0]["w"] = jnp.concatenate(
        [dw_views_top, dw_views_bot], axis=0
    )
    d_params["views_linears"][0]["b"] = dwt_vf[:, width]
    d_params["rgb_linear"]["w"] = dwt_rgb[:, :half].T
    d_params["rgb_linear"]["b"] = dwt_rgb[:, half]
    return d_params, d_planes, d_dir


def make_mlp_vjp(
    spec: JoinerSpec, compute_dtype=jnp.bfloat16, rays_per_tile=8,
    per_sample=True, interpret=None, tape_mode="recompute",
):
    """Differentiable fused MLP: returns f(params, px, py, pz, *dir_args)
    -> (sigma [R, S], rgb 3 x [R, S]) with a Pallas forward AND backward.

    per_sample=True: dir_args = 3 x [R, S] direction planes (canonical
    human net). per_sample=False: dir_args = (dir_part [R, W/2],) — the
    per-ray `raymarch.dir_projection` output, whose own VJP (to dirs and
    the dir rows of views_linears) runs in XLA outside the kernel.

    tape_mode: "recompute" (backward re-derives the trunk activations in
    VMEM — zero extra HBM traffic, 4x-fwd FLOP factor) or "hbm" (forward
    writes the post-relu trunk tape to HBM, backward streams it — 3x-fwd
    FLOPs, ~0.8 GB/step overlappable traffic at production sizes). Both
    produce bit-identical gradients; pick by measurement
    (tools/bench_step_parts.py).
    """
    assert spec.nerf.use_viewdirs
    use_tape = tape_mode == "hbm"

    if per_sample:

        @jax.custom_vjp
        def f(params, px, py, pz, d0, d1, d2):
            return raymarch.nerf_mlp_pallas(
                spec, params, px, py, pz, None, compute_dtype, rays_per_tile,
                interpret=interpret, dir_planes=(d0, d1, d2),
            )

        def fwd(params, px, py, pz, d0, d1, d2):
            if use_tape:
                out, tape = raymarch.nerf_mlp_pallas(
                    spec, params, px, py, pz, None, compute_dtype,
                    rays_per_tile, interpret=interpret,
                    dir_planes=(d0, d1, d2), emit_tape=True,
                )
            else:
                out, tape = f(params, px, py, pz, d0, d1, d2), None
            return out, (params, px, py, pz, d0, d1, d2, tape)

        def bwd(res, g):
            params, px, py, pz, d0, d1, d2, tape = res
            g_sigma, g_rgb = g
            d_params, d_planes, d_dir = _mlp_bwd(
                spec, params, (px, py, pz), (d0, d1, d2), g_sigma, g_rgb,
                compute_dtype, rays_per_tile, True, interpret, tape=tape,
            )
            return (d_params, *d_planes, *d_dir)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def f(params, px, py, pz, dir_part):
        return raymarch.nerf_mlp_pallas(
            spec, params, px, py, pz, dir_part, compute_dtype, rays_per_tile,
            interpret=interpret,
        )

    def fwd(params, px, py, pz, dir_part):
        if use_tape:
            out, tape = raymarch.nerf_mlp_pallas(
                spec, params, px, py, pz, dir_part, compute_dtype,
                rays_per_tile, interpret=interpret, emit_tape=True,
            )
        else:
            out, tape = f(params, px, py, pz, dir_part), None
        return out, (params, px, py, pz, dir_part, tape)

    def bwd(res, g):
        params, px, py, pz, dir_part, tape = res
        g_sigma, g_rgb = g
        d_params, d_planes, d_dir = _mlp_bwd(
            spec, params, (px, py, pz), (dir_part,), g_sigma, g_rgb,
            compute_dtype, rays_per_tile, False, interpret, tape=tape,
        )
        return (d_params, *d_planes, d_dir)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# no-viewdirs MLP (the offset nets): trunk + linear head, custom VJP
# ---------------------------------------------------------------------------


def _offset_fwd_impl(spec, params, planes, compute_dtype, rays_per_tile,
                     interpret, emit_tape=False):
    """Fused PE+trunk+linear for OffsetNetSpec-shaped nets.

    planes: D x [R, S] input coordinate planes (D = 4 for (x, y, z, t)).
    Returns raw outputs as a [O, N] array (scale modes applied by the
    caller — the ramp scale is a traced scalar). Ref: vanilla.py:169-177.

    emit_tape=True additionally returns the [depth*W, N] post-relu trunk
    tape (compute dtype) for the HBM-tape backward, or None when the
    sample axis had to be padded.
    """
    nspec = spec.nerf
    depth, skips = nspec.depth, nspec.skips
    width = nspec.width
    n_out = nspec.output_ch
    r, s_orig = planes[0].shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cd = compute_dtype
    if interpret and cd == jnp.bfloat16:
        cd = jnp.float32
    rt, pad_s = raymarch.pick_tile(r, s_orig, rays_per_tile)
    write_tape = emit_tape and pad_s == 0
    if write_tape and not interpret:
        # cap the tile so the double-buffered [depth*W, TN] tape output
        # block fits scoped VMEM (measured 16.79M/16M at TN=1024/f32)
        rt_tape = raymarch.pick_tile_tape(
            r, s_orig, rays_per_tile, depth * width, jnp.dtype(cd).itemsize
        )
        if rt_tape is None:
            write_tape = False
        else:
            rt = rt_tape
    if pad_s:
        planes = [jnp.pad(a, ((0, 0), (0, pad_s)), mode="edge") for a in planes]
    s = s_orig + pad_s
    tn = rt * s
    n = r * s
    d_in = len(planes)
    pts = raymarch._pack_planes(tuple(planes), rt)  # [G, D, TN]

    w_list = []
    for p in params["pts_linears"]:
        w_list += [p["w"].T.astype(cd), p["b"].reshape(-1, 1)]
    w_list += [
        params["output_linear"]["w"].T.astype(cd),
        params["output_linear"]["b"].reshape(-1, 1),
    ]
    pos_bv, _ = _bvals_arrays(spec.pos_pe)
    extra = [pos_bv] if pos_bv is not None else []

    def kernel(pts_ref, *refs):
        wrefs = refs[: len(w_list) + len(extra)]
        out_ref = refs[len(w_list) + len(extra)]
        tape_ref = refs[len(w_list) + len(extra) + 1] if write_tape else None
        p_bv = wrefs[len(w_list)][:] if pos_bv is not None else None
        axes = pts_ref[0]  # [D, TN]
        pe = fused.pe_rows(spec.pos_pe, axes, bvals=p_bv).astype(cd)
        h = pe
        for i in range(depth):
            wt, b = wrefs[2 * i][:], wrefs[2 * i + 1][:]
            h = jnp.dot(
                wt, h.astype(cd), preferred_element_type=jnp.float32
            ) + b
            h = jnp.maximum(h, 0.0)
            if write_tape:
                tape_ref[i * width : (i + 1) * width] = h.astype(cd)
            if i in skips:
                h = jnp.concatenate([pe, h.astype(cd)], axis=0)
        wt_o, b_o = wrefs[2 * depth][:], wrefs[2 * depth + 1][:]
        out_ref[:] = jnp.dot(
            wt_o, h.astype(cd), preferred_element_type=jnp.float32
        ) + b_o

    plane_spec = pl.BlockSpec(
        (1, d_in, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    def full_spec(a):
        return pl.BlockSpec(
            a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
            memory_space=pltpu.VMEM,
        )

    out_specs = [
        pl.BlockSpec((n_out, tn), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((n_out, n), jnp.float32)]
    if write_tape:
        out_specs.append(
            pl.BlockSpec(
                (depth * width, tn), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((depth * width, n), cd)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(r // rt,),
        in_specs=[plane_spec] + [full_spec(w) for w in w_list + extra],
        out_specs=out_specs if write_tape else out_specs[0],
        out_shape=out_shapes if write_tape else out_shapes[0],
        interpret=interpret,
    )(pts, *w_list, *extra)
    out = outs[0] if write_tape else outs
    rows = [out[c].reshape(r, s)[:, :s_orig] for c in range(n_out)]
    if emit_tape:
        return rows, (outs[1] if write_tape else None)
    return rows


def _offset_bwd(spec, params, planes, g_rows, compute_dtype, rays_per_tile,
                interpret, tape=None):
    """Backward for `_offset_fwd_impl`: recompute-in-VMEM, like _mlp_bwd;
    with `tape` ([depth*W, N] post-relu trunk stack from the forward) the
    trunk recompute matmuls are replaced by streamed loads."""
    nspec = spec.nerf
    depth, width, skips = nspec.depth, nspec.width, nspec.skips
    n_out = nspec.output_ch
    r, s_orig = planes[0].shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cd = compute_dtype
    if interpret and cd == jnp.bfloat16:
        cd = jnp.float32
        if tape is not None:
            tape = tape.astype(cd)
    rpt_eff = rays_per_tile
    if cd == jnp.float32 and not interpret:
        rpt_eff = max(1, rays_per_tile // 2)
    if tape is not None and not interpret:
        rpt_eff = max(1, rpt_eff // 2)  # tape block halves the lane budget
    rt, pad_s = raymarch.pick_tile(r, s_orig, rpt_eff)
    if pad_s and tape is not None:
        tape = None  # flat tape layout misaligns under sample padding
    if pad_s:
        planes = [jnp.pad(a, ((0, 0), (0, pad_s)), mode="edge") for a in planes]
        g_rows = [jnp.pad(c, ((0, 0), (0, pad_s))) for c in g_rows]
    s = s_orig + pad_s
    tn = rt * s
    n = r * s
    d_in = len(planes)
    pts = raymarch._pack_planes(tuple(planes), rt)
    g = jnp.concatenate(
        [c.reshape(1, -1) for c in g_rows], axis=0
    ).astype(jnp.float32)  # [O, N]

    trunk = params["pts_linears"]
    fan_ins = [trunk[i]["w"].shape[0] for i in range(depth)]
    w_list = []
    for p in trunk:
        w_list += [p["w"].T.astype(cd), p["w"].astype(cd)]
    w_list += [
        params["output_linear"]["w"].T.astype(cd),
        params["output_linear"]["w"].astype(cd),
    ]
    b_list = [p["b"].reshape(-1, 1) for p in trunk]
    pos_bv, pos_bvt = _bvals_arrays(spec.pos_pe)
    extra = [a for a in (pos_bv, pos_bvt) if a is not None]
    n_w = len(w_list)
    n_b = len(b_list)

    def kernel(pts_ref, g_ref, *refs):
        tape_ref = None
        if tape is not None:
            tape_ref = refs[0]
            refs = refs[1:]
        wrefs = refs[:n_w]
        brefs = refs[n_w : n_w + n_b]
        erefs = refs[n_w + n_b : n_w + n_b + len(extra)]
        out_refs = refs[n_w + n_b + len(extra) :]
        p_bv = erefs[0][:] if pos_bv is not None else None
        p_bvt = erefs[1][:] if pos_bv is not None else None

        first = pl.program_id(0) == 0

        def acc(ref, val):
            @pl.when(first)
            def _():
                ref[:] = val

            @pl.when(jnp.logical_not(first))
            def _():
                ref[:] = ref[:] + val

        def dot_cd(a, b):
            return jnp.dot(
                a.astype(cd), b.astype(cd), preferred_element_type=jnp.float32
            )

        def contract_n(a, b):
            return jax.lax.dot_general(
                a.astype(cd), b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        ones = jnp.ones((1, tn), cd)
        axes = pts_ref[0]
        pe32 = fused.pe_rows(spec.pos_pe, axes, bvals=p_bv)
        pe = pe32.astype(cd)
        hins, posts = [], []
        h = pe
        for i in range(depth):
            hins.append(h)
            if tape_ref is not None:
                post = tape_ref[i * width : (i + 1) * width].astype(cd)
            else:
                pre = dot_cd(wrefs[2 * i][:], h) + brefs[i][:]
                post = jnp.maximum(pre, 0.0).astype(cd)
            posts.append(post)
            h = jnp.concatenate([pe, post], axis=0) if i in skips else post
        h_final = h

        gv = g_ref[:]
        o_trunk = out_refs[1 : 1 + depth]
        o_out = out_refs[1 + depth]
        acc(o_out, contract_n(gv, jnp.concatenate([h_final, ones], 0)))
        d_h = dot_cd(wrefs[2 * depth + 1][:], gv)
        d_pe_acc = jnp.zeros_like(pe32)
        for i in reversed(range(depth)):
            if i in skips:
                d_pe_acc = d_pe_acc + d_h[: pe.shape[0]]
                d_h = d_h[pe.shape[0] :]
            d_pre = jnp.where(posts[i].astype(jnp.float32) > 0, d_h, 0.0)
            acc(
                o_trunk[i],
                contract_n(d_pre, jnp.concatenate([hins[i], ones], 0)),
            )
            d_h = dot_cd(wrefs[2 * i + 1][:], d_pre)
        d_pe_acc = d_pe_acc + d_h
        d_axes = fused.pe_rows_bwd(
            spec.pos_pe, axes, d_pe_acc, bvals=p_bv, bvals_t=p_bvt
        )
        out_refs[0][0] = d_axes  # [D, TN]

    plane_spec = pl.BlockSpec(
        (1, d_in, tn), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (n_out, tn), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def full_spec(a):
        return pl.BlockSpec(
            a.shape, (lambda nd: lambda i: (0,) * nd)(a.ndim),
            memory_space=pltpu.VMEM,
        )

    out_specs = [plane_spec]
    out_shapes = [jax.ShapeDtypeStruct((r // rt, d_in, tn), jnp.float32)]
    for shape in [(width, f + 1) for f in fan_ins] + [(n_out, width + 1)]:
        out_specs.append(
            pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct(shape, jnp.float32))

    tape_specs, tape_args = [], []
    if tape is not None:
        tape_specs = [
            pl.BlockSpec(
                (depth * width, tn), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        ]
        tape_args = [tape]
    outs = pl.pallas_call(
        kernel,
        grid=(r // rt,),
        in_specs=[plane_spec, g_spec] + tape_specs
        + [full_spec(a) for a in w_list + b_list + extra],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(pts, g, *tape_args, *w_list, *b_list, *extra)

    d_planes = [
        outs[0][:, a].reshape(r, s)[:, :s_orig] for a in range(d_in)
    ]
    dwt_trunk = outs[1 : 1 + depth]
    dwt_out = outs[1 + depth]
    d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(depth):
        d_params["pts_linears"][i]["w"] = dwt_trunk[i][:, : fan_ins[i]].T
        d_params["pts_linears"][i]["b"] = dwt_trunk[i][:, fan_ins[i]]
    d_params["output_linear"]["w"] = dwt_out[:, :width].T
    d_params["output_linear"]["b"] = dwt_out[:, width]
    return d_params, d_planes


def make_offset_mlp_vjp(
    spec, compute_dtype=jnp.bfloat16, rays_per_tile=8, interpret=None,
    tape_mode="recompute",
):
    """Differentiable fused no-viewdirs MLP: f(params, *planes) -> list of
    output planes (raw, pre-scale). For OffsetNetSpec (D=4 input) and any
    use_viewdirs=False NeRFSpec. tape_mode as in make_mlp_vjp."""
    assert not spec.nerf.use_viewdirs
    use_tape = tape_mode == "hbm"

    @jax.custom_vjp
    def f(params, *planes):
        return _offset_fwd_impl(
            spec, params, list(planes), compute_dtype, rays_per_tile,
            interpret,
        )

    def fwd(params, *planes):
        if use_tape:
            out, tape = _offset_fwd_impl(
                spec, params, list(planes), compute_dtype, rays_per_tile,
                interpret, emit_tape=True,
            )
        else:
            out, tape = f(params, *planes), None
        return out, (params, planes, tape)

    def bwd(res, g):
        params, planes, tape = res
        d_params, d_planes = _offset_bwd(
            spec, params, list(planes), list(g), compute_dtype,
            rays_per_tile, interpret, tape=tape,
        )
        return (d_params, *d_planes)

    f.defvjp(fwd, bwd)
    return f
