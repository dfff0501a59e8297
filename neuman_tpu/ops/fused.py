"""Feature-major fused render path — the TPU performance formulation.

The naive translation of NeRF math carries `[R, S, 3]` / `[N, small]`
tensors everywhere. On TPU any materialized array with a small trailing
(lane) dimension pads to the 128-lane tile: observed 42.7x (dim 3) and
128x (dim 1) memory/bandwidth blowups, OOMing modest ray batches. This
module reformulates the pipeline **feature-major**: activations are
`[C, N]` (features in sublanes, samples in lanes), so every intermediate —
positional-encoding rows, MLP activations, sigma/rgb planes — is a
perfectly tiled 2D array. Weights are transposed at trace time (cheap) and
matmuls run as `W.T @ X` on the MXU in `compute_dtype` (bfloat16) with f32
accumulation.

Extra wins:
- view-direction PE + its first matmul computed per-ray (`[W/2, R]`) and
  broadcast across samples inside a fused add (27x fewer transcendentals,
  no [W/2, N] materialization);
- numerically identical to the reference path (models/nerf.apply_joiner +
  ops/volume.raw2outputs) — parity-tested in tests/test_fused.py.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import embedder as embedder_module
from neuman_tpu.models.embedder import EmbedderSpec
from neuman_tpu.models.nerf import JoinerSpec


def pe_rows(spec: EmbedderSpec, axes_cn, bvals=None):
    """Positional-encoding feature ROWS for feature-major input.

    axes_cn: [3, ...] (x, y, z stacked on axis 0). Returns [C, ...] with the
    row order matching models.embedder.embed's column order.

    bvals: optional pre-staged [F, 3] rotation basis for the 'rotate'
    mapping — inside a Pallas kernel the basis must arrive as a kernel
    input (captured constants are rejected), so callers there pass it in.
    """
    if spec.mapping == "posenc":
        blocks = [axes_cn] if spec.include_input else []
        if spec.recurrence:
            sins, coss = embedder_module.trig_ladder(
                axes_cn * spec.freq_bands[0], len(spec.freq_bands)
            )
            for s, c in zip(sins, coss):
                blocks.append(s)
                blocks.append(c)
        else:
            for f in spec.freq_bands:
                blocks.append(jnp.sin(axes_cn * f))
                blocks.append(jnp.cos(axes_cn * f))
        return jnp.concatenate(blocks, axis=0)
    elif spec.mapping == "rotate":
        if bvals is None:
            bvals = jnp.asarray(
                np.array(spec.bvals, dtype=np.float32).reshape(-1, 3)
            )
        if spec.recurrence:
            nb = bvals.shape[0] // 3
            proj0 = jnp.tensordot(bvals[:3], axes_cn, axes=[[1], [0]])
            sins, coss = embedder_module.trig_ladder(proj0, nb)
            blocks = [jnp.concatenate(sins, 0), jnp.concatenate(coss, 0)]
        else:
            proj = jnp.tensordot(bvals, axes_cn, axes=[[1], [0]])  # [F, ...]
            blocks = [jnp.sin(proj), jnp.cos(proj)]
        if spec.include_input:
            blocks = [axes_cn] + blocks
        return jnp.concatenate(blocks, axis=0)
    raise ValueError(spec.mapping)


def pe_rows_bwd(spec: EmbedderSpec, axes_cn, d_pe, bvals=None, bvals_t=None):
    """VJP of `pe_rows` w.r.t. its axes: d_pe [C, N] -> d_axes [D, N].

    axes_cn is the primal input ([D, N], f32); trig values are recomputed
    (cheaper than storing them — this runs inside the Pallas backward kernel
    where VMEM is the scarce resource). bvals/bvals_t ([F, 3] / [3, F]) must
    be passed for the 'rotate' mapping (kernel inputs, like pe_rows).
    """
    if spec.mapping == "posenc":
        d = spec.input_dims
        idx = d if spec.include_input else 0
        d_axes = d_pe[:d] if spec.include_input else jnp.zeros_like(axes_cn)
        if spec.recurrence:
            sins, coss = embedder_module.trig_ladder(
                axes_cn * spec.freq_bands[0], len(spec.freq_bands)
            )
        for j, f in enumerate(spec.freq_bands):
            d_sin = d_pe[idx : idx + d]
            d_cos = d_pe[idx + d : idx + 2 * d]
            idx += 2 * d
            if spec.recurrence:
                s, c = sins[j], coss[j]
            else:
                s, c = jnp.sin(axes_cn * f), jnp.cos(axes_cn * f)
            d_axes = d_axes + f * (c * d_sin - s * d_cos)
        return d_axes
    elif spec.mapping == "rotate":
        if bvals is None:
            bvals = jnp.asarray(
                np.array(spec.bvals, dtype=np.float32).reshape(-1, 3)
            )
        if bvals_t is None:
            bvals_t = bvals.T
        d = spec.input_dims  # make_embedder asserts 3 for 'rotate'
        f = bvals.shape[0]
        base = d if spec.include_input else 0
        if spec.recurrence:
            nb = f // 3
            proj0 = jnp.dot(
                bvals[:3], axes_cn, preferred_element_type=jnp.float32
            )
            sins, coss = embedder_module.trig_ladder(proj0, nb)
            sin_p = jnp.concatenate(sins, 0)
            cos_p = jnp.concatenate(coss, 0)
        else:
            proj = jnp.dot(bvals, axes_cn, preferred_element_type=jnp.float32)
            sin_p, cos_p = jnp.sin(proj), jnp.cos(proj)
        d_proj = (
            cos_p * d_pe[base : base + f]
            - sin_p * d_pe[base + f : base + 2 * f]
        )
        d_axes = jnp.dot(bvals_t, d_proj, preferred_element_type=jnp.float32)
        if spec.include_input:
            d_axes = d_axes + d_pe[:d]
        return d_axes
    raise ValueError(spec.mapping)


def _dot_t(w, x, compute_dtype):
    """w: [I, O] (storage layout); x: [I, N] -> [O, N] f32 accumulation."""
    return jnp.dot(
        w.T.astype(compute_dtype), x.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def mlp_planar(
    joiner: JoinerSpec, params, pts_axes, dir_axes, compute_dtype=jnp.bfloat16,
    dirs_per_ray=True,
):
    """NeRF MLP on planarized inputs (feature-major internals).

    pts_axes: 3 x [R, S]; dir_axes: 3 x [R] (dirs_per_ray) or 3 x [R, S].
    Returns (sigma [R, S], rgb 3 x [R, S]) raw (pre-activation) outputs.
    """
    nspec = joiner.nerf
    r, s = pts_axes[0].shape
    n = r * s

    axes_cn = jnp.stack([a.reshape(-1) for a in pts_axes], axis=0)  # [3, N]
    pe = pe_rows(joiner.pos_pe, axes_cn).astype(compute_dtype)  # [C, N]
    h = pe
    for i, p in enumerate(params["pts_linears"]):
        # store activations in compute dtype (f32 accumulation stays inside
        # the matmul) — halves the HBM traffic of the layer chain
        h = jax.nn.relu(
            _dot_t(p["w"], h, compute_dtype) + p["b"][:, None]
        ).astype(compute_dtype)
        if i in nspec.skips:
            h = jnp.concatenate([pe, h], axis=0)

    if nspec.use_viewdirs:
        alpha = (
            _dot_t(params["alpha_linear"]["w"], h, compute_dtype)
            + params["alpha_linear"]["b"][:, None]
        )  # [1, N]
        feature = (
            _dot_t(params["feature_linear"]["w"], h, compute_dtype)
            + params["feature_linear"]["b"][:, None]
        )  # [W, N]
        wv = params["views_linears"][0]
        width = nspec.width
        feat_part = _dot_t(wv["w"][:width], feature, compute_dtype)  # [W/2, N]
        d_cn = jnp.stack([a.reshape(-1) for a in dir_axes], axis=0)
        dir_pe = pe_rows(joiner.dir_pe, d_cn).astype(compute_dtype)
        dir_part = _dot_t(wv["w"][width:], dir_pe, compute_dtype)
        if dirs_per_ray:
            # [W/2, R] broadcast over samples inside the fused add
            h2 = jax.nn.relu(
                feat_part.reshape(-1, r, s)
                + dir_part[:, :, None]
                + wv["b"][:, None, None]
            ).reshape(-1, n)
        else:
            h2 = jax.nn.relu(feat_part + dir_part + wv["b"][:, None])
        rgb = (
            _dot_t(params["rgb_linear"]["w"], h2, compute_dtype)
            + params["rgb_linear"]["b"][:, None]
        )  # [3, N]
        sigma = alpha.reshape(r, s)
        rgb_c = [rgb[c].reshape(r, s) for c in range(3)]
    else:
        out = (
            _dot_t(params["output_linear"]["w"], h, compute_dtype)
            + params["output_linear"]["b"][:, None]
        )
        sigma = out[3].reshape(r, s)
        rgb_c = [out[c].reshape(r, s) for c in range(3)]
    return sigma, rgb_c


def offset_net_planar(offset_spec, params, axes, scale, compute_dtype=jnp.bfloat16):
    """Offset net on planarized (x, y, z, t) columns.

    offset_spec: models.nerf.OffsetNetSpec; axes: 4 x [R, S] columns.
    Returns 3 offset coordinate planes [R, S] (scale modes applied).
    """
    nspec = offset_spec.nerf
    r, s = axes[0].shape
    axes_cn = jnp.stack([a.reshape(-1) for a in axes], axis=0)  # [4, N]
    pe = pe_rows(offset_spec.pos_pe, axes_cn).astype(compute_dtype)
    h = pe
    for i, p in enumerate(params["pts_linears"]):
        h = jax.nn.relu(
            _dot_t(p["w"], h, compute_dtype) + p["b"][:, None]
        ).astype(compute_dtype)
        if i in nspec.skips:
            h = jnp.concatenate([pe, h], axis=0)
    out = (
        _dot_t(params["output_linear"]["w"], h, compute_dtype)
        + params["output_linear"]["b"][:, None]
    )  # [3, N]
    if nspec.scale_type == "linear":
        out = out * scale
    elif nspec.scale_type == "tanh":
        out = jnp.tanh(out) * scale
    elif nspec.scale_type != "no":
        raise ValueError(nspec.scale_type)
    return [out[c].reshape(r, s) for c in range(3)]


def merge_two_sorted_planar(za, zb, chans_a, chans_b):
    """Gather-free merge of two per-ray SORTED sample sets with payloads.

    za: [R, S1], zb: [R, S2] (each nondecreasing along the last axis);
    chans_a/chans_b: lists of matching payload channels. Returns
    (z_merged [R, S1+S2], merged channels). Equivalent to
    argsort(concat)+take_along_axis but with no integer gathers: each
    element's merged RANK is its own index plus a compare-count against
    the other list (stable: A wins ties, matching stable argsort of
    [A; B]), and values land via a one-hot-rank masked sum — pure
    elementwise+reduce that XLA fuses (TPU gathers pay per index;
    measured 25.7 -> ~4 ms on the [1536, 256+128] train-step merge).
    """
    s1, s2 = za.shape[-1], zb.shape[-1]
    p = s1 + s2
    rank_a = jnp.arange(s1) + jnp.sum(
        (zb[..., None, :] < za[..., :, None]).astype(jnp.int32), axis=-1
    )  # [R, S1]
    rank_b = jnp.arange(s2) + jnp.sum(
        (za[..., None, :] <= zb[..., :, None]).astype(jnp.int32), axis=-1
    )  # [R, S2]
    pos = jnp.arange(p, dtype=jnp.int32)
    hit_a = rank_a[..., None, :] == pos[:, None]  # [R, P, S1]
    hit_b = rank_b[..., None, :] == pos[:, None]  # [R, P, S2]

    def place(ca, cb):
        return (
            jnp.sum(jnp.where(hit_a, ca[..., None, :], 0.0), axis=-1)
            + jnp.sum(jnp.where(hit_b, cb[..., None, :], 0.0), axis=-1)
        )

    z = place(za, zb)
    merged = [place(ca, cb) for ca, cb in zip(chans_a, chans_b)]
    return z, merged


def sort_merge_planar(z_list, sigma_list, rgb_c_list):
    """z-sort merge of multiple planar sample sets along each ray.

    z_list: [..., S_i] (each per-ray sorted — true for every caller:
    importance_z output, sample_z/sample_z_vals, dummy linspace);
    sigma_list: matching [..., S_i]; rgb_c_list: list of 3-channel lists.
    Returns (z_sorted, sigma_sorted, rgb_c_sorted). K lists merge by
    iterated gather-free two-way rank merges.
    """
    z = z_list[0]
    chans = [sigma_list[0]] + list(rgb_c_list[0])
    for i in range(1, len(z_list)):
        z, chans = merge_two_sorted_planar(
            z, z_list[i], chans, [sigma_list[i]] + list(rgb_c_list[i])
        )
    return z, chans[0], chans[1:4]


def integrate_planar(sigma, rgb_c, z_vals, dir_norm, white_bkg=True,
                     raw_noise_std=0.0, key=None):
    """raw2outputs on planarized channels.

    sigma: [R, S]; rgb_c: 3 x [R, S]; z_vals: [R, S]; dir_norm: [R].
    Returns (rgb [R, 3], disp [R], acc [R], weights [R, S], depth [R]).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1)
    dists = dists * dir_norm[:, None]
    if raw_noise_std > 0.0:
        assert key is not None
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std
    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans
    rgb = jnp.stack(
        [jnp.sum(weights * jax.nn.sigmoid(c), axis=-1) for c in rgb_c], axis=-1
    )
    depth = jnp.sum(weights * z_vals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    disp = 1.0 / jnp.maximum(1e-10 * jnp.ones_like(depth), depth / acc)
    if white_bkg:
        rgb = rgb + (1.0 - acc[..., None])
    return rgb, disp, acc, weights, depth


def sample_z(near, far, s):
    t = jnp.linspace(0.0, 1.0, s)
    return near.reshape(-1, 1) * (1.0 - t) + far.reshape(-1, 1) * t


def merge_sorted_pair_bitonic(za, zb):
    """Sorted merge of two per-ray SORTED lists in log2(P) compare-exchange
    stages (a single bitonic merge, not a full bitonic sort's log^2 P
    stages — the lever over lax.sort on the importance-z path).

    za: [..., S1], zb: [..., S2], both nondecreasing along the last axis.
    [za, +inf pad, reversed(zb)] is bitonic (ascending then descending), so
    one half-cleaner cascade sorts it; the pad rises to the top and is
    sliced off. Every stage is a reshape + min/max — no gathers, no sort.
    """
    p = za.shape[-1] + zb.shape[-1]
    pp = 1 << (p - 1).bit_length()
    parts = [za]
    if pp != p:
        parts.append(
            jnp.full(za.shape[:-1] + (pp - p,), jnp.inf, dtype=za.dtype)
        )
    parts.append(zb[..., ::-1])
    x = jnp.concatenate(parts, axis=-1)
    s = pp // 2
    while s >= 1:
        y = x.reshape(x.shape[:-1] + (pp // (2 * s), 2, s))
        lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
        hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
        x = jnp.concatenate([lo[..., None, :], hi[..., None, :]], axis=-2)
        x = x.reshape(x.shape[:-3] + (pp,))
        s //= 2
    return x[..., :p]


def importance_z(z_vals, weights, n, det=True, key=None):
    from neuman_tpu.ops.rays import sample_pdf

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(z_mid, weights[..., 1:-1], n, det=det, key=key)
    z_samples = jax.lax.stop_gradient(z_samples)
    if det:
        # det=True inverse CDF is nondecreasing in the (ascending) u grid,
        # so both lists are sorted: a single bitonic MERGE (log P stages)
        # replaces the full lax.sort (the O(P^2) rank merge lost here —
        # no payload gathers to amortize — but the merge network wins:
        # ~10 ms of the 142 ms 32k-ray chunk was this sort).
        return merge_sorted_pair_bitonic(z_vals, z_samples)
    return jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)


@partial(
    jax.jit,
    static_argnames=("spec", "samples_per_ray", "importance_samples_per_ray",
                     "white_bkg", "compute_dtype_name", "use_fine"),
)
def fused_vanilla_render(
    spec: JoinerSpec, coarse_params, fine_params, origins, dirs, near, far,
    samples_per_ray=128, importance_samples_per_ray=128, white_bkg=True,
    compute_dtype_name="bfloat16", use_fine=True,
):
    """Full coarse->importance->fine render for a ray chunk.

    origins/dirs: [R, 3]; near/far: [R, 1]. Returns (rgb [R, 3], depth [R]).
    """
    compute_dtype = jnp.bfloat16 if compute_dtype_name == "bfloat16" else jnp.float32
    o_ax = [origins[:, a] for a in range(3)]
    d_ax = [dirs[:, a] for a in range(3)]
    dir_norm = jnp.sqrt(d_ax[0] ** 2 + d_ax[1] ** 2 + d_ax[2] ** 2)

    z = sample_z(near, far, samples_per_ray)
    pts_axes = [o_ax[a][:, None] + d_ax[a][:, None] * z for a in range(3)]
    sigma, rgb_c = mlp_planar(spec, coarse_params, pts_axes, d_ax, compute_dtype)
    rgb, _, _, weights, depth = integrate_planar(
        sigma, rgb_c, z, dir_norm, white_bkg
    )
    if use_fine:
        z_f = importance_z(z, weights, importance_samples_per_ray, det=True)
        pts_axes = [o_ax[a][:, None] + d_ax[a][:, None] * z_f for a in range(3)]
        sigma, rgb_c = mlp_planar(spec, fine_params, pts_axes, d_ax, compute_dtype)
        rgb, _, _, weights, depth = integrate_planar(
            sigma, rgb_c, z_f, dir_norm, white_bkg
        )
    return rgb, depth
