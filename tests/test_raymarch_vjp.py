"""Gradient parity: custom-VJP Pallas MLP vs the XLA planar formulation.

The Pallas pair (fwd kernel + recompute-in-VMEM bwd kernel) must match
jax.grad through ops.fused.mlp_planar — the trainer's parity oracle — for
both view-direction modes, w.r.t. params AND inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import fused
from neuman_tpu.ops.pallas import raymarch, raymarch_vjp


def _spec(posenc="posenc"):
    class Opt:
        net_depth = 8
        net_width = 256
        use_viewdirs = True
        max_freq = 9
        num_freqs = 10
        max_freq_dir = 3
        num_freqs_dir = 4
        min_freq = 0
        posenc_fn = posenc
        specular_can = True

    from neuman_tpu.models.embedder import make_embedder

    pos_pe = make_embedder(3, Opt.max_freq, Opt.num_freqs, mapping=posenc)
    dir_pe = make_embedder(3, Opt.max_freq_dir, Opt.num_freqs_dir,
                           mapping=posenc)
    nspec = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos_pe.out_dim,
        input_ch_views=dir_pe.out_dim, use_viewdirs=True,
    )
    return nerf_module.JoinerSpec(pos_pe=pos_pe, dir_pe=dir_pe, nerf=nspec)


def _setup(spec, r=8, s=16, seed=0):
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(seed), spec.nerf)
    rng = np.random.default_rng(seed)
    planes = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32) for _ in range(3)]
    d = rng.normal(size=(r, s, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    dir_planes = [jnp.asarray(d[..., a], jnp.float32) for a in range(3)]
    dirs = jnp.asarray(d[:, 0, :], jnp.float32)
    g_sig = jnp.asarray(rng.normal(size=(r, s)), jnp.float32)
    g_rgb = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32) for _ in range(3)]
    return params, planes, dir_planes, dirs, g_sig, g_rgb


def _loss_from(out, g_sig, g_rgb):
    sigma, rgb = out
    return jnp.sum(sigma * g_sig) + sum(
        jnp.sum(rgb[c] * g_rgb[c]) for c in range(3)
    )


def _assert_trees_close(a, b, rtol=2e-3, atol=2e-4, what=""):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for i, (x, y) in enumerate(zip(fa, fb)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=f"{what} leaf {i}",
        )


@pytest.mark.parametrize("posenc", ["posenc", "rotate"])
def test_grad_parity_per_sample(posenc):
    spec = _spec(posenc)
    params, planes, dir_planes, _, g_sig, g_rgb = _setup(spec)
    f = raymarch_vjp.make_mlp_vjp(
        spec, compute_dtype=jnp.float32, interpret=True
    )

    def loss_pallas(params, planes, dir_planes):
        return _loss_from(f(params, *planes, *dir_planes), g_sig, g_rgb)

    def loss_xla(params, planes, dir_planes):
        out = fused.mlp_planar(
            spec, params, planes, dir_planes, jnp.float32, dirs_per_ray=False
        )
        return _loss_from(out, g_sig, g_rgb)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, planes, dir_planes)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, planes, dir_planes)
    _assert_trees_close(gp[0], gx[0], what="params")
    _assert_trees_close(gp[1], gx[1], what="planes")
    _assert_trees_close(gp[2], gx[2], what="dir planes")


def test_grad_parity_per_sample_recurrence_pe():
    """Kernel and oracle under the SAME recurrence-PE spec (the TPU
    production config) agree to the usual kernel tolerance."""
    spec = _spec("rotate")
    spec = spec.replace(
        pos_pe=spec.pos_pe.replace(recurrence=True),
        dir_pe=spec.dir_pe.replace(recurrence=True),
    )
    assert spec.pos_pe.recurrence and spec.dir_pe.recurrence
    params, planes, dir_planes, _, g_sig, g_rgb = _setup(spec)
    f = raymarch_vjp.make_mlp_vjp(
        spec, compute_dtype=jnp.float32, interpret=True
    )

    def loss_pallas(params, planes, dir_planes):
        return _loss_from(f(params, *planes, *dir_planes), g_sig, g_rgb)

    def loss_xla(params, planes, dir_planes):
        out = fused.mlp_planar(
            spec, params, planes, dir_planes, jnp.float32, dirs_per_ray=False
        )
        return _loss_from(out, g_sig, g_rgb)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, planes, dir_planes)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, planes, dir_planes)
    _assert_trees_close(gp[0], gx[0], what="params")
    _assert_trees_close(gp[1], gx[1], what="planes")
    _assert_trees_close(gp[2], gx[2], what="dir planes")


def test_grad_parity_per_ray():
    spec = _spec("posenc")
    params, planes, _, dirs, g_sig, g_rgb = _setup(spec)
    f = raymarch_vjp.make_mlp_vjp(
        spec, compute_dtype=jnp.float32, per_sample=False, interpret=True
    )

    def loss_pallas(params, planes, dirs):
        dirp = raymarch.dir_projection(spec, params, dirs, jnp.float32)
        return _loss_from(f(params, *planes, dirp), g_sig, g_rgb)

    def loss_xla(params, planes, dirs):
        d_ax = [dirs[:, a] for a in range(3)]
        out = fused.mlp_planar(
            spec, params, planes, d_ax, jnp.float32, dirs_per_ray=True
        )
        return _loss_from(out, g_sig, g_rgb)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, planes, dirs)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, planes, dirs)
    _assert_trees_close(gp[0], gx[0], what="params")
    _assert_trees_close(gp[1], gx[1], what="planes")
    _assert_trees_close(gp[2], gx[2], what="dirs")


def test_forward_matches_nonvjp():
    spec = _spec("rotate")
    params, planes, dir_planes, _, _, _ = _setup(spec)
    f = raymarch_vjp.make_mlp_vjp(
        spec, compute_dtype=jnp.float32, interpret=True
    )
    sig_a, rgb_a = f(params, *planes, *dir_planes)
    sig_b, rgb_b = raymarch.nerf_mlp_pallas(
        spec, params, *planes, None, jnp.float32, interpret=True,
        dir_planes=tuple(dir_planes),
    )
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b))
    for c in range(3):
        np.testing.assert_allclose(np.asarray(rgb_a[c]), np.asarray(rgb_b[c]))


def test_offset_net_vjp_grad_parity():
    """No-viewdirs (offset net) Pallas pair vs fused.offset_net_planar."""
    from neuman_tpu.models.embedder import make_embedder

    pos_pe = make_embedder(4, 9, 10, mapping="posenc")
    nspec = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos_pe.out_dim, input_ch_views=0,
        output_ch=3, use_viewdirs=False, scale_type="linear",
    )
    spec = nerf_module.OffsetNetSpec(pos_pe=pos_pe, nerf=nspec)
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), nspec)
    rng = np.random.default_rng(0)
    r, s = 8, 16
    planes = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32)
              for _ in range(4)]
    g = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32) for _ in range(3)]
    scale = 0.37
    f = raymarch_vjp.make_offset_mlp_vjp(
        spec, compute_dtype=jnp.float32, interpret=True
    )

    def loss_pallas(params, planes):
        out = f(params, *planes)
        return sum(jnp.sum(out[c] * scale * g[c]) for c in range(3))

    def loss_xla(params, planes):
        out = fused.offset_net_planar(spec, params, planes, scale, jnp.float32)
        return sum(jnp.sum(out[c] * g[c]) for c in range(3))

    gp = jax.grad(loss_pallas, argnums=(0, 1))(params, planes)
    gx = jax.grad(loss_xla, argnums=(0, 1))(params, planes)
    _assert_trees_close(gp[0], gx[0], what="offset params")
    _assert_trees_close(gp[1], gx[1], what="offset planes")
    # forward values too
    out_p = f(params, *planes)
    out_x = fused.offset_net_planar(spec, params, planes, 1.0, jnp.float32)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(out_p[c]), np.asarray(out_x[c]), rtol=1e-5, atol=1e-6
        )


def test_pick_bwd_tile_prefers_padding_over_budget_blowout():
    """When no divisor-legal tile fits the lane budget, the sample-padding
    fallback must win over an over-budget tile (the over-budget path fails
    at Mosaic compile time against the ~16 MB scoped-VMEM limit)."""
    # s=384: every rt in 1..8 gives rt*384 % 128 == 0 but rt*384 > 512
    # for rt >= 2; rt=1 gives 384 <= 512 -> legal, no pad.
    assert raymarch_vjp._pick_bwd_tile(8, 384, 8, 512) == (1, 0)
    # s=640: smallest legal divisor tile is 1*640 > 512; padded sp=640
    # doesn't fit either -> falls back to the smaller of the two minima
    # (both over budget): valid[-1]*s = 640 == sp -> (1, 0).
    rt, pad = raymarch_vjp._pick_bwd_tile(8, 640, 8, 512)
    assert (rt * (640 + pad)) == 640
    # s=200 (not 128-aligned per ray): only padding makes a legal tile;
    # sp=256, rt=2 fits 512 exactly.
    assert raymarch_vjp._pick_bwd_tile(8, 200, 8, 512) == (2, 56)
    # huge S where even one padded ray exceeds the budget: prefer the
    # smaller lane count, never an arbitrary over-budget divisor tile.
    rt, pad = raymarch_vjp._pick_bwd_tile(4, 2000, 8, 512)
    assert rt == 1 and (2000 + pad) % 128 == 0


def test_pick_tile_tape_caps_double_buffered_block():
    """The tape-emitting forwards must cap TN so the double-buffered
    [tape_rows, TN] output block stays within ~4 MB per buffer (measured
    on v5e: TN=1024 f32 tape_rows=2048 hit 16.04M/16.79M against the
    16 MB scoped-VMEM limit — raymarch.py:265 / raymarch_vjp.py:595)."""
    # f32, depth*W=2048: max_tn = 4MB / 8KB = 512 -> rt=4 at s=128
    assert raymarch.pick_tile_tape(4096, 128, 8, 2048, 4) == 4
    # bf16 halves the row bytes -> tn up to 1024 -> rt=8 again
    assert raymarch.pick_tile_tape(4096, 128, 8, 2048, 2) == 8
    # the exact failing v5e shapes must now map under the cap
    assert raymarch.pick_tile_tape(4096, 128, 8, 2048, 4) * 128 <= 512
    # no divisor-legal capped tile (one ray already exceeds the cap):
    # caller must fall back to the tapeless path
    assert raymarch.pick_tile_tape(8, 1024, 8, 2048, 4) is None


@pytest.mark.parametrize("per_sample", [True, False])
def test_tape_mode_matches_recompute(per_sample):
    """tape_mode="hbm" must be BIT-identical to "recompute": the tape
    stores the same compute-dtype post-relu activations the backward
    kernel would re-derive, so every contraction sees identical inputs."""
    spec = _spec("rotate")
    params, planes, dir_planes, dirs, g_sig, g_rgb = _setup(spec)
    kw = dict(compute_dtype=jnp.float32, per_sample=per_sample,
              interpret=True)
    f_rec = raymarch_vjp.make_mlp_vjp(spec, tape_mode="recompute", **kw)
    f_hbm = raymarch_vjp.make_mlp_vjp(spec, tape_mode="hbm", **kw)

    def make_loss(f):
        if per_sample:
            return lambda p, pl_, d: _loss_from(f(p, *pl_, *d), g_sig, g_rgb)

        def loss(p, pl_, d):
            dirp = raymarch.dir_projection(spec, p, d, jnp.float32)
            return _loss_from(f(p, *pl_, dirp), g_sig, g_rgb)

        return loss

    d_arg = dir_planes if per_sample else dirs
    g_rec = jax.grad(make_loss(f_rec), argnums=(0, 1, 2))(
        params, planes, d_arg
    )
    g_hbm = jax.grad(make_loss(f_hbm), argnums=(0, 1, 2))(
        params, planes, d_arg
    )
    _assert_trees_close(g_rec, g_hbm, rtol=0.0, atol=0.0, what="tape-mode")


def test_tape_mode_padded_shape_falls_back():
    """A sample count that forces sample-axis padding must silently fall
    back to the recompute backward (the flat tape layout would misalign)
    and still produce correct gradients."""
    spec = _spec("posenc")
    params, planes, dir_planes, _, g_sig, g_rgb = _setup(spec, r=4, s=20)
    f_hbm = raymarch_vjp.make_mlp_vjp(
        spec, compute_dtype=jnp.float32, interpret=True, tape_mode="hbm"
    )

    def loss_pallas(p, pl_, d):
        return _loss_from(f_hbm(p, *pl_, *d), g_sig, g_rgb)

    def loss_xla(p, pl_, d):
        out = fused.mlp_planar(spec, p, pl_, d, jnp.float32,
                               dirs_per_ray=False)
        return _loss_from(out, g_sig, g_rgb)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, planes, dir_planes)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, planes, dir_planes)
    _assert_trees_close(gp[0], gx[0], what="params (padded tape fallback)")
    _assert_trees_close(gp[1], gx[1], what="planes (padded tape fallback)")


def test_emit_tape_contents():
    """The emitted tape rows are the post-relu trunk activations (checked
    against a plain recompute of the fwd math)."""
    spec = _spec("posenc")
    params, planes, dir_planes, _, _, _ = _setup(spec, r=4, s=32)
    out, tape = raymarch.nerf_mlp_pallas(
        spec, params, *planes, None, jnp.float32, interpret=True,
        dir_planes=tuple(dir_planes), emit_tape=True,
    )
    assert tape is not None
    r, s = planes[0].shape
    axes = jnp.stack([p.reshape(-1) for p in planes], axis=0)  # [3, N]
    pe = fused.pe_rows(spec.pos_pe, axes)
    h = pe
    width = spec.nerf.width
    for i, p in enumerate(params["pts_linears"]):
        h = jnp.maximum(p["w"].T @ h + p["b"][:, None], 0.0)
        np.testing.assert_allclose(
            np.asarray(tape[i * width : (i + 1) * width]), np.asarray(h),
            rtol=1e-5, atol=1e-5, err_msg=f"tape layer {i}",
        )
        if i in spec.nerf.skips:
            h = jnp.concatenate([pe, h], axis=0)


def test_offset_tape_mode_matches_recompute():
    """Offset-net HBM-tape backward is bit-identical to recompute."""
    from neuman_tpu.models.embedder import make_embedder

    pos_pe = make_embedder(4, 9, 10, mapping="posenc")
    nspec = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos_pe.out_dim, input_ch_views=0,
        output_ch=3, use_viewdirs=False, scale_type="linear",
    )
    spec = nerf_module.OffsetNetSpec(pos_pe=pos_pe, nerf=nspec)
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), nspec)
    rng = np.random.default_rng(0)
    r, s = 8, 16
    planes = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32)
              for _ in range(4)]
    g = [jnp.asarray(rng.normal(size=(r, s)), jnp.float32) for _ in range(3)]
    kw = dict(compute_dtype=jnp.float32, interpret=True)
    f_rec = raymarch_vjp.make_offset_mlp_vjp(spec, tape_mode="recompute", **kw)
    f_hbm = raymarch_vjp.make_offset_mlp_vjp(spec, tape_mode="hbm", **kw)

    def make_loss(f):
        return lambda p, pl_: sum(
            jnp.sum(f(p, *pl_)[c] * g[c]) for c in range(3)
        )

    g_rec = jax.grad(make_loss(f_rec), argnums=(0, 1))(params, planes)
    g_hbm = jax.grad(make_loss(f_hbm), argnums=(0, 1))(params, planes)
    _assert_trees_close(g_rec, g_hbm, rtol=0.0, atol=0.0,
                        what="offset tape-mode")
