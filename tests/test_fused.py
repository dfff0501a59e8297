"""Parity tests: planarized fused render path vs the reference formulation."""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import embedder as emb
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import fused, volume
from neuman_tpu.ops import rays as ray_ops


def make_spec(mapping="posenc", use_viewdirs=True):
    pos = emb.make_embedder(3, 9, 10, True, True, mapping=mapping)
    dirs = emb.make_embedder(3, 3, 4, True, True, mapping=mapping)
    nerf = nerf_module.NeRFSpec(
        depth=4, width=64, input_ch=pos.out_dim, input_ch_views=dirs.out_dim,
        skips=(2,), use_viewdirs=use_viewdirs,
    )
    return nerf_module.JoinerSpec(pos_pe=pos, dir_pe=dirs, nerf=nerf)


def random_rays(r=16, key=0):
    k = jax.random.PRNGKey(key)
    origins = jnp.zeros((r, 3)).at[:, 2].set(-2.0)
    d = jax.random.normal(k, (r, 3)) * 0.2 + jnp.array([0.0, 0, 1.0])
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.full((r, 1), 0.5)
    far = jnp.full((r, 1), 4.0)
    return origins, dirs, near, far


def test_pe_rows_match_embed():
    for mapping in ("posenc", "rotate"):
        spec = emb.make_embedder(3, 5, 6, True, True, mapping=mapping)
        x = jax.random.uniform(jax.random.PRNGKey(0), (7, 11, 3)) - 0.5
        ref = emb.embed(spec, x)  # [..., C]
        axes_cn = jnp.stack([x[..., a].reshape(-1) for a in range(3)], axis=0)
        got = fused.pe_rows(spec, axes_cn)  # [C, N]
        got = jnp.moveaxis(got, 0, -1).reshape(ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pe_recurrence_parity():
    """Double-angle-recurrence PE vs exact trig: values, rows, and the
    hand-derived VJP, both mappings; and the ladder guard (non-octave
    bands silently keep exact trig)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3.2, 3.2, (257, 3)).astype(np.float32))
    xr = x.T  # [3, N]
    for mapping in ("posenc", "rotate"):
        trig = emb.make_embedder(3, 9, 10, mapping=mapping)
        rec = emb.make_embedder(3, 9, 10, mapping=mapping, recurrence=True)
        assert rec.recurrence
        np.testing.assert_allclose(
            np.asarray(emb.embed(rec, x)), np.asarray(emb.embed(trig, x)),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(fused.pe_rows(rec, xr)),
            np.asarray(fused.pe_rows(trig, xr)), atol=1e-4,
        )
        d_pe = jnp.asarray(
            rng.normal(size=(trig.out_dim, x.shape[0])).astype(np.float32)
        )
        ref = fused.pe_rows_bwd(trig, xr, d_pe)
        got = fused.pe_rows_bwd(rec, xr, d_pe)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4 * scale
        )
    # 20 bands over 9 octaves: ratio != 2, recurrence must stay off
    assert not emb.make_embedder(3, 9, 20, recurrence=True).recurrence


def test_mlp_planar_recurrence_matches_trig_spec():
    """The full planar MLP under a recurrence-PE spec stays within the
    PE approximation error of the exact-trig spec (values and grads)."""
    spec = make_spec("rotate")
    rec_spec = spec.replace(
        pos_pe=spec.pos_pe.replace(recurrence=True),
        dir_pe=spec.dir_pe.replace(recurrence=True),
    )
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf)
    r, s = 8, 12
    pts = jax.random.uniform(jax.random.PRNGKey(2), (r, s, 3)) - 0.5
    d = jax.random.normal(jax.random.PRNGKey(3), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    planes = [pts[..., a] for a in range(3)]
    dirs = [d[:, a] for a in range(3)]

    def loss(sp, p):
        sigma, rgb = fused.mlp_planar(sp, p, planes, dirs, jnp.float32)
        return jnp.sum(sigma) + sum(jnp.sum(c) for c in rgb), (sigma, rgb)

    (l_t, (sig_t, _)), g_t = jax.value_and_grad(
        lambda p: loss(spec, p), has_aux=True
    )(params)
    (l_r, (sig_r, _)), g_r = jax.value_and_grad(
        lambda p: loss(rec_spec, p), has_aux=True
    )(params)
    np.testing.assert_allclose(np.asarray(sig_r), np.asarray(sig_t), atol=5e-3)
    ft = jax.tree_util.tree_leaves(g_t)
    fr = jax.tree_util.tree_leaves(g_r)
    for a, b in zip(fr, ft):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3 * scale
        )


def test_mlp_planar_matches_apply_joiner():
    for mapping in ("posenc", "rotate"):
        spec = make_spec(mapping)
        params = nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf)
        r, s = 8, 12
        pts = jax.random.uniform(jax.random.PRNGKey(2), (r, s, 3)) - 0.5
        d = jax.random.normal(jax.random.PRNGKey(3), (r, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        dirs = jnp.broadcast_to(d[:, None, :], (r, s, 3))

        ref = nerf_module.apply_joiner(spec, params, pts, dirs)
        sigma, rgb_c = fused.mlp_planar(
            spec, params, [pts[..., a] for a in range(3)],
            [d[:, a] for a in range(3)], compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(sigma), np.asarray(ref[..., 3]), atol=2e-5
        )
        for c in range(3):
            np.testing.assert_allclose(
                np.asarray(rgb_c[c]), np.asarray(ref[..., c]), atol=2e-5
            )


def test_mlp_planar_per_sample_dirs():
    spec = make_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf)
    r, s = 4, 6
    pts = jax.random.uniform(jax.random.PRNGKey(2), (r, s, 3)) - 0.5
    dirs = jax.random.normal(jax.random.PRNGKey(3), (r, s, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ref = nerf_module.apply_joiner(spec, params, pts, dirs)
    sigma, rgb_c = fused.mlp_planar(
        spec, params, [pts[..., a] for a in range(3)],
        [dirs[..., a] for a in range(3)], compute_dtype=jnp.float32,
        dirs_per_ray=False,
    )
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref[..., 3]), atol=2e-5)


def test_integrate_planar_matches_raw2outputs():
    rng = np.random.default_rng(0)
    r, s = 9, 17
    raw = jnp.asarray(rng.normal(size=(r, s, 4)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(1, 4, (r, s)).astype(np.float32)), axis=-1)
    d = jnp.asarray(rng.normal(size=(r, 3)).astype(np.float32))
    ref = volume.raw2outputs(raw, z, d, white_bkg=True)
    got = fused.integrate_planar(
        raw[..., 3], [raw[..., c] for c in range(3)], z,
        jnp.linalg.norm(d, axis=-1), white_bkg=True,
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_vanilla_render_matches_reference_path():
    spec = make_spec()
    kc, kf = jax.random.split(jax.random.PRNGKey(5))
    coarse = nerf_module.init_nerf_params(kc, spec.nerf)
    fine = nerf_module.init_nerf_params(kf, spec.nerf)
    origins, dirs, near, far = random_rays(16)
    s_c, s_i = 16, 16

    rgb_f, depth_f = fused.fused_vanilla_render(
        spec, coarse, fine, origins, dirs, near, far,
        samples_per_ray=s_c, importance_samples_per_ray=s_i,
        compute_dtype_name="float32",
    )

    # reference formulation
    pts, sdirs, z = ray_ops.ray_to_samples(origins, dirs, near, far, s_c)
    out = nerf_module.apply_joiner(spec, coarse, pts, sdirs)
    rgb, _, _, w, _ = volume.raw2outputs(out, z, sdirs[:, 0, :])
    f_pts, f_dirs, f_z = ray_ops.ray_to_importance_samples(
        origins, dirs, z, w, s_i, det=True
    )
    f_out = nerf_module.apply_joiner(spec, fine, f_pts, f_dirs)
    rgb_ref, _, _, _, depth_ref = volume.raw2outputs(f_out, f_z, f_dirs[:, 0, :])

    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_f), np.asarray(depth_ref), atol=1e-3)


def test_merge_two_sorted_matches_argsort():
    """Gather-free rank merge == stable argsort+take_along_axis, with ties."""
    rng = np.random.default_rng(0)
    r, s1, s2 = 16, 13, 9
    za = np.sort(rng.integers(0, 12, (r, s1)).astype(np.float32), axis=-1)
    zb = np.sort(rng.integers(0, 12, (r, s2)).astype(np.float32), axis=-1)
    ca = rng.normal(size=(r, s1)).astype(np.float32)
    cb = rng.normal(size=(r, s2)).astype(np.float32)
    z, (c,) = fused.merge_two_sorted_planar(
        jnp.asarray(za), jnp.asarray(zb), [jnp.asarray(ca)], [jnp.asarray(cb)]
    )
    zc = np.concatenate([za, zb], axis=-1)
    cc = np.concatenate([ca, cb], axis=-1)
    order = np.argsort(zc, axis=-1, kind="stable")
    np.testing.assert_allclose(np.asarray(z), np.take_along_axis(zc, order, -1))
    np.testing.assert_allclose(np.asarray(c), np.take_along_axis(cc, order, -1))


def test_sort_merge_planar_three_way():
    """K-way merge (multi-person path) equals global stable argsort."""
    rng = np.random.default_rng(1)
    r = 8
    sizes = (7, 5, 11)
    zs = [np.sort(rng.uniform(0, 4, (r, s)).astype(np.float32), -1) for s in sizes]
    sgs = [rng.normal(size=(r, s)).astype(np.float32) for s in sizes]
    rgbs = [[rng.normal(size=(r, s)).astype(np.float32) for _ in range(3)]
            for s in sizes]
    z, sg, rgb = fused.sort_merge_planar(
        [jnp.asarray(a) for a in zs],
        [jnp.asarray(a) for a in sgs],
        [[jnp.asarray(c) for c in rr] for rr in rgbs],
    )
    zc = np.concatenate(zs, -1)
    order = np.argsort(zc, axis=-1, kind="stable")
    np.testing.assert_allclose(np.asarray(z), np.take_along_axis(zc, order, -1),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sg),
        np.take_along_axis(np.concatenate(sgs, -1), order, -1), rtol=1e-6)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(rgb[c]),
            np.take_along_axis(
                np.concatenate([rr[c] for rr in rgbs], -1), order, -1),
            rtol=1e-6)


def test_merge_sorted_pair_bitonic():
    """The log-P bitonic merge equals a full sort of the concatenation,
    including duplicates and non-power-of-2 totals."""
    rng = np.random.default_rng(3)
    for s1, s2 in [(256, 128), (7, 5), (128, 128), (1, 9), (16, 1)]:
        a = np.sort(rng.integers(0, 8, size=(13, s1)).astype(np.float32), -1)
        b = np.sort(rng.integers(0, 8, size=(13, s2)).astype(np.float32), -1)
        got = np.asarray(
            fused.merge_sorted_pair_bitonic(jnp.asarray(a), jnp.asarray(b))
        )
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        np.testing.assert_array_equal(got, want, err_msg=f"{s1}+{s2}")


def test_importance_z_merge_matches_sort():
    """importance_z's det path (bitonic merge) == sort-of-concat oracle."""
    rng = np.random.default_rng(4)
    r, s, i = 9, 32, 16
    z = np.sort(rng.uniform(1.0, 3.0, size=(r, s)).astype(np.float32), -1)
    w = rng.uniform(size=(r, s)).astype(np.float32)
    got = np.asarray(fused.importance_z(jnp.asarray(z), jnp.asarray(w), i))
    z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
    z_samp = np.asarray(
        ray_ops.sample_pdf(jnp.asarray(z_mid), jnp.asarray(w[..., 1:-1]), i,
                           det=True)
    )
    want = np.sort(np.concatenate([z, z_samp], axis=-1), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=0)
