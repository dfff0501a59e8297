"""NeRF core tests: embedders, MLP, sampling, volume integration."""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import embedder as emb
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import rays as ray_ops
from neuman_tpu.ops import volume


# ---------------- embedder ----------------


def test_posenc_shape_and_layout():
    spec = emb.make_embedder(3, 9, 10, True, True, min_freq=0, mapping="posenc")
    assert spec.out_dim == 3 + 2 * 10 * 3  # 63
    x = jnp.array([[0.5, -0.2, 0.3]])
    out = emb.embed(spec, x)
    assert out.shape == (1, 63)
    # layout: [x, sin(x*1), cos(x*1), sin(x*2), cos(x*2), ...]
    np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x[0]) * 1.0), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x[0]) * 1.0), atol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(np.asarray(x[0]) * 2.0), atol=1e-6)


def test_posenc_dir_dims():
    spec = emb.make_embedder(3, 3, 4, True, True, mapping="posenc")
    assert spec.out_dim == 3 + 2 * 4 * 3  # 27


def test_rotate_embedding():
    spec = emb.make_embedder(3, 9, 10, True, True, min_freq=0, mapping="rotate")
    assert spec.out_dim == 10 * 2 * 3 + 3  # 63
    x = jnp.array([[0.5, -0.2, 0.3]])
    out = emb.embed(spec, x)
    assert out.shape == (1, 63)
    np.testing.assert_allclose(out[0, :3], x[0], atol=1e-6)
    # bvals rows are rotated scaled basis vectors: norms follow 2^linspace
    bvals = np.array(spec.bvals).reshape(-1, 3)
    freqs = 2.0 ** np.linspace(0, 9, 10)
    expected_norms = np.repeat(freqs, 3)
    np.testing.assert_allclose(np.linalg.norm(bvals, axis=1), expected_norms, rtol=1e-6)


# ---------------- MLP ----------------


def _toy_spec(use_viewdirs=True):
    pos = emb.make_embedder(3, 9, 10, True, True)
    dirs = emb.make_embedder(3, 3, 4, True, True)
    nerf = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos.out_dim, input_ch_views=dirs.out_dim,
        use_viewdirs=use_viewdirs,
    )
    return nerf_module.JoinerSpec(pos_pe=pos, dir_pe=dirs, nerf=nerf)


def test_nerf_param_shapes():
    spec = _toy_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    assert len(params["pts_linears"]) == 8
    assert params["pts_linears"][0]["w"].shape == (63, 256)
    # skip concat after layer 4 -> layer 5 takes width+input_ch
    assert params["pts_linears"][5]["w"].shape == (256 + 63, 256)
    assert params["pts_linears"][4]["w"].shape == (256, 256)
    assert params["views_linears"][0]["w"].shape == (27 + 256, 128)
    assert params["alpha_linear"]["w"].shape == (256, 1)
    assert params["rgb_linear"]["w"].shape == (128, 3)


def test_joiner_forward():
    spec = _toy_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    pts = jnp.ones((4, 16, 3)) * 0.1
    dirs = jnp.ones((4, 16, 3)) / np.sqrt(3)
    out = nerf_module.apply_joiner(spec, params, pts, dirs)
    assert out.shape == (4, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_nerf_no_viewdirs():
    spec = _toy_spec(use_viewdirs=False)
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    out = nerf_module.apply_joiner(spec, params, jnp.ones((2, 3)) * 0.1)
    assert out.shape == (2, 4)


def test_offset_net_scale_modes():
    class Opt:
        raw_pos_dim = 3
        pos_max_freq = 9
        pos_N_freqs = 10
        pos_min_freq = 0
        log_sampling = True
        include_input = True
        nerf_depth = 8
        nerf_width = 256
        offset_scale_type = "linear"

    spec = nerf_module.build_offset_net_spec(Opt())
    assert spec.nerf.input_ch == 4 + 2 * 10 * 4  # 84
    assert spec.nerf.output_ch == 3
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf)
    x = jnp.ones((5, 4)) * 0.2
    out0 = nerf_module.apply_offset_net(spec, params, x, scale=0.0)
    out1 = nerf_module.apply_offset_net(spec, params, x, scale=1.0)
    np.testing.assert_allclose(np.asarray(out0), 0.0, atol=1e-7)
    assert np.abs(np.asarray(out1)).max() > 0


def test_bfloat16_compute_close_to_fp32():
    spec = _toy_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    pts = jax.random.uniform(jax.random.PRNGKey(2), (8, 4, 3)) - 0.5
    dirs = jnp.ones((8, 4, 3)) / np.sqrt(3)
    out32 = nerf_module.apply_joiner(spec, params, pts, dirs)
    out16 = nerf_module.apply_joiner(
        spec, params, pts, dirs, compute_dtype=jnp.bfloat16
    )
    assert np.abs(np.asarray(out32) - np.asarray(out16)).max() < 0.15


# ---------------- rays ----------------


def test_pixels_to_rays_matches_host_reference(synthetic_scene_dir, smpl_data_root):
    from neuman_tpu.data_io.neuman import NeuManReader
    from neuman_tpu.geometry import pcd

    scene = NeuManReader.read_scene(synthetic_scene_dir, smpl_type="optimized")
    cap = scene.captures[0]
    xy = np.array([[3.0, 4.0], [10.0, 20.0], [39.0, 29.0]])
    origins, dirs = ray_ops.pixels_to_rays(
        jnp.asarray(xy), jnp.asarray(cap.intrinsic_matrix),
        jnp.asarray(cap.cam_pose.camera_to_world),
    )
    # host-side oracle: unproject at depth 1, direction to camera center
    z = np.ones((xy.shape[0], 1))
    pts3d = pcd.pcd_2d_to_pcd_3d(
        xy, z, cap.intrinsic_matrix, cam2world=cap.cam_pose.camera_to_world
    )
    center = cap.cam_pose.camera_center_in_world
    expected_dirs = pts3d - center
    expected_dirs /= np.linalg.norm(expected_dirs, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(dirs), expected_dirs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(origins), np.stack([center] * 3), atol=1e-6)


def test_ray_to_samples_deterministic():
    origin = jnp.zeros((4, 3))
    direction = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    near = jnp.ones((4, 1)) * 2.0
    far = jnp.ones((4, 1)) * 6.0
    pts, dirs, z = ray_ops.ray_to_samples(origin, direction, near, far, 5)
    np.testing.assert_allclose(np.asarray(z[0]), [2, 3, 4, 5, 6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [2, 3, 4, 5, 6], atol=1e-6)
    assert dirs.shape == (4, 5, 3)


def test_ray_to_samples_perturb_bounds():
    origin = jnp.zeros((16, 3))
    direction = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (16, 1))
    near = jnp.ones((16, 1)) * 1.0
    far = jnp.ones((16, 1)) * 2.0
    _, _, z = ray_ops.ray_to_samples(
        origin, direction, near, far, 32, key=jax.random.PRNGKey(0), perturb=1.0
    )
    z = np.asarray(z)
    assert (np.diff(z, axis=-1) > 0).all()  # still sorted
    assert z.min() >= 1.0 - 1e-5 and z.max() <= 2.0 + 1e-5


def test_sample_pdf_concentrates_on_high_weight_bins():
    bins = jnp.linspace(0, 1, 9)[None].repeat(2, axis=0)  # [2, 9]
    w = jnp.zeros((2, 8)).at[:, 6].set(100.0)  # mass near bin 6
    samples = ray_ops.sample_pdf(bins, w, 100, det=True)
    s = np.asarray(samples)
    assert ((s > 0.7) & (s < 0.95)).mean() > 0.9


def test_sample_pdf_uniform_weights_cover_range():
    bins = jnp.linspace(0, 1, 9)[None]
    w = jnp.ones((1, 8))
    s = np.asarray(ray_ops.sample_pdf(bins, w, 50, det=True))
    assert s.min() < 0.05 and s.max() > 0.95


def test_importance_samples_sorted_and_merged():
    origin = jnp.zeros((3, 3))
    direction = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    z_vals = jnp.tile(jnp.linspace(1.0, 2.0, 8)[None], (3, 1))
    weights = jnp.ones((3, 8))
    pts, dirs, z = ray_ops.ray_to_importance_samples(
        origin, direction, z_vals, weights, 16
    )
    assert z.shape == (3, 24)
    assert (np.diff(np.asarray(z), axis=-1) >= 0).all()
    assert pts.shape == (3, 24, 3)


def test_geometry_guided_near_far():
    verts = jnp.array([[0.0, 0.0, 5.0]])
    origin = jnp.zeros((2, 3))
    # ray 0 hits the vertex sphere, ray 1 points away
    direction = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    near, far = ray_ops.geometry_guided_near_far(origin, direction, verts, 0.5)
    near, far = np.asarray(near), np.asarray(far)
    assert np.isclose(near[0], 4.5, atol=1e-5)
    assert np.isclose(far[0], 5.5, atol=1e-5)
    assert near[1] >= far[1]  # miss


def test_geometry_guided_near_far_matches_naive():
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    origin = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32) + [0, 0, -5])
    d = rng.normal(size=(7, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    direction = jnp.asarray(d)
    near, far = ray_ops.geometry_guided_near_far(origin, direction, verts, 0.8)

    # naive per-pair computation
    ov = np.asarray(verts)[None] - np.asarray(origin)[:, None]
    z0 = np.einsum("rvk,rk->rv", ov, d)
    dz = np.sqrt(0.8**2 - (np.linalg.norm(ov, axis=2) ** 2 - z0**2))
    exp_near = np.nan_to_num(z0 - dz, nan=np.inf).min(axis=1)
    exp_far = np.nan_to_num(z0 + dz, nan=-np.inf).max(axis=1)
    np.testing.assert_allclose(np.asarray(near), exp_near, atol=2e-3)
    np.testing.assert_allclose(np.asarray(far), exp_far, atol=2e-3)


# ---------------- volume ----------------


def test_raw2outputs_opaque_sample():
    # one fully opaque sample -> rgb = sigmoid(rgb_raw), depth = its z
    raw = jnp.zeros((1, 3, 4)).at[0, 1, 3].set(1e8).at[0, 1, :3].set(2.0)
    z = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    rgb, disp, acc, w, depth = volume.raw2outputs(raw, z, d, white_bkg=False)
    np.testing.assert_allclose(np.asarray(acc[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rgb[0]), [1 / (1 + np.e**-2)] * 3, atol=1e-5
    )


def test_raw2outputs_empty_ray_white_bkg():
    raw = jnp.full((1, 3, 4), -100.0)  # sigma relu -> 0
    z = jnp.array([[1.0, 2.0, 3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    rgb, _, acc, _, _ = volume.raw2outputs(raw, z, d, white_bkg=True)
    np.testing.assert_allclose(np.asarray(acc[0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb[0]), [1, 1, 1], atol=1e-6)


def test_raw2outputs_weights_sum_le_one():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.normal(size=(10, 32, 4)).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.uniform(1, 5, size=(10, 32)).astype(np.float32)), axis=-1)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10, 1))
    _, _, acc, w, _ = volume.raw2outputs(raw, z, d)
    assert (np.asarray(acc) <= 1.0 + 1e-5).all()
    assert (np.asarray(w) >= 0).all()


def test_raw2outputs_dist_scaling_by_dir_norm():
    raw = jnp.zeros((2, 2, 4)).at[:, 0, 3].set(1.0)
    z = jnp.array([[1.0, 2.0], [1.0, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])  # second has |d|=2
    _, _, _, w, _ = volume.raw2outputs(raw, z, d, white_bkg=False)
    w = np.asarray(w)
    # alpha = 1-exp(-sigma*dist*|d|): bigger |d| -> bigger alpha
    assert w[1, 0] > w[0, 0]


def test_sort_and_merge_samples():
    z1 = jnp.array([[1.0, 3.0]])
    z2 = jnp.array([[2.0, 4.0]])
    r1 = jnp.array([[[1.0, 0, 0, 0], [3.0, 0, 0, 0]]])
    r2 = jnp.array([[[2.0, 0, 0, 0], [4.0, 0, 0, 0]]])
    z, r = volume.sort_and_merge_samples([z1, z2], [r1, r2])
    np.testing.assert_allclose(np.asarray(z[0]), [1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(r[0, :, 0]), [1, 2, 3, 4])


def test_sample_pdf_gather_free_matches_searchsorted():
    """The gather-free masked-reduction inverse CDF equals the classic
    searchsorted + take_along_axis formulation (which it replaced for TPU
    speed: value-at-sorted-index == masked max/min on monotone arrays)."""
    import jax

    def ref_pdf(bins, weights, n, key=None, det=False):
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        if det:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n), cdf.shape[:-1] + (n,)
            )
        else:
            u = jax.random.uniform(key, cdf.shape[:-1] + (n,))
        inds = jnp.sum(
            (u[..., :, None] >= cdf[..., None, :]).astype(jnp.float32), axis=-1
        ).astype(jnp.int32)
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(cdf.shape[-1] - 1, inds)
        cb = jnp.take_along_axis(cdf, below, -1)
        ca = jnp.take_along_axis(cdf, above, -1)
        bb = jnp.take_along_axis(bins, below, -1)
        ba = jnp.take_along_axis(bins, above, -1)
        denom = ca - cb
        denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
        return bb + (u - cb) / denom * (ba - bb)

    rng = np.random.default_rng(0)
    R, B, Q = 32, 33, 17
    bins = jnp.asarray(np.sort(rng.uniform(0.5, 4.0, (R, B)), -1), jnp.float32)
    w = jnp.asarray(
        rng.uniform(0, 1, (R, B - 1)) * (rng.uniform(0, 1, (R, B - 1)) > 0.3),
        jnp.float32,
    )
    for det in (True, False):
        key = jax.random.PRNGKey(7)
        a = ray_ops.sample_pdf(bins, w, Q, key=key, det=det)
        b = ref_pdf(bins, w, Q, key=key, det=det)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
