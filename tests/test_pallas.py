"""Pallas fused kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.models import embedder as emb
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import fused
from neuman_tpu.ops.pallas import raymarch


def make_spec(mapping="posenc"):
    pos = emb.make_embedder(3, 9, 10, True, True, mapping=mapping)
    dirs = emb.make_embedder(3, 3, 4, True, True, mapping=mapping)
    nerf = nerf_module.NeRFSpec(
        depth=4, width=64, input_ch=pos.out_dim, input_ch_views=dirs.out_dim,
        skips=(2,), use_viewdirs=True,
    )
    return nerf_module.JoinerSpec(pos_pe=pos, dir_pe=dirs, nerf=nerf)


def test_pallas_mlp_matches_planar():
    spec = make_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    r, s = 8, 16
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (r, s, 3)) - 0.5
    d = jax.random.normal(jax.random.fold_in(key, 1), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    sigma_ref, rgb_ref = fused.mlp_planar(
        spec, params, [pts[..., a] for a in range(3)],
        [d[:, a] for a in range(3)], compute_dtype=jnp.float32,
    )
    dirp = raymarch.dir_projection(spec, params, d, compute_dtype=jnp.float32)
    sigma, rgb = raymarch.nerf_mlp_pallas(
        spec, params, pts[..., 0], pts[..., 1], pts[..., 2], dirp,
        compute_dtype=jnp.float32, rays_per_tile=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), atol=1e-4)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(rgb[c]), np.asarray(rgb_ref[c]), atol=1e-4
        )


def test_pallas_render_chunk_matches_fused():
    spec = make_spec()
    kc, kf = jax.random.split(jax.random.PRNGKey(3))
    coarse = nerf_module.init_nerf_params(kc, spec.nerf)
    fine = nerf_module.init_nerf_params(kf, spec.nerf)
    r, s, i = 8, 16, 16
    origins = jnp.zeros((r, 3)).at[:, 2].set(-2.0)
    d = jax.random.normal(jax.random.PRNGKey(4), (r, 3)) * 0.2 + jnp.array([0.0, 0, 1.0])
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.full((r, 1), 0.5)
    far = jnp.full((r, 1), 4.0)

    chunk = raymarch.make_fused_render(spec, s, i, compute_dtype=jnp.float32,
                                       rays_per_tile=4)
    rgb_p, depth_p = chunk(coarse, fine, origins, dirs, near, far)
    rgb_x, depth_x = fused.fused_vanilla_render(
        spec, coarse, fine, origins, dirs, near, far, samples_per_ray=s,
        importance_samples_per_ray=i, compute_dtype_name="float32",
    )
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_x), atol=1e-3)


def test_pallas_mlp_per_sample_dirs():
    """Per-sample view-dir mode (canonical human net) matches mlp_planar."""
    spec = make_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(7), spec.nerf)
    r, s = 8, 16
    key = jax.random.PRNGKey(8)
    pts = jax.random.uniform(key, (r, s, 3)) - 0.5
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (r, s, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    sigma_ref, rgb_ref = fused.mlp_planar(
        spec, params, [pts[..., a] for a in range(3)],
        [dirs[..., a] for a in range(3)], compute_dtype=jnp.float32,
        dirs_per_ray=False,
    )
    sigma, rgb = raymarch.nerf_mlp_pallas(
        spec, params, pts[..., 0], pts[..., 1], pts[..., 2], None,
        compute_dtype=jnp.float32, rays_per_tile=4, interpret=True,
        dir_planes=(dirs[..., 0], dirs[..., 1], dirs[..., 2]),
    )
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), atol=1e-4)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(rgb[c]), np.asarray(rgb_ref[c]), atol=1e-4
        )
