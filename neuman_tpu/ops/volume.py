"""Volume rendering integration (pure JAX).

`raw2outputs` — alpha compositing of raw (rgb, sigma) samples along rays,
matching the reference utils/render_utils.py:69-105 exactly: distances from
consecutive z deltas (last = 1e10) scaled by |ray_dir|, alpha =
1 - exp(-relu(sigma) * dist), weights via exclusive cumprod of transmittance,
white-background compositing.

Also `sort_and_merge_samples` — the z-sort merge of background + human sample
sets before a single integration pass (ref: render_utils.py:330-343,
human_nerf_trainer.py:415-422), expressed with take_along_axis gathers.
"""

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, rays_d, raw_noise_std=0.0, white_bkg=True, key=None):
    """raw: [R, S, 4]; z_vals: [R, S]; rays_d: [R, 3].

    Returns (rgb_map [R, 3], disp_map [R], acc_map [R], weights [R, S],
    depth_map [R]).
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
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
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)

    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map), depth_map / acc_map
    )

    if white_bkg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map


def sort_and_merge_samples(z_vals_list, raw_list):
    """Concatenate per-source samples and z-sort along each ray.

    z_vals_list: sequence of [R, S_i]; raw_list: sequence of [R, S_i, C].
    Returns (z_sorted [R, sum(S_i)], raw_sorted [R, sum(S_i), C]).
    """
    z = jnp.concatenate(z_vals_list, axis=-1)
    raw = jnp.concatenate(raw_list, axis=1)
    order = jnp.argsort(z, axis=-1)
    z_sorted = jnp.take_along_axis(z, order, axis=-1)
    raw_sorted = jnp.take_along_axis(raw, order[..., None], axis=1)
    return z_sorted, raw_sorted
