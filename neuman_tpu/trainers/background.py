"""Background-scene NeRF trainer (stage 1).

Loss/semantics parity with the reference NeRFTrainer
(trainers/vanilla_nerf_trainer.py:20-319):
- coarse + fine MSE RGB losses;
- empty-space penalty: density before `margin * depth` pushed to zero via
  tanh(relu(sigma)) under mse/l1, weight linearly annealed to 0 over 60k
  iters (vanilla_nerf_trainer.py:66-89, 246-247);
- exponential LR decay 0.1 ** (it / (lrate_decay * 1000));
- dead-network restart when max sigma <= 0 (fresh init, step skipped);
- NaN-loss skip (step skipped);
- `delay_iters` gating of the empty-space term.

TPU-first structure: the whole train step — device-side batch sampling,
both MLP evaluations, losses, Adam update, anneals — is ONE jitted function
of a state pytree, so there is no host<->device traffic in the hot loop
(the reference pays a CPU DataLoader handoff per step, train.py:42-55).
Multi-chip: the step is shardable over the ray axis via
parallel.shard_train_step (grads all-reduce implicitly).
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax

from neuman_tpu.datasets import sampler
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.ops import rays as ray_ops
from neuman_tpu.ops import volume
from neuman_tpu.trainers import checkpoint as ckpt
from neuman_tpu.trainers import logging as tlog


def make_optimizer():
    """Adam(beta1=0.9, beta2=0.999); LR applied inside the step (per-group
    schedules multiply normalized updates)."""
    return optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-1.0))


def _masked_penalty(sigma, mask, loss_fn_name):
    val = jnp.tanh(jax.nn.relu(sigma))
    denom = jnp.maximum(mask.sum(), 1.0)
    if loss_fn_name == "mse":
        return (mask * val**2).sum() / denom
    return (mask * jnp.abs(val)).sum() / denom


def bkg_loss_fn(
    params, spec, batch, opt, penalty_weight, keys,
):
    """Coarse+fine losses for one ray batch. Returns (total, aux).

    Planarized internals (ops/fused.py): stratified z, MLP on coordinate
    planes, planar integration — numerically identical to the
    apply_joiner/raw2outputs formulation (see test_trainers parity test).
    The NeRF-T ablation (time channel, 4-D PE) keeps the reference-shaped
    path.
    """
    from neuman_tpu.ops import fused

    k_perturb, k_noise_c, k_noise_f = keys
    use_time = opt.ablate_nerft
    r = batch["origin"].shape[0]
    origin, direction = batch["origin"], batch["direction"]
    compute_dtype = (
        jnp.bfloat16 if opt.compute_dtype == "bfloat16" else jnp.float32
    )

    z_vals = ray_ops.sample_z_vals(
        batch["near"], batch["far"], opt.samples_per_ray, key=k_perturb,
        perturb=opt.perturb,
    )
    depth = batch["depth"][:, None]

    # trainable-net application: custom-VJP Pallas pair when enabled
    # (both bkg nets TRAIN here, unlike the human stage's frozen branch)
    use_pallas = getattr(opt, "use_pallas", False) and not use_time
    if use_pallas:
        from neuman_tpu.ops.pallas import raymarch as _rm
        from neuman_tpu.ops.pallas import raymarch_vjp as _rv

        _f_ray = _rv.make_mlp_vjp(
            spec, compute_dtype, per_sample=False,
            tape_mode=getattr(opt, "mlp_tape", "recompute"),
        )

        def net_apply(prm, planes):
            dirp = _rm.dir_projection(spec, prm, direction, compute_dtype)
            return _f_ray(prm, planes[0], planes[1], planes[2], dirp)

    else:

        def net_apply(prm, planes):
            return fused.mlp_planar(spec, prm, planes, d_ax, compute_dtype)

    if use_time:
        t_c = jnp.broadcast_to(
            batch["viewf_list"][:, None], (r, opt.samples_per_ray, 1)
        )
        pts = origin[:, None, :] + direction[:, None, :] * z_vals[..., None]
        pts = jnp.concatenate([pts, t_c], axis=-1)
        dirs = jnp.broadcast_to(direction[:, None, :], (r, opt.samples_per_ray, 3))
        out = nerf_module.apply_joiner(spec, params["coarse"], pts, dirs)
        rgb, _, _, weights, _ = volume.raw2outputs(
            out, z_vals, direction, raw_noise_std=opt.raw_noise_std,
            white_bkg=opt.white_bkg, key=k_noise_c,
        )
        sigma_c = out[..., 3]
    else:
        o_ax = [origin[:, a] for a in range(3)]
        d_ax = [direction[:, a] for a in range(3)]
        dir_norm = jnp.linalg.norm(direction, axis=-1)
        planes = [o_ax[a][:, None] + d_ax[a][:, None] * z_vals for a in range(3)]
        sigma_c, rgb_cc = net_apply(params["coarse"], planes)
        rgb, _, _, weights, _ = fused.integrate_planar(
            sigma_c, rgb_cc, z_vals, dir_norm, white_bkg=opt.white_bkg,
            raw_noise_std=opt.raw_noise_std, key=k_noise_c,
        )
    coarse_rgb_loss = jnp.mean((rgb - batch["color"]) ** 2)
    closer = (z_vals < depth * opt.margin).astype(jnp.float32)
    coarse_empty = (
        _masked_penalty(sigma_c, closer, opt.empty_space_loss_fn)
        * penalty_weight
    )

    f_z = fused.importance_z(
        z_vals, weights, opt.importance_samples_per_ray, det=True
    )
    if use_time:
        t_f = jnp.broadcast_to(
            batch["viewf_list"][:, None], (r, f_z.shape[1], 1)
        )
        f_pts = origin[:, None, :] + direction[:, None, :] * f_z[..., None]
        f_pts = jnp.concatenate([f_pts, t_f], axis=-1)
        f_dirs = jnp.broadcast_to(direction[:, None, :], (r, f_z.shape[1], 3))
        f_out = nerf_module.apply_joiner(spec, params["fine"], f_pts, f_dirs)
        f_rgb, _, _, _, _ = volume.raw2outputs(
            f_out, f_z, direction, raw_noise_std=opt.raw_noise_std,
            white_bkg=opt.white_bkg, key=k_noise_f,
        )
        sigma_f = f_out[..., 3]
    else:
        planes = [o_ax[a][:, None] + d_ax[a][:, None] * f_z for a in range(3)]
        sigma_f, rgb_cf = net_apply(params["fine"], planes)
        f_rgb, _, _, _, _ = fused.integrate_planar(
            sigma_f, rgb_cf, f_z, dir_norm, white_bkg=opt.white_bkg,
            raw_noise_std=opt.raw_noise_std, key=k_noise_f,
        )
    fine_rgb_loss = jnp.mean((f_rgb - batch["color"]) ** 2)
    f_closer = (f_z < depth * opt.margin).astype(jnp.float32)
    fine_empty = (
        _masked_penalty(sigma_f, f_closer, opt.empty_space_loss_fn)
        * penalty_weight
    )

    aux = {
        "coarse_rgb_loss": coarse_rgb_loss,
        "coarse_empty_space_loss": coarse_empty,
        "fine_rgb_loss": fine_rgb_loss,
        "fine_empty_space_loss": fine_empty,
        "rgb_loss": coarse_rgb_loss + fine_rgb_loss,
        "empty_space_loss": coarse_empty + fine_empty,
        "max_sigma_coarse": sigma_c.max(),
        "max_sigma_fine": sigma_f.max(),
    }
    return coarse_rgb_loss, coarse_empty, fine_rgb_loss, fine_empty, aux


def make_bkg_train_step(spec, opt, arrays, train_view_ids, optimizer, mesh=None):
    """Build the jitted train step: state -> (state, metrics).

    With `mesh`, the sampled ray batch is sharding-constrained along its
    leading (ray) axis so the whole step partitions across the mesh's
    `data` axis (params replicated, grad all-reduce implicit).
    """

    train_view_ids = jnp.asarray(np.array(train_view_ids, np.int32))

    @partial(jax.jit, donate_argnums=0)
    def train_step(state):
        it = state["iteration"]
        rng, k_batch, k_perturb, k_nc, k_nf, k_reinit = jax.random.split(
            state["rng"], 6
        )
        batch = sampler.sample_background_batch(
            k_batch, arrays, train_view_ids, opt.rays_per_batch,
            use_fused_depth=opt.use_fused_depth,
        )
        if mesh is not None:
            from neuman_tpu.parallel.mesh import shard_leading_axis

            batch = shard_leading_axis(batch, mesh, opt.data_axis)
        it_f = it.astype(jnp.float32)
        penalty_weight = opt.penalize_empty_space * jnp.maximum(
            0.0, 1.0 - it_f / 60000.0
        )
        lr = opt.learning_rate * jnp.power(
            0.1, it_f / (opt.lrate_decay * 1000.0)
        )

        def loss_total(params):
            c_rgb, c_emp, f_rgb, f_emp, aux = bkg_loss_fn(
                params, spec, batch, opt, penalty_weight, (k_perturb, k_nc, k_nf)
            )
            rgb_loss = c_rgb + f_rgb
            empty_loss = c_emp + f_emp
            total = jnp.where(
                it >= opt.delay_iters, rgb_loss + empty_loss, rgb_loss
            )
            aux["total_loss"] = total
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_total, has_aux=True)(
            state["params"]
        )

        dead = (aux["max_sigma_coarse"] <= 0.0) | (aux["max_sigma_fine"] <= 0.0)
        bad = dead | jnp.isnan(total)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(bad, jnp.zeros_like(g), g), grads
        )
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(bad, jnp.zeros_like(u), u * lr), updates
        )
        params = optax.apply_updates(state["params"], updates)

        # dead-network restart (ref: vanilla_nerf_trainer.py:90-95)
        kc, kf = jax.random.split(k_reinit)
        fresh = {
            "coarse": nerf_module.init_nerf_params(kc, spec.nerf),
            "fine": nerf_module.init_nerf_params(kf, spec.nerf),
        }
        params = jax.tree_util.tree_map(
            lambda fr, pa: jnp.where(dead, fr, pa), fresh, params
        )

        new_state = {
            "params": params,
            "opt_state": opt_state,
            "iteration": it + 1,
            "rng": rng,
        }
        metrics = {k: v for k, v in aux.items() if "sigma" not in k}
        metrics.update({"lr": lr, "penalize_empty_space": penalty_weight,
                        "dead_restart": dead.astype(jnp.float32)})
        return new_state, metrics

    return train_step


class NeRFTrainer:
    """Host-side driver: epochs, validation cadence, checkpoints, metrics
    (structure parity with trainers/base_trainer.py + vanilla_nerf_trainer)."""

    def __init__(self, opt, spec, params, scene, train_views, val_views):
        from neuman_tpu.datasets.arrays import build_scene_arrays

        self.opt = opt
        self.spec = spec
        self.scene = scene
        self.out = opt.out
        os.makedirs(self.out, exist_ok=True)
        all_views = sorted(set(train_views) | set(val_views))
        self.arrays = build_scene_arrays(
            scene, all_views, use_fused_depth=opt.use_fused_depth
        )
        remap = {v: i for i, v in enumerate(all_views)}
        self.train_ids = [remap[v] for v in train_views]
        self.val_ids = [remap[v] for v in val_views]
        self.val_views = val_views

        self.optimizer = make_optimizer()
        self.state = {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "iteration": jnp.int32(0),
            "rng": jax.random.PRNGKey(opt.seed),
        }
        from neuman_tpu.parallel.mesh import put_replicated, resolve_mesh

        self.mesh = resolve_mesh(opt)
        if self.mesh is not None:
            self.state = put_replicated(self.state, self.mesh)
        self.step_fn = make_bkg_train_step(
            spec, opt, self.arrays, self.train_ids, self.optimizer,
            mesh=self.mesh,
        )
        self.pusher = tlog.MetricsPusher(opt)
        self.meter = tlog.ThroughputMeter(
            opt.rays_per_batch
            * (2 * opt.samples_per_ray + 2 * opt.importance_samples_per_ray)
        )
        if opt.resume:
            self.resume()
        elif opt.load_weights:
            self.load_pretrained_weights()

    @property
    def iteration(self):
        return int(self.state["iteration"])

    def train(self):
        import tqdm

        pbar = tqdm.tqdm(
            total=self.opt.max_iter, initial=self.iteration, desc="Train",
            ncols=80,
        )
        profiling = False
        while self.iteration < self.opt.max_iter:
            if self.iteration % self.opt.valid_iter == 0:
                self.validate()
            if self.opt.profile_dir and self.iteration == 1 and not profiling:
                import jax.profiler

                jax.profiler.start_trace(self.opt.profile_dir)
                profiling = True
            self.state, metrics = self.step_fn(self.state)
            self.meter.tick()
            pbar.update(1)
            if profiling and self.iteration >= 1 + self.opt.profile_steps:
                import jax.profiler

                jax.profiler.stop_trace()
                profiling = False
            push_every = max(1, min(100, self.opt.max_iter // 5))
            if self.iteration % push_every == 0:
                scalars = {f"train_loss/{k}": float(v) for k, v in metrics.items()
                           if "loss" in k}
                scalars["params/lr"] = float(metrics["lr"])
                scalars["params/penalize_empty_space"] = float(
                    metrics["penalize_empty_space"]
                )
                scalars.update(
                    {f"perf/{k}": v for k, v in self.meter.rates().items()}
                )
                self.pusher.push_scalars(self.iteration, scalars)
        pbar.close()
        self.validate()

    def validate(self):
        from neuman_tpu.render import renderer

        key = jax.random.fold_in(jax.random.PRNGKey(0), self.iteration)
        val_ids = jnp.asarray(np.array(self.val_ids, np.int32))
        batch = sampler.sample_background_batch(
            key, self.arrays, val_ids, self.opt.rays_per_batch,
            use_fused_depth=self.opt.use_fused_depth,
        )
        it_f = jnp.float32(self.iteration)
        pw = self.opt.penalize_empty_space * max(0.0, 1.0 - float(it_f) / 60000.0)
        keys = jax.random.split(key, 3)
        c_rgb, c_emp, f_rgb, f_emp, aux = bkg_loss_fn(
            self.state["params"], self.spec, batch, self.opt, pw, tuple(keys)
        )
        scalars = {
            f"val_loss/{k}": float(v) for k, v in aux.items() if "sigma" not in k
        }
        self.pusher.push_scalars(self.iteration, scalars, training=False)

        if self.val_views:
            cap = self.scene.captures[self.val_views[len(self.val_views) // 2]]
            rgb = renderer.render_vanilla(
                self.spec, self.state["params"]["coarse"], cap,
                fine_params=self.state["params"]["fine"],
                rays_per_batch=self.opt.rays_per_batch,
                samples_per_ray=self.opt.samples_per_ray,
                importance_samples_per_ray=self.opt.importance_samples_per_ray,
                white_bkg=self.opt.white_bkg,
                use_pallas=getattr(self.opt, "use_pallas", False),
                mesh=self.mesh,
            )
            try:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(self.out, f"val_{self.iteration:08d}.png"),
                    (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                )
            except Exception:
                pass
        self.save_model()

    def save_model(self):
        ckpt.save_checkpoint(
            os.path.join(self.out, "checkpoint.npz"),
            {
                "epoch": np.int64(0),
                "iteration": np.int64(self.iteration),
                "optim_state": self.state["opt_state"],
                "coarse_model": self.state["params"]["coarse"],
                "fine_model": self.state["params"]["fine"],
            },
        )

    def resume(self):
        path = os.path.join(self.out, "checkpoint.npz")
        data = ckpt.load_checkpoint(path)
        self._load_from(data)
        self.state["opt_state"] = ckpt.restore_like(
            self.state["opt_state"], data["optim_state"]
        )
        self.state["iteration"] = jnp.int32(int(data["iteration"]))

    def load_pretrained_weights(self):
        data = ckpt.load_checkpoint(self.opt.load_weights_path)
        self._load_from(data)

    def _load_from(self, data):
        merged_c, miss_c = ckpt.safe_merge_params(
            self.state["params"]["coarse"], data["coarse_model"]
        )
        merged_f, miss_f = ckpt.safe_merge_params(
            self.state["params"]["fine"], data["fine_model"]
        )
        self.state["params"] = {"coarse": merged_c, "fine": merged_f}
        if miss_c or miss_f:
            print(f"partial load; missing: {miss_c + miss_f}")
