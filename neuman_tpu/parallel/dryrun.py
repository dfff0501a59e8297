"""In-memory synthetic training setups for multi-chip dry runs.

Builds a tiny but complete human-stage training state (synthetic SMPL body,
random staged scene arrays, full HumanNeRF param tree) without touching
disk, and runs ONE sharded train step over a `data` mesh — used by
`__graft_entry__.dryrun_multichip` to validate that the full training step
compiles and executes under GSPMD sharding with N devices.
"""

import numpy as np
import jax
import jax.numpy as jnp

from neuman_tpu.datasets.arrays import RaySceneArrays
from neuman_tpu.models import human_nerf as hn
from neuman_tpu.models import smpl as smpl_module
from neuman_tpu.ops import mesh as mesh_ops
from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
from neuman_tpu.parallel.mesh import make_mesh, put_replicated
from neuman_tpu.trainers.background import make_optimizer
from neuman_tpu.trainers.human import make_human_train_step


def synthetic_arrays(num_views=4, h=36, w=48, num_verts=64, seed=0):
    rng = np.random.default_rng(seed)
    hw = h * w
    masks = np.zeros((num_views, h, w), np.uint8)
    masks[:, h // 3 : 2 * h // 3, w // 3 : 2 * w // 3] = 1
    perms, body_counts, border_counts = [], [], []
    for v in range(num_views):
        body = masks[v].reshape(-1) != 0
        cls = np.where(body, 0, 2).astype(np.int8)
        perms.append(np.argsort(cls, kind="stable").astype(np.int32))
        body_counts.append(int(body.sum()))
        border_counts.append(0)
    intr = np.tile(
        np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)[None],
        (num_views, 1, 1),
    )
    c2w = np.tile(np.eye(4, dtype=np.float32)[None], (num_views, 1, 1))
    c2w[:, 2, 3] = -2.5
    verts = rng.normal(size=(num_views, num_verts, 3)).astype(np.float32) * 0.3
    return RaySceneArrays(
        images=jnp.asarray(
            rng.integers(0, 255, size=(num_views, h, w, 3), dtype=np.uint8)
        ),
        masks=jnp.asarray(masks),
        depths=jnp.asarray(rng.uniform(1, 3, (num_views, h, w)).astype(np.float32)),
        fused_depths=jnp.asarray(
            rng.uniform(1, 3, (num_views, h, w)).astype(np.float32)
        ),
        intrinsics=jnp.asarray(intr),
        c2w=jnp.asarray(c2w),
        near_bkg=jnp.full((num_views,), 0.5),
        far_bkg=jnp.full((num_views,), 4.0),
        near_human=jnp.full((num_views,), 1.5),
        far_human=jnp.full((num_views,), 3.5),
        viewf=jnp.linspace(0, 1, num_views),
        perm=jnp.asarray(np.stack(perms)),
        body_count=jnp.asarray(np.array(body_counts, np.int32)),
        border_count=jnp.asarray(np.array(border_counts, np.int32)),
        verts=jnp.asarray(verts),
    )


def tiny_human_config(n_devices):
    cfg = apply_mode_defaults(NeuManConfig(), "smpl_and_offset")
    cfg.nerf_depth = 2
    cfg.nerf_width = 32
    cfg.pos_N_freqs = 4
    cfg.pos_max_freq = 3
    cfg.dir_N_freqs = 2
    cfg.dir_max_freq = 1
    cfg.samples_per_ray = 8
    cfg.importance_samples_per_ray = 8
    cfg.rays_per_batch = max(8 * n_devices, 64)
    cfg.penalize_lpips = 0.0
    cfg.geo_threshold = 0.5
    cfg.dilation = 0
    cfg.body_rays_ratio, cfg.border_rays_ratio, cfg.bkg_rays_ratio = 0.95, 0.0, 0.05
    return cfg


def human_training_setup(cfg, num_views=4):
    """Shared tiny human-stage setup: (spec, params, arrays, ctx, optimizer)."""
    body = smpl_module.synthetic_smpl_model(num_verts=64, num_joints=24)
    arrays = synthetic_arrays(num_views=num_views, num_verts=body.num_verts)
    spec = hn.build_human_nerf_spec(cfg)
    rng = np.random.default_rng(0)
    params = hn.init_human_nerf_params(
        jax.random.PRNGKey(0),
        spec,
        poses=rng.normal(size=(num_views, 72)).astype(np.float32) * 0.1,
        betas=rng.normal(size=(num_views, 10)).astype(np.float32) * 0.1,
        alignments=np.tile(np.eye(4, dtype=np.float32)[None], (num_views, 1, 1)),
    )
    topo = mesh_ops.MeshTopology.build(body.faces, body.num_verts)
    ctx = {
        "body_model": body,
        "da_smpl": hn.da_pose_params(24),
        "scale": 1.0,
        "topo": topo,
        "can_verts": arrays.verts,
        "can_k": arrays.intrinsics[:2],
        "can_c2w": arrays.c2w[:2],
        "can_hw": (36, 48),
        "interval_comp": 1.0,
        "lpips_params": None,
        "scene_ids": jnp.arange(num_views, dtype=jnp.int32),
        "grad_masks": jnp.ones((num_views, 72)),
        "knn_k": 4,
        "knn_stride": getattr(cfg, "knn_stride", 1),
    }
    return spec, params, arrays, ctx, make_optimizer()


def _run_human_steps(spec, cfg, params, arrays, ctx, optimizer, mesh, steps):
    """`steps` human train steps from a fresh copy of `params`; returns
    (per-step losses, final state). The step donates its input state, so
    buffers are copied first."""
    p = jax.tree_util.tree_map(jnp.array, params)
    state = {
        "params": put_replicated(p, mesh) if mesh is not None else p,
        "opt_state": optimizer.init(p),
        "iteration": jnp.int32(0),
        "rng": jax.random.PRNGKey(0),
    }
    step = make_human_train_step(
        spec, cfg, arrays, list(range(len(ctx["scene_ids"]))), optimizer, ctx,
        mesh=mesh,
    )
    losses = []
    for _ in range(steps):
        state, metrics = step(state)
        losses.append(float(metrics["total_loss"]))
    return losses, state


def dryrun_human_train_step(n_devices):
    """One sharded human-NeRF train step over an n-device `data` mesh."""
    mesh = make_mesh(n_devices)
    cfg = tiny_human_config(n_devices)
    spec, params, arrays, ctx, optimizer = human_training_setup(cfg)
    losses, _ = _run_human_steps(
        spec, cfg, params, arrays, ctx, optimizer, mesh, steps=1
    )
    total = losses[0]
    assert np.isfinite(total), f"non-finite loss in dryrun: {total}"
    return {"total_loss": jnp.float32(total)}


def dryrun_human_equality(n_devices, steps=3):
    """N-step sharded-vs-unsharded equality on the FULL human train step
    (per-batch scalar cap_id, patch/strata logic, mesh queries, Adam):
    sharding the ray axis across the mesh must not change the math.

    Returns a dict of comparison values; raises AssertionError on mismatch.
    """
    mesh = make_mesh(n_devices)
    cfg = tiny_human_config(n_devices)
    spec, params, arrays, ctx, optimizer = human_training_setup(cfg)
    loss_1, state_1 = _run_human_steps(
        spec, cfg, params, arrays, ctx, optimizer, None, steps
    )
    loss_n, state_n = _run_human_steps(
        spec, cfg, params, arrays, ctx, optimizer, mesh, steps
    )
    np.testing.assert_allclose(loss_n, loss_1, rtol=1e-4)
    leaves_1 = jax.tree_util.tree_leaves(state_1["params"])
    leaves_n = jax.tree_util.tree_leaves(state_n["params"])
    max_dp = 0.0
    for a, b in zip(leaves_1, leaves_n):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
        max_dp = max(max_dp, float(np.max(np.abs(np.asarray(b) - np.asarray(a)))))
    return {
        "steps": steps,
        "loss_unsharded": loss_1,
        "loss_sharded": loss_n,
        "max_param_abs_diff": max_dp,
    }
