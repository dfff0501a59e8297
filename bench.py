"""Benchmark: fused PE+MLP+integrate ray-march throughput on one chip.

Measures the BASELINE.json north-star metric — ray-samples/sec/chip through
the full coarse->importance->fine render pipeline (the reference's hot path,
render_utils.py:108-161, with the standard 8x256 MLPs and 63/27-dim
positional encodings) — and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N / 1e7}

Run with the default environment to target the real TPU chip. Use
--dtype float32|bfloat16 (default bfloat16: fp32 params, bf16 matmuls with
fp32 accumulation — the intended TPU compute mode) and --pallas to use the
hand-fused Pallas ray-march kernel when available.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rays", type=int, default=32768)
    parser.add_argument("--samples", type=int, default=128)
    parser.add_argument("--importance", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--pallas", action="store_true", default=None,
                        help="fused Pallas kernel (default: on for TPU)")
    parser.add_argument("--no-pallas", dest="pallas", action="store_false")
    parser.add_argument("--naive", action="store_true")
    parser.add_argument("--rays_per_tile", type=int, default=16)
    parser.add_argument("--train_scan_iters", type=int, default=10)
    parser.add_argument("--no-train", dest="train", action="store_false",
                        default=True,
                        help="skip the human-train-step benchmark")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from neuman_tpu.models import nerf as nerf_module
    from neuman_tpu.ops import rays as ray_ops
    from neuman_tpu.ops import volume
    from neuman_tpu.options.config import NeuManConfig

    cfg = NeuManConfig()  # 8x256, 10/4 freq bands — the reference network
    spec = nerf_module.build_nerf_specs(cfg)
    key = jax.random.PRNGKey(0)
    coarse = nerf_module.init_nerf_params(key, spec.nerf)
    fine = nerf_module.init_nerf_params(jax.random.fold_in(key, 1), spec.nerf)
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    R, S, I = args.rays, args.samples, args.importance

    if args.pallas is None:
        args.pallas = jax.default_backend() == "tpu" and not args.naive
    if args.pallas:
        from neuman_tpu.ops.pallas.raymarch import make_fused_render

        render_chunk = make_fused_render(
            spec, S, I, compute_dtype, rays_per_tile=args.rays_per_tile
        )
    elif args.naive:
        # reference-shaped formulation ([.., 3]-last layouts); kept for
        # comparison — OOMs beyond ~8k rays from lane-padding blowup
        def render_chunk(coarse_p, fine_p, origins, dirs, near, far):
            pts, sdirs, z = ray_ops.ray_to_samples(origins, dirs, near, far, S)
            out = nerf_module.apply_joiner(
                spec, coarse_p, pts, sdirs, compute_dtype=compute_dtype
            )
            rgb, _, _, w, _ = volume.raw2outputs(out, z, sdirs[:, 0, :])
            f_pts, f_dirs, f_z = ray_ops.ray_to_importance_samples(
                origins, dirs, z, w, I, det=True
            )
            f_out = nerf_module.apply_joiner(
                spec, fine_p, f_pts, f_dirs, compute_dtype=compute_dtype
            )
            f_rgb, _, _, _, f_depth = volume.raw2outputs(
                f_out, f_z, f_dirs[:, 0, :]
            )
            return f_rgb, f_depth
    else:
        # feature-major fused path (ops/fused.py) — the default perf path
        from neuman_tpu.ops.fused import fused_vanilla_render

        def render_chunk(coarse_p, fine_p, origins, dirs, near, far):
            return fused_vanilla_render(
                spec, coarse_p, fine_p, origins, dirs, near, far,
                samples_per_ray=S, importance_samples_per_ray=I,
                compute_dtype_name=args.dtype,
            )

    fn = jax.jit(render_chunk)

    origins = jnp.zeros((R, 3)).at[:, 2].set(-2.0)
    d = jax.random.normal(jax.random.fold_in(key, 2), (R, 3)) * 0.1 + jnp.array(
        [0.0, 0, 1.0]
    )
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    near = jnp.full((R, 1), 0.5)
    far = jnp.full((R, 1), 4.0)

    # compile + warmup. Timing protocol: inputs vary per iteration (nothing
    # can be elided), and each iteration is forced by reading back a SCALAR
    # device-side reduction of the outputs — block_until_ready is not a
    # reliable completion barrier through the axon relay, and full-array
    # readbacks would time the host tunnel instead of the chip.
    import jax.numpy as _jnp
    import numpy as _np

    force = jax.jit(lambda o: _jnp.sum(o[0]) + _jnp.sum(o[1]))
    out = fn(coarse, fine, origins, dirs, near, far)
    float(force(out))

    times = []
    for i in range(args.iters):
        t0 = time.time()
        out = fn(coarse, fine, origins + (i + 1) * 1e-5, dirs, near, far)
        float(force(out))
        times.append(time.time() - t0)
    dt = float(_np.median(times)) * args.iters

    # MLP-evaluated samples: S coarse + (S + I) fine per ray
    samples_per_iter = R * (S + (S + I))
    value = samples_per_iter * args.iters / dt
    result = {
        "metric": "ray_samples_per_sec_per_chip",
        "value": float(value),
        "unit": "ray-samples/s",
        "vs_baseline": float(value / 1e7),
    }
    if args.train:
        result["human_train_step_ms"] = round(
            bench_human_train_step(args.train_scan_iters), 1
        )
        result["bkg_train_step_ms"] = round(
            bench_bkg_train_step(args.train_scan_iters), 1
        )
    print(json.dumps(result))
    return result


def bench_bkg_train_step(scan_iters=10):
    """Background-stage train step, ms/step on one chip (the LONGER
    reference schedule: 500k iters x 4096 rays x 128+128 samples,
    train.py:166-168/223-224; coarse+fine both trainable through the
    custom-VJP Pallas pair when on TPU)."""
    import time

    import jax
    import jax.numpy as jnp

    from neuman_tpu.models import nerf as nerf_module
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
    from neuman_tpu.parallel.dryrun import synthetic_arrays
    from neuman_tpu.trainers.background import (
        make_bkg_train_step,
        make_optimizer,
    )

    cfg = apply_mode_defaults(NeuManConfig(), "bkg")
    cfg.use_pallas = jax.default_backend() == "tpu"
    num_views = 4
    arrays = synthetic_arrays(num_views=num_views, h=270, w=480, num_verts=64)
    spec = nerf_module.build_nerf_specs(cfg)
    params = {
        "coarse": nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf),
        "fine": nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf),
    }
    optimizer = make_optimizer()
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "iteration": jnp.int32(0),
        "rng": jax.random.PRNGKey(0),
    }
    step = make_bkg_train_step(
        spec, cfg, arrays, list(range(num_views)), optimizer
    )

    @jax.jit
    def multi_step(state):
        def body_fn(st, _):
            st, m = step(st)
            return st, m["total_loss"]

        return jax.lax.scan(body_fn, state, None, length=scan_iters)

    state, losses = multi_step(state)
    float(jnp.sum(losses))
    t0 = time.time()
    state, losses = multi_step(state)
    float(jnp.sum(losses))
    return (time.time() - t0) / scan_iters * 1e3


def bench_human_train_step(scan_iters=10):
    """Full reference-size human-stage train step, ms/step on one chip.

    The training hot loop (ref schedule: 300k iters, train.py:181-183):
    1536 rays x 128 samples, 8x256 MLPs, all 7 loss families incl. 3 mesh
    queries against an SMPL-scale smooth body proxy (V=10242 icosphere —
    conservative vs SMPL's 6890), fwd+bwd+Adam in ONE jit. Timed with the
    lax.scan protocol (scan_iters steps in one dispatch, scalar readback)
    so the axon tunnel's ~50-85 ms dispatch latency is excluded.
    """
    import time

    import jax
    import jax.numpy as jnp

    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.ops import mesh as mesh_ops
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
    from neuman_tpu.parallel.dryrun import synthetic_arrays
    from neuman_tpu.trainers.background import make_optimizer
    from neuman_tpu.trainers.human import make_human_train_step
    from neuman_tpu.utils.synthetic_body import body_proxy_smpl_model

    cfg = apply_mode_defaults(NeuManConfig(), "smpl_and_offset")
    cfg.penalize_lpips = 0.0  # no calibrated LPIPS weights in-container
    cfg.geo_threshold = 0.25
    # production TPU path: Pallas bkg fwd + custom-VJP human MLP pair
    # (measured 236 -> 196 ms/step; parity-tested vs the XLA loss)
    cfg.use_pallas = jax.default_backend() == "tpu"
    num_views = 4
    body = body_proxy_smpl_model(subdivisions=5)
    arrays = synthetic_arrays(
        num_views=num_views, h=270, w=480, num_verts=body.num_verts
    )
    # realistic posed/canonical surfaces for the mesh queries
    proxy = jnp.asarray(body.v_template)
    arrays = arrays.replace(
        verts=jnp.tile(proxy[None], (num_views, 1, 1))
        + arrays.verts * 0.02
    )
    spec = hn.build_human_nerf_spec(cfg)
    rng = np.random.default_rng(0)
    params = hn.init_human_nerf_params(
        jax.random.PRNGKey(0),
        spec,
        poses=rng.normal(size=(num_views, 72)).astype(np.float32) * 0.05,
        betas=rng.normal(size=(num_views, 10)).astype(np.float32) * 0.05,
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
        "can_hw": (270, 480),
        "interval_comp": 1.0,
        "lpips_params": None,
        "scene_ids": jnp.arange(num_views, dtype=jnp.int32),
        "grad_masks": jnp.ones((num_views, 72)),
        "knn_k": 4,
        "knn_stride": cfg.knn_stride,
    }
    optimizer = make_optimizer()
    state = {
        "params": params,
        "opt_state": optimizer.init(params),
        "iteration": jnp.int32(0),
        "rng": jax.random.PRNGKey(0),
    }
    step = make_human_train_step(
        spec, cfg, arrays, list(range(num_views)), optimizer, ctx
    )

    @jax.jit
    def multi_step(state):
        def body_fn(st, _):
            st, metrics = step(st)
            return st, metrics["total_loss"]

        return jax.lax.scan(body_fn, state, None, length=scan_iters)

    state, losses = multi_step(state)  # compile + warmup
    float(jnp.sum(losses))
    t0 = time.time()
    state, losses = multi_step(state)
    float(jnp.sum(losses))
    dt = (time.time() - t0) / scan_iters
    return dt * 1e3


if __name__ == "__main__":
    main()
