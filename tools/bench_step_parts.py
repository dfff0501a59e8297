"""Component timings for the human train step at production size.

Isolates each step component with the lax.scan protocol (20 reps in one
jit, scalar readback, median of varied-input runs) so the ~50-85 ms axon
dispatch latency cancels. Components and measured v5e numbers live in
BASELINE.md's train-step decomposition.

Usage: python tools/bench_step_parts.py [all|smpl|sampler|merge|opt|offset]
(run from the repo root; TPU by default, CPU with JAX_PLATFORMS=cpu).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from neuman_tpu.models import human_nerf as hn, smpl as smpl_module
from neuman_tpu.ops import mesh as mesh_ops, fused
from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
from neuman_tpu.parallel.dryrun import synthetic_arrays
from neuman_tpu.trainers.background import make_optimizer
from neuman_tpu.utils.synthetic_body import body_proxy_smpl_model
from neuman_tpu.datasets import sampler as ds_sampler

cfg = apply_mode_defaults(NeuManConfig(), "smpl_and_offset")
cfg.geo_threshold = 0.25
num_views = 4
body = body_proxy_smpl_model(subdivisions=5)
arrays = synthetic_arrays(num_views=num_views, h=270, w=480, num_verts=body.num_verts)
proxy = jnp.asarray(body.v_template)
arrays = arrays.replace(verts=jnp.tile(proxy[None], (num_views, 1, 1)) + arrays.verts * 0.02)
spec = hn.build_human_nerf_spec(cfg)
rng = np.random.default_rng(0)
params = hn.init_human_nerf_params(
    jax.random.PRNGKey(0), spec,
    poses=rng.normal(size=(num_views, 72)).astype(np.float32) * 0.05,
    betas=rng.normal(size=(num_views, 10)).astype(np.float32) * 0.05,
    alignments=np.tile(np.eye(4, dtype=np.float32)[None], (num_views, 1, 1)),
)
R, S = 1536, 128
da = hn.da_pose_params(24)

def scan_time(name, fn, carry0, iters=20):
    @jax.jit
    def run(base):
        def body_fn(c, _):
            return fn(c)
        c, outs = jax.lax.scan(lambda c, x: (fn(c), 0.0), base, None, length=iters)
        return jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), c, 0.0)
    float(run(carry0))
    ts = []
    for i in range(3):
        c2 = jax.tree_util.tree_map(lambda a: a + (i + 1) * 1e-6, carry0)
        t0 = time.time()
        float(run(c2))
        ts.append((time.time() - t0) / iters)
    print(f"{name}: {sorted(ts)[1]*1e3:.2f} ms", flush=True)

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "smpl"):
    # vertex_forward: SMPL LBS x2 + T_da2scene (1x/step)
    def f(poses):
        p2 = dict(params); p2["poses"] = poses
        verts, raw_ts = hn.vertex_forward(spec, p2, body, da, 1.0, jnp.int32(0))
        return poses + jnp.sum(verts) * 0.0 + jnp.float32(1e-6)
    scan_time("vertex_forward (SMPL LBS x2)", f, params["poses"])

if which in ("all", "sampler"):
    ids = jnp.arange(num_views, dtype=jnp.int32)
    def f(c):
        key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.int32(c))
        b = ds_sampler.sample_human_batch(
            key, arrays, ids, cfg.geo_threshold, R,
            ratios=(cfg.body_rays_ratio, cfg.border_rays_ratio, cfg.bkg_rays_ratio),
            use_patch=True, dilation=cfg.dilation,
        )
        return c + 1.0 + jnp.sum(b["color"]) * 1e-12
    scan_time("sample_human_batch", f, jnp.float32(0.0))

if which in ("all", "merge"):
    z1 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (R, 256)), axis=-1)
    z2 = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (R, S)), axis=-1)
    sg1 = jax.random.normal(jax.random.PRNGKey(3), (R, 256))
    sg2 = jax.random.normal(jax.random.PRNGKey(4), (R, S))
    rgb1 = [sg1 * 0.1] * 3
    rgb2 = [sg2 * 0.1] * 3
    dirn = jnp.ones((R,))
    def f(z1c):
        tz, tsg, trgb = fused.sort_merge_planar([z1c, z2], [sg1, sg2], [rgb1, rgb2])
        rgb, _, _, w, _ = fused.integrate_planar(tsg, trgb, tz, dirn)
        return z1c + jnp.sum(rgb) * 1e-9
    scan_time("sort_merge+integrate [1536, 384]", f, z1)

if which in ("all", "opt"):
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    grads = jax.tree_util.tree_map(lambda a: a * 1e-3, params)
    def f(p):
        g2 = jax.tree_util.tree_map(lambda a: a * 1e-3, p)
        upd, _ = optimizer.update(g2, opt_state, p)
        import optax
        return optax.apply_updates(p, upd)
    scan_time("optimizer grads+update", f, params)

if which in ("all", "offset"):
    planes = [jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(5), a), (R, S)) for a in range(4)]
    def f(p0):
        def loss(prm):
            off = fused.offset_net_planar(spec.offset, prm, [planes[0] + 0 * p0["pts_linears"][0]["b"][0]] + planes[1:], 1.0, jnp.bfloat16)
            return sum(jnp.sum(o) for o in off)
        g = jax.grad(loss)(p0)
        return jax.tree_util.tree_map(lambda a, b: a + b * 1e-9, p0, g)
    scan_time("offset net fwd+bwd", f, params["offset_nets"][0])

if which in ("all", "mlpvjp"):
    # the batched canonical-net application: 4 concatenated [R, S] apps
    # through the custom-VJP Pallas pair (the step's largest MLP term),
    # under both backward strategies (recompute-in-VMEM vs HBM tape)
    from neuman_tpu.ops.pallas import raymarch_vjp
    for tape_mode in ("recompute", "hbm"):
        mlp = raymarch_vjp.make_mlp_vjp(
            spec.human, jnp.bfloat16, tape_mode=tape_mode
        )
        for mult in (1, 4):
            planes = [
                jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(6), a),
                    (R * mult, S)) * 0.3
                for a in range(6)
            ]
            def f(p0, planes=planes, mlp=mlp):
                def loss(prm):
                    sg, rgb = mlp(prm, planes[0], planes[1], planes[2],
                                  planes[3], planes[4], planes[5])
                    return jnp.sum(sg) + sum(jnp.sum(c) for c in rgb)
                g = jax.grad(loss)(p0)
                return jax.tree_util.tree_map(
                    lambda a, b: a + b * 1e-9, p0, g
                )
            scan_time(
                f"canonical MLP fwd+bwd [{R*mult}, {S}] tape={tape_mode}",
                f, params["coarse_human_net"],
            )

if which in ("all", "warpbwd"):
    # the training warp fwd+bwd: the production path wraps it in
    # jax.checkpoint (re-running the whole mesh query in the backward);
    # with the Pallas-VJP MLPs the original memory rationale is gone, so
    # measure what the recompute actually costs vs storing residuals
    topo = mesh_ops.MeshTopology.build(body.faces, body.num_verts)
    verts_w = jnp.asarray(body.v_template)
    raw_ts = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (body.num_verts, 1, 1))
    base = jax.random.normal(jax.random.PRNGKey(8), (R * S, 3)) * 0.3
    for label, ckpt in (("ckpt", True), ("nockpt", False)):
        warp = lambda flat, v, t: mesh_ops.warp_points_to_canonical_diff(
            flat, v, t, topo, k=4, knn_stride=4)
        if ckpt:
            warp = jax.checkpoint(warp)
        def f(pts, warp=warp):
            def loss(p):
                can, f_id, _ = warp(p, verts_w, raw_ts)
                return jnp.sum(can * can)
            g = jax.grad(loss)(pts)
            return pts + g * 1e-9
        scan_time(f"warp fwd+bwd N={R*S} stride=4 [{label}]", f, base)

if which in ("all", "query"):
    # strided signed-distance query at the training size (3x/step)
    topo = mesh_ops.MeshTopology.build(body.faces, body.num_verts)
    verts = jnp.asarray(body.v_template)
    base = jax.random.normal(jax.random.PRNGKey(7), (R * S, 3)) * 0.3
    tables = mesh_ops.build_query_tables(verts, topo)
    for stride in (1, 4):
        for tb_label, tb in (("", None), ("+tables", tables)):
            def f(pts, stride=stride, tb=tb):
                sd, f_id, _ = mesh_ops.signed_distance(
                    pts, verts, topo, k=4, knn_stride=stride, tables=tb)
                return pts + (sd[:, None] * 0.0 + 1e-7)
            scan_time(
                f"signed_distance N={R*S} k=4 stride={stride}{tb_label}",
                f, base,
            )
