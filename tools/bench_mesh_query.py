"""Mesh-query microbenchmark + KNN recall study.

Times `signed_distance` (the human-train-step hot query, 3x/step —
ref hot loop being replaced: ray_utils.py:48-93,
human_nerf_trainer.py:264-271, 305-343) at the training size
(N=196608 points vs a 6882-vert / 13760-face smooth body-proxy mesh)
with the pure-device lax.scan protocol (K queries inside one jit, one
scalar readback — the axon tunnel adds ~50-85 ms per python dispatch).

Also measures KNN recall vs the brute-force oracle on the realistic
body-proxy surface for k in {1, 2, 4, 8}, to justify the default k, and
the `knn_stride` group-KNN approximation on RAY-ORDERED query points
(--ray_points; consecutive points are successive samples along a ray, the
actual layout of the training queries).

Usage:
  python tools/bench_mesh_query.py                       # timing sweep
  python tools/bench_mesh_query.py --recall              # recall study
  python tools/bench_mesh_query.py --recall --ray_points --strides 1 4 8
"""

import argparse
import json
import time

import numpy as np


def ray_sample_points(verts_np, n, samples_per_ray=128, seed=3):
    """Ray-ordered query points: rays aimed at random surface verts from
    random outside origins, sampled uniformly over a near/far span around
    the body (the layout of the training warp/shape queries)."""
    rng = np.random.default_rng(seed)
    num_rays = n // samples_per_ray
    center = verts_np.mean(axis=0)
    radius = np.linalg.norm(verts_np - center, axis=1).max()
    targets = verts_np[rng.integers(0, len(verts_np), num_rays)]
    dirs_o = rng.normal(size=(num_rays, 3))
    dirs_o /= np.linalg.norm(dirs_o, axis=1, keepdims=True)
    origins = center + dirs_o * radius * 3.0
    d = targets - origins
    dist = np.linalg.norm(d, axis=1, keepdims=True)
    d = d / dist
    near = dist - radius * 0.35
    far = dist + radius * 0.35
    t = np.linspace(0.0, 1.0, samples_per_ray)[None, :, None]
    pts = origins[:, None] + d[:, None] * (near[..., None] * (1 - t) + far[..., None] * t)
    return pts.reshape(-1, 3).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=196608)
    ap.add_argument("--scan_iters", type=int, default=20)
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--strides", type=int, nargs="+", default=[1])
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--recall_n", type=int, default=16384)
    ap.add_argument("--ray_points", action="store_true",
                    help="ray-sample-ordered query points (the training "
                         "layout; required for meaningful stride>1 numbers)")
    ap.add_argument("--sorted_random", action="store_true",
                    help="uniform box points sorted by Morton code (the "
                         "dummy-query layout candidate for stride>1)")
    ap.add_argument("--subdivisions", type=int, default=5,
                    help="icosphere level: 4 -> V=2562, 5 -> V=10242 "
                         "(SMPL V=6890 sits between)")
    ap.add_argument("--knn_impl", type=str, default=None,
                    choices=[None, "bucketed", "exact"],
                    help="force the vertex-KNN implementation")
    ap.add_argument("--exact_knn", action="store_true",
                    help="exact top-k verts (isolates geometric recall "
                         "from approx_max_k)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops import mesh as mesh_ops
    from neuman_tpu.utils.synthetic_body import (
        sample_query_points,
        synthetic_body_mesh,
    )

    verts_np, faces_np = synthetic_body_mesh(subdivisions=args.subdivisions)
    topo = mesh_ops.MeshTopology.build(faces_np, verts_np.shape[0])
    verts = jnp.asarray(verts_np)
    print(
        f"mesh: V={verts_np.shape[0]} F={faces_np.shape[0]} "
        f"incidence_width={topo.incidence.shape[1]} backend={jax.default_backend()}"
    )

    def morton_sorted_box(n, seed=3):
        rng = np.random.default_rng(seed)
        pts = ((rng.uniform(size=(n, 3)) - 0.5) * 3.0).astype(np.float32)
        q = np.clip(((pts + 1.5) / 3.0 * 1023), 0, 1023).astype(np.uint32)

        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x

        key = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
        return pts[np.argsort(key)]

    def make_points(n):
        if args.ray_points:
            return ray_sample_points(verts_np, n, seed=3)
        if args.sorted_random:
            return morton_sorted_box(n)
        return sample_query_points(verts_np, n, seed=3)

    if args.recall:
        pts_np = make_points(args.recall_n)
        pts = jnp.asarray(pts_np)
        # Planar brute oracle: [F, chunk]-shaped Ericson over ALL faces
        # (the stock brute path materializes [chunk, F, 3]-last arrays that
        # lane-pad 42x and OOM at this size). Feature-major + lax.map chunks.
        fv = verts[jnp.asarray(faces_np)]  # [F, 3, 3]
        a_cols = tuple(fv[:, 0, i][:, None] for i in range(3))  # [F, 1]
        b_cols = tuple(fv[:, 1, i][:, None] for i in range(3))
        c_cols = tuple(fv[:, 2, i][:, None] for i in range(3))

        def brute_chunk(p):  # p [chunk, 3]
            p_cols = tuple(p[None, :, i] for i in range(3))  # [1, chunk]
            cp = mesh_ops.closest_point_on_triangles_planar(
                p_cols, a_cols, b_cols, c_cols
            )  # tuple of [F, chunk]
            d2 = sum((cp[i] - p_cols[i]) ** 2 for i in range(3))
            return jnp.min(d2, axis=0)

        d2_brute = jax.jit(
            lambda p: jax.lax.map(brute_chunk, p.reshape(-1, 2048, 3)).reshape(-1)
        )(pts)
        d_brute = np.sqrt(np.maximum(np.asarray(d2_brute), 0))
        for k in args.ks:
            for stride in args.strides:
                d2_knn, _, _ = jax.jit(
                    lambda p, k=k, st=stride: mesh_ops.point_mesh_closest_planar(
                        p, verts, topo, k=k, exact_knn=args.exact_knn,
                        knn_stride=st, knn_impl=args.knn_impl,
                    )[:2] + (jnp.zeros(()),)
                )(pts)
                d_knn = np.sqrt(np.maximum(np.asarray(d2_knn), 0))
                err = d_knn - d_brute  # knn >= brute always
                rel = err / np.maximum(d_brute, 1e-9)
                exact = float(np.mean(err <= 1e-6))
                print(
                    json.dumps(
                        {
                            "k": k,
                            "stride": stride,
                            "exact_frac": exact,
                            "max_abs_err": float(err.max()),
                            "p999_rel_err": float(np.quantile(rel, 0.999)),
                            "mean_rel_err": float(rel.mean()),
                        }
                    )
                )
        return

    pts_np = make_points(args.n)
    pts = jnp.asarray(pts_np)

    for k in args.ks:
        for stride in args.strides:
            def one_query(carry, _, k=k, stride=stride):
                # vary the input so nothing is elided across scan steps
                p = pts + carry * 1e-6
                sd, f_id, closest = mesh_ops.signed_distance(
                    p, verts, topo, k=k, knn_stride=stride
                )
                return carry + 1.0, jnp.sum(sd) + jnp.sum(closest)

            @jax.jit
            def run(base):
                _, outs = jax.lax.scan(
                    one_query, base, None, length=args.scan_iters
                )
                return jnp.sum(outs)

            float(run(jnp.float32(0.0)))  # compile + warmup
            ts = []
            for i in range(3):  # vary the arg: the relay memoizes repeats
                t0 = time.time()
                float(run(jnp.float32(i + 1.0)))
                ts.append((time.time() - t0) / args.scan_iters)
            dt = sorted(ts)[1]
            print(
                json.dumps(
                    {"k": k, "stride": stride,
                     "ms_per_query": round(dt * 1e3, 2), "n": args.n}
                )
            )


if __name__ == "__main__":
    main()
