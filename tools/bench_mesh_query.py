"""Mesh-query microbenchmark + KNN recall study.

Times `signed_distance` (the human-train-step hot query, 3x/step —
ref hot loop being replaced: ray_utils.py:48-93,
human_nerf_trainer.py:264-271, 305-343) at the training size
(N=196608 points vs a 6882-vert / 13760-face smooth body-proxy mesh)
with the pure-device lax.scan protocol (K queries inside one jit, one
scalar readback — the axon tunnel adds ~50-85 ms per python dispatch).

Also measures KNN recall vs the brute-force oracle on the realistic
body-proxy surface for k in {1, 2, 4, 8}, to justify the default k.

Usage:
  python tools/bench_mesh_query.py            # timing sweep on default backend
  python tools/bench_mesh_query.py --recall   # recall study (smaller N)
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=196608)
    ap.add_argument("--scan_iters", type=int, default=20)
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--recall_n", type=int, default=16384)
    ap.add_argument("--subdivisions", type=int, default=5,
                    help="icosphere level: 4 -> V=2562, 5 -> V=10242 "
                         "(SMPL V=6890 sits between)")
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

    if args.recall:
        pts_np = sample_query_points(verts_np, args.recall_n, seed=3)
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
            d2_knn, _, _ = jax.jit(
                lambda p, k=k: mesh_ops.point_mesh_closest_planar(
                    p, verts, topo, k=k, exact_knn=args.exact_knn
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
                        "exact_frac": exact,
                        "max_abs_err": float(err.max()),
                        "p999_rel_err": float(np.quantile(rel, 0.999)),
                        "mean_rel_err": float(rel.mean()),
                    }
                )
            )
        return

    pts_np = sample_query_points(verts_np, args.n, seed=3)
    pts = jnp.asarray(pts_np)

    for k in args.ks:
        def one_query(carry, _):
            # vary the input so nothing is elided across scan steps
            p = pts + carry * 1e-6
            sd, f_id, closest = mesh_ops.signed_distance(p, verts, topo, k=k)
            return carry + 1.0, jnp.sum(sd) + jnp.sum(closest)

        @jax.jit
        def run():
            _, outs = jax.lax.scan(one_query, 0.0, None, length=args.scan_iters)
            return jnp.sum(outs)

        float(run())  # compile + warmup
        t0 = time.time()
        float(run())
        dt = (time.time() - t0) / args.scan_iters
        print(
            json.dumps(
                {"k": k, "ms_per_query": round(dt * 1e3, 2), "n": args.n}
            )
        )


if __name__ == "__main__":
    main()
