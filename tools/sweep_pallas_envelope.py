"""Compile + run every Pallas kernel over the shape envelope the CLIs reach.

Every round so far hit a TPU-only Mosaic/VMEM cliff that the CPU
interpret-mode tests cannot see (r1: S<128 crash; r2: 19.9 MB VJP tiles;
r3: the C=48 scoped-VMEM OOM that zeroed BENCH_r03). This sweep compiles
and executes each kernel on the REAL backend at the candidate-count /
sample-count / dtype corners reachable from bench.py, the render CLIs
(knn_k=8 -> C=48; real SMPL deg-9 incidence -> C=72) and the trainers
(C=24, S=128), so regressions surface here instead of in the driver's
bench artifact.

Run on TPU (the default env):  python tools/sweep_pallas_envelope.py
Quick subset:                  python tools/sweep_pallas_envelope.py --quick
Exit code: 0 iff every case passed. One line per case + a summary line.
"""

import argparse
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np


def _case(name, fn, failures, verbose_tb=False):
    t0 = time.time()
    last = None
    for attempt in range(3):
        try:
            fn()
            print(f"PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
            return
        except Exception as e:  # noqa: BLE001 — report every cliff, keep going
            last = e
            # transient tunnel/backend outages (observed right after another
            # process released the chip) are not kernel cliffs — retry them
            if "backend error" in str(e) or "FAILED_PRECONDITION" in str(e):
                print(f"RETRY {name}: backend error, attempt {attempt + 1}",
                      flush=True)
                time.sleep(30)
                continue
            break
    failures.append(f"{name}: {type(last).__name__}")
    msg = str(last).splitlines()[0][:200] if str(last) else type(last).__name__
    print(f"FAIL  {name}  ({time.time() - t0:.1f}s): {msg}", flush=True)
    if verbose_tb:
        traceback.print_exc()


def sweep_ericson(failures, quick):
    """C = knn_k x incidence-width corners; N = render-chunk / odd sizes."""
    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops.pallas.meshquery import ericson_select_pallas

    rng = np.random.default_rng(0)
    # (C, N): 24 = training k=4 x deg 6; 48 = render k=8 x deg 6 (the
    # BENCH_r03 crash); 72 = real SMPL k=8 x deg 9; 262144 = the bench's
    # 4096-ray x 64-sample chunk; 3000 = a non-tile-multiple small case.
    cases = [(24, 262144), (48, 262144), (72, 262144), (48, 3000)]
    if quick:
        cases = [(48, 262144)]
    for c, n in cases:
        def run(c=c, n=n):
            p3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
            rows9 = jnp.asarray(
                rng.normal(size=(9 * c, n)).astype(np.float32)
            )
            cand = jnp.asarray(
                rng.integers(0, 100, size=(c, n)).astype(np.int32)
            )
            d2, f_id, cp = jax.jit(ericson_select_pallas)(p3, rows9, cand)
            assert np.isfinite(float(jnp.sum(d2)))

        _case(f"ericson_select C={c} N={n}", run, failures)
    # grouped (stride > 1) kernel: the training/render paths run this
    # layout by default via point_mesh_closest_planar(knn_stride=4); sweep
    # the same C corners plus stride corners 4 and 8
    g_cases = [(24, 4, 196608), (48, 4, 262144), (72, 4, 262144),
               (24, 8, 196608)]
    if quick:
        g_cases = [(48, 4, 262144)]
    for c, st, n in g_cases:
        def run_g(c=c, st=st, n=n):
            nq = n // st
            p3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
            rows9 = jnp.asarray(
                rng.normal(size=(9 * c, nq)).astype(np.float32)
            )
            cand = jnp.asarray(
                rng.integers(0, 100, size=(c, nq)).astype(np.int32)
            )
            d2, f_id, cp = jax.jit(
                lambda p, r, cd: ericson_select_pallas(p, r, cd, stride=st)
            )(p3, rows9, cand)
            assert np.isfinite(float(jnp.sum(d2)))

        _case(f"ericson_select grouped C={c} stride={st} N={n}", run_g,
              failures)

    # gradient path (the training warp differentiates d2 w.r.t. points)
    def run_grad():
        c, n = 24, 196608
        p3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
        rows9 = jnp.asarray(rng.normal(size=(9 * c, n)).astype(np.float32))
        cand = jnp.asarray(rng.integers(0, 100, size=(c, n)).astype(np.int32))
        g = jax.jit(
            jax.grad(lambda p: jnp.sum(ericson_select_pallas(p, rows9, cand)[0]))
        )(p3)
        assert np.isfinite(float(jnp.sum(g)))

    def run_grad_grouped():
        c, st, n = 24, 4, 196608
        nq = n // st
        p3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
        rows9 = jnp.asarray(rng.normal(size=(9 * c, nq)).astype(np.float32))
        cand = jnp.asarray(rng.integers(0, 100, size=(c, nq)).astype(np.int32))
        g = jax.jit(
            jax.grad(
                lambda p: jnp.sum(
                    ericson_select_pallas(p, rows9, cand, stride=st)[0]
                )
            )
        )(p3)
        assert np.isfinite(float(jnp.sum(g)))

    if not quick:
        _case("ericson_select grad C=24 N=196608", run_grad, failures)
        _case("ericson_select grouped grad C=24 stride=4", run_grad_grouped,
              failures)

    # opt-in fused Ericson+sign kernel (signed_distance use_pallas="fused")
    # — 9 extra [C, TN] input planes, its own 12.6 MB VMEM budget; sweep
    # the same C corners so its tile-step-down points stay compilable
    from neuman_tpu.ops.pallas.meshquery import ericson_signed_select_pallas

    s_cases = [(24, 1, 196608), (48, 1, 262144), (72, 1, 262144),
               (24, 4, 196608)]
    if quick:
        s_cases = [(24, 4, 196608)]
    for c, st, n in s_cases:
        def run_s(c=c, st=st, n=n):
            nq = n // st
            p3 = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
            rows9 = jnp.asarray(
                rng.normal(size=(9 * c, nq)).astype(np.float32)
            )
            vn9 = jnp.asarray(rng.normal(size=(9 * c, nq)).astype(np.float32))
            cand = jnp.asarray(
                rng.integers(0, 100, size=(c, nq)).astype(np.int32)
            )
            sd, f_id, cp = jax.jit(
                lambda p, r, v, cd: ericson_signed_select_pallas(
                    p, r, v, cd, stride=st
                )
            )(p3, rows9, vn9, cand)
            assert np.isfinite(float(jnp.sum(sd)))

        _case(f"ericson_signed C={c} stride={st} N={n}", run_s, failures)


def sweep_bucketed_knn(failures, quick):
    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops.pallas.meshquery import bucketed_knn_pallas

    rng = np.random.default_rng(1)
    cases = [(49152, 10242, 4), (4096, 6890, 8)]
    if quick:
        cases = cases[:1]
    for n, v, k in cases:
        def run(n=n, v=v, k=k):
            pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
            verts = jnp.asarray(rng.normal(size=(v, 3)).astype(np.float32))
            idx = jax.jit(
                lambda p, vv: bucketed_knn_pallas(p, vv, k)
            )(pts, verts)
            assert int(jnp.max(idx)) < v

        _case(f"bucketed_knn N={n} V={v} k={k}", run, failures)


def _mlp_fixture():
    import jax

    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults

    cfg = apply_mode_defaults(NeuManConfig(), "smpl_and_offset")
    spec = hn.build_human_nerf_spec(cfg)
    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    return spec, params


def sweep_mlp(failures, quick):
    """Fused PE+MLP forward over the S envelope, both dir modes, both dtypes."""
    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops.pallas import raymarch

    spec, params = _mlp_fixture()
    prm = params["coarse_human_net"]
    rng = np.random.default_rng(2)
    s_values = [16, 32, 64, 128, 256] if not quick else [64]
    r = 1536
    for s in s_values:
        for mode in ("ray", "sample"):
            for dt_name in (("bfloat16",) if (quick or s != 128)
                            else ("bfloat16", "float32")):
                def run(s=s, mode=mode, dt_name=dt_name):
                    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
                    planes = [
                        jnp.asarray(rng.normal(size=(r, s)).astype(np.float32))
                        for _ in range(3)
                    ]
                    if mode == "ray":
                        dirs = jnp.asarray(
                            rng.normal(size=(r, 3)).astype(np.float32)
                        )
                        dirp = raymarch.dir_projection(
                            spec.human, prm, dirs, dt
                        )
                        f = jax.jit(lambda *p: raymarch.nerf_mlp_pallas(
                            spec.human, prm, *p, dirp, dt
                        ))
                        sg, rgb = f(*planes)
                    else:
                        dpl = tuple(
                            jnp.asarray(
                                rng.normal(size=(r, s)).astype(np.float32)
                            )
                            for _ in range(3)
                        )
                        f = jax.jit(lambda *p: raymarch.nerf_mlp_pallas(
                            spec.human, prm, *p, None, dt, dir_planes=dpl
                        ))
                        sg, rgb = f(*planes)
                    assert np.isfinite(float(jnp.sum(sg)))

                _case(f"nerf_mlp S={s} dirs={mode} {dt_name}", run, failures)


def sweep_mlp_vjp(failures, quick):
    """Custom-VJP fused MLP pair (the training path) over the S envelope."""
    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops.pallas import raymarch, raymarch_vjp

    spec, params = _mlp_fixture()
    prm = params["coarse_human_net"]
    rng = np.random.default_rng(3)
    r = 1536
    s_values = [64, 128] if not quick else [128]
    tape_modes = ("recompute", "hbm") if not quick else ("recompute",)
    for s in s_values:
        for per_sample in (True, False):
          for tape_mode in tape_modes:
            def run(s=s, per_sample=per_sample, tape_mode=tape_mode):
                f = raymarch_vjp.make_mlp_vjp(
                    spec.human, jnp.bfloat16, per_sample=per_sample,
                    tape_mode=tape_mode,
                )
                planes = [
                    jnp.asarray(rng.normal(size=(r, s)).astype(np.float32))
                    for _ in range(3)
                ]
                if per_sample:
                    dargs = tuple(
                        jnp.asarray(rng.normal(size=(r, s)).astype(np.float32))
                        for _ in range(3)
                    )
                else:
                    dirs = jnp.asarray(
                        rng.normal(size=(r, 3)).astype(np.float32)
                    )
                    dargs = (raymarch.dir_projection(
                        spec.human, prm, dirs, jnp.bfloat16
                    ),)

                def loss(p):
                    sg, rgb = f(p, *planes, *dargs)
                    return jnp.sum(sg) + sum(jnp.sum(c) for c in rgb)

                g = jax.jit(jax.grad(loss))(prm)
                leaf = jax.tree_util.tree_leaves(g)[0]
                assert np.isfinite(float(jnp.sum(leaf)))

            _case(
                f"mlp_vjp S={s} per_sample={per_sample} tape={tape_mode}",
                run, failures,
            )


def sweep_offset_vjp(failures, quick):
    import jax
    import jax.numpy as jnp

    from neuman_tpu.ops.pallas import raymarch_vjp

    spec, params = _mlp_fixture()
    prm = params["offset_nets"][0]
    rng = np.random.default_rng(4)
    r, s = 1536, 128

    for tape_mode in ("recompute", "hbm") if not quick else ("recompute",):
        def run(tape_mode=tape_mode):
            f = raymarch_vjp.make_offset_mlp_vjp(
                spec.offset, jnp.bfloat16, tape_mode=tape_mode
            )
            planes = [
                jnp.asarray(rng.normal(size=(r, s)).astype(np.float32))
                for _ in range(4)  # xyzt
            ]

            def loss(p):
                out = f(p, *planes)
                return sum(jnp.sum(o) for o in out)

            g = jax.jit(jax.grad(loss))(prm)
            leaf = jax.tree_util.tree_leaves(g)[0]
            assert np.isfinite(float(jnp.sum(leaf)))

        _case(f"offset_mlp_vjp S=128 tape={tape_mode}", run, failures)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one representative case per kernel")
    ap.add_argument("--tb", action="store_true", help="print full tracebacks")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    failures = []
    t0 = time.time()
    for sweep in (sweep_ericson, sweep_bucketed_knn, sweep_mlp,
                  sweep_mlp_vjp, sweep_offset_vjp):
        try:
            sweep(failures, args.quick)
        except Exception as e:  # noqa: BLE001 — fixture/setup crash
            failures.append(f"{sweep.__name__}-setup: {type(e).__name__}")
            print(f"FAIL  {sweep.__name__} setup: {e}", flush=True)
    dt = time.time() - t0
    if failures:
        print(f"SWEEP FAILED ({len(failures)} cases, {dt:.0f}s): "
              + "; ".join(failures))
        sys.exit(1)
    print(f"SWEEP OK ({dt:.0f}s)")


if __name__ == "__main__":
    main()
