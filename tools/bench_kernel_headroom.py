"""Fused render-kernel PE headroom study (ROADMAP #4).

The fused kernel runs at ~76% in-kernel MXU utilization; the serial VPU
work is dominated by the positional encoding's 60+54 transcendental rows
per sample (fused.pe_rows). This tool measures the kernel's ceiling with
three PE variants, WITHOUT touching production code (pe_rows is
monkeypatched for the experiment):

  real     — production sin/cos per band (the parity baseline)
  doubling — double-angle recurrence: one sin/cos pair at the base band,
             then s' = 2sc, c' = (c-s)(c+s) per octave (bands are
             consecutive powers of two for the reference config) —
             ~4 VPU FMAs per band instead of 2 transcendentals
  notrig   — same shapes from multiplies only (the no-transcendental
             ceiling; NOT numerically meaningful, a pure speed bound)

Usage: python tools/bench_kernel_headroom.py [--rays 32768 --samples 128]
Protocol: lax.scan over varied inputs, scalar readback (BASELINE.md).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pe_rows_doubling(spec, axes_cn, bvals=None):
    import jax.numpy as jnp

    bands = [float(f) for f in spec.freq_bands]
    if spec.mapping == "rotate":
        if bvals is None:
            bvals = jnp.asarray(
                np.array(spec.bvals, dtype=np.float32).reshape(-1, 3)
            )
        # rotate bvals already bake the frequency scaling into the basis;
        # fall back to real trig (the rotate config has no octave ladder)
        proj = jnp.tensordot(bvals, axes_cn, axes=[[1], [0]])
        blocks = [jnp.sin(proj), jnp.cos(proj)]
        if spec.include_input:
            blocks = [axes_cn] + blocks
        return jnp.concatenate(blocks, axis=0)
    # check the octave-ladder property
    ladder = all(
        abs(bands[i + 1] - 2.0 * bands[i]) < 1e-6
        for i in range(len(bands) - 1)
    )
    assert ladder, f"bands are not an octave ladder: {bands}"
    blocks = [axes_cn] if spec.include_input else []
    s = jnp.sin(axes_cn * bands[0])
    c = jnp.cos(axes_cn * bands[0])
    blocks.append(s)
    blocks.append(c)
    for _ in range(len(bands) - 1):
        s, c = 2.0 * s * c, (c - s) * (c + s)
        blocks.append(s)
        blocks.append(c)
    return jnp.concatenate(blocks, axis=0)


def pe_rows_notrig(spec, axes_cn, bvals=None):
    import jax.numpy as jnp

    if spec.mapping == "rotate":
        if bvals is None:
            bvals = jnp.asarray(
                np.array(spec.bvals, dtype=np.float32).reshape(-1, 3)
            )
        proj = jnp.tensordot(bvals, axes_cn, axes=[[1], [0]])
        blocks = [proj * 0.5, proj * 0.25]
        if spec.include_input:
            blocks = [axes_cn] + blocks
        return jnp.concatenate(blocks, axis=0)
    blocks = [axes_cn] if spec.include_input else []
    for f in spec.freq_bands:
        blocks.append(axes_cn * (0.1 * float(f)))
        blocks.append(axes_cn * (0.2 * float(f)))
    return jnp.concatenate(blocks, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=32768)
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--importance", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rays_per_tile", type=int, default=16)
    ap.add_argument("--accuracy", action="store_true",
                    help="also report doubling-vs-real PE max abs error")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neuman_tpu.models import nerf as nerf_module
    from neuman_tpu.options.config import NeuManConfig
    from neuman_tpu.ops import fused
    from neuman_tpu.ops.pallas.raymarch import make_fused_render

    cfg = NeuManConfig()
    spec = nerf_module.build_nerf_specs(cfg)
    key = jax.random.PRNGKey(0)
    coarse = nerf_module.init_nerf_params(key, spec.nerf)
    fine = nerf_module.init_nerf_params(jax.random.fold_in(key, 1), spec.nerf)
    R, S, I = args.rays, args.samples, args.importance

    if args.accuracy:
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-3.2, 3.2, (3, 4096)).astype(np.float32)
        )
        real = fused.pe_rows(spec.pos_pe, x)
        dbl = pe_rows_doubling(spec.pos_pe, x)
        err = jnp.max(jnp.abs(real - dbl))
        print(f"doubling-vs-real PE max abs err (|x|<=3.2): {float(err):.3e}")

    rng = np.random.default_rng(0)
    origins = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    near = jnp.full((R, 1), 0.5)
    far = jnp.full((R, 1), 4.0)

    variants = [
        ("real", fused.pe_rows),
        ("doubling", pe_rows_doubling),
        ("notrig", pe_rows_notrig),
    ]
    orig = fused.pe_rows
    for name, fn in variants:
        fused.pe_rows = fn
        try:
            render_chunk = make_fused_render(spec, S, I, jnp.bfloat16,
                                             rays_per_tile=args.rays_per_tile)

            @jax.jit
            def run(o0):
                def body(carry, i):
                    rgb, depth = render_chunk(
                        coarse, fine, o0 + (i + carry * 1e-20) * 1e-5,
                        dirs, near, far,
                    )
                    return carry + jnp.sum(rgb) + jnp.sum(depth), 0.0
                c, _ = jax.lax.scan(
                    body, 0.0, jnp.arange(args.iters, dtype=jnp.float32)
                )
                return c

            float(run(origins))  # compile
            ts = []
            for i in range(3):
                o2 = origins + (i + 1) * 1e-6
                t0 = time.time()
                float(run(o2))
                ts.append((time.time() - t0) / args.iters)
            dt = sorted(ts)[1]
            rs = R * (S + S + I)  # coarse S + fine (S+I) samples
            print(f"{name:9s}: {dt * 1e3:7.2f} ms/chunk  "
                  f"{rs / dt / 1e6:7.1f}M ray-samples/s", flush=True)
        finally:
            fused.pe_rows = orig


if __name__ == "__main__":
    main()
