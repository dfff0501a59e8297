"""Targeted TPU drive: compile the hbm-tape kernels at the tilings that
VMEM-OOMed on v5e (round-5 unattended log: the tape-emitting forward in
raymarch.py hit 16.04M/16M scoped VMEM at TN=1024 f32; the offset-net
forward in raymarch_vjp.py hit 16.79M/16M).

Runs value_and_grad through make_mlp_vjp(tape_mode="hbm") (both dir
modes) and make_offset_mlp_vjp(tape_mode="hbm") on the real chip at
S=128 / rays_per_tile=8 — the exact per-tile shapes of the failing
compiles. rc=0 iff every compile + execute succeeds and hbm grads match
recompute grads.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from neuman_tpu.models import nerf as nerf_module
from neuman_tpu.models.embedder import make_embedder
from neuman_tpu.ops.pallas import raymarch_vjp

R, S = 64, 128  # tn = rays_per_tile*S: 1024 uncapped -> 512 under the fix


def _joiner_spec():
    pos_pe = make_embedder(3, 9, 10, mapping="posenc")
    dir_pe = make_embedder(3, 3, 4, mapping="posenc")
    nspec = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos_pe.out_dim,
        input_ch_views=dir_pe.out_dim, use_viewdirs=True,
    )
    return nerf_module.JoinerSpec(pos_pe=pos_pe, dir_pe=dir_pe, nerf=nspec)


def _grads(f, params, *args):
    def loss(p):
        out = f(p, *args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x * x) for x in leaves)

    v, g = jax.value_and_grad(loss)(params)
    return float(v), g


def _check(tag, builds, params, *args):
    outs = {}
    for tape, f in builds.items():
        v, g = _grads(jax.jit(f), params, *args)
        outs[tape] = g
        print(f"{tag} tape={tape}: loss={v:.6f} compile+run OK", flush=True)
    ga = jax.tree_util.tree_leaves(outs["recompute"])
    gb = jax.tree_util.tree_leaves(outs["hbm"])
    for i, (a, b) in enumerate(zip(ga, gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"{tag} grad leaf {i}",
        )
    print(f"{tag}: hbm grads == recompute grads", flush=True)


def main():
    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    rng = np.random.default_rng(0)
    spec = _joiner_spec()
    params = nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf)
    planes = [jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
              for _ in range(3)]
    d = rng.normal(size=(R, S, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dir_planes = [jnp.asarray(d[..., a], jnp.float32) for a in range(3)]
    dirp = jnp.asarray(rng.normal(size=(R, spec.nerf.width // 2)), jnp.float32)

    for per_sample in (True, False):
        builds = {
            tape: raymarch_vjp.make_mlp_vjp(
                spec, jnp.float32, rays_per_tile=8, per_sample=per_sample,
                tape_mode=tape,
            )
            for tape in ("recompute", "hbm")
        }
        args = tuple(dir_planes) if per_sample else (dirp,)
        _check(f"mlp per_sample={per_sample}", builds, params, *planes, *args)

    pos_pe4 = make_embedder(4, 9, 10, mapping="posenc")
    onspec = nerf_module.NeRFSpec(
        depth=8, width=256, input_ch=pos_pe4.out_dim, input_ch_views=0,
        output_ch=3, use_viewdirs=False, scale_type="linear",
    )
    ospec = nerf_module.OffsetNetSpec(pos_pe=pos_pe4, nerf=onspec)
    oparams = nerf_module.init_nerf_params(jax.random.PRNGKey(1), onspec)
    oplanes = [jnp.asarray(rng.normal(size=(R, S)), jnp.float32)
               for _ in range(4)]
    builds = {
        tape: raymarch_vjp.make_offset_mlp_vjp(
            ospec, jnp.float32, rays_per_tile=8, tape_mode=tape,
        )
        for tape in ("recompute", "hbm")
    }
    _check("offset", builds, oparams, *oplanes)
    print("VERIFY_TAPE_VMEM: all compiles + parity OK", flush=True)


if __name__ == "__main__":
    main()
