"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuman_tpu.parallel.mesh import make_mesh, shard_leading_axis, put_replicated


def test_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    mesh4 = make_mesh(4)
    assert mesh4.devices.size == 4


def test_sharded_computation_matches_single_device():
    mesh = make_mesh(8)

    @jax.jit
    def f(x, w):
        x = shard_leading_axis(x, mesh)
        return jnp.tanh(x @ w).sum(axis=1)

    x = jnp.arange(64 * 16, dtype=jnp.float32).reshape(64, 16) / 100
    w = jnp.ones((16, 8)) * 0.01
    out = f(x, w)
    expected = np.tanh(np.asarray(x) @ np.asarray(w)).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape == (128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_bkg_train_step_sharded_matches_unsharded():
    """Sharding the ray axis must not change the math."""
    from neuman_tpu.models import nerf as nerf_module
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
    from neuman_tpu.parallel.dryrun import synthetic_arrays
    from neuman_tpu.trainers.background import make_bkg_train_step, make_optimizer

    cfg = apply_mode_defaults(NeuManConfig(), "bkg")
    cfg.nerf_depth = 2
    cfg.nerf_width = 32
    cfg.pos_N_freqs = 4
    cfg.pos_max_freq = 3
    cfg.dir_N_freqs = 2
    cfg.dir_max_freq = 1
    cfg.samples_per_ray = 8
    cfg.importance_samples_per_ray = 8
    cfg.rays_per_batch = 64

    arrays = synthetic_arrays(num_views=4)
    spec = nerf_module.build_nerf_specs(cfg)
    params = {
        "coarse": nerf_module.init_nerf_params(jax.random.PRNGKey(0), spec.nerf),
        "fine": nerf_module.init_nerf_params(jax.random.PRNGKey(1), spec.nerf),
    }
    optimizer = make_optimizer()

    def run(mesh):
        # the train step donates its input state; give each run fresh buffers
        p = jax.tree_util.tree_map(jnp.array, params)
        state = {
            "params": p,
            "opt_state": optimizer.init(p),
            "iteration": jnp.int32(0),
            "rng": jax.random.PRNGKey(7),
        }
        step = make_bkg_train_step(
            spec, cfg, arrays, [0, 1, 2, 3], optimizer, mesh=mesh
        )
        state, metrics = step(state)
        return float(metrics["total_loss"]), state

    loss_single, state_single = run(None)
    loss_sharded, state_sharded = run(make_mesh(8))
    assert np.isclose(loss_single, loss_sharded, rtol=1e-4)
    w_s = np.asarray(state_single["params"]["coarse"]["pts_linears"][0]["w"])
    w_m = np.asarray(state_sharded["params"]["coarse"]["pts_linears"][0]["w"])
    np.testing.assert_allclose(w_s, w_m, atol=1e-5)


def test_human_train_step_sharded_matches_unsharded():
    """The flagship human step — per-batch scalar cap_id, strata/patch
    logic, mesh queries, Adam — must be invariant to sharding the ray axis
    over the 8-device mesh, over multiple steps (losses AND all params)."""
    from neuman_tpu.parallel.dryrun import dryrun_human_equality

    eq = dryrun_human_equality(8, steps=2)
    assert eq["max_param_abs_diff"] <= 1e-5
    np.testing.assert_allclose(
        eq["loss_sharded"], eq["loss_unsharded"], rtol=1e-4
    )


def test_mesh_sharded_render_matches_single_device():
    """Full-image render sharded over the 8-device mesh == unsharded."""
    import numpy as np

    from tests.test_render import tiny_cap, tiny_opt
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer

    opt = tiny_opt()
    spec = hn.build_human_nerf_spec(opt)
    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    cap = tiny_cap(h=16, w=16)  # 256 rays, divisible by 8
    kw = dict(
        fine_params=params["fine_bkg_net"], rays_per_batch=256,
        samples_per_ray=8, importance_samples_per_ray=8, return_depth=True,
        compute_dtype_name="float32",
    )
    rgb1, d1 = renderer.render_vanilla(
        spec.bkg, params["coarse_bkg_net"], cap, **kw
    )
    rgb8, d8 = renderer.render_vanilla(
        spec.bkg, params["coarse_bkg_net"], cap, mesh=make_mesh(8), **kw
    )
    np.testing.assert_allclose(rgb8, rgb1, atol=1e-5)
    np.testing.assert_allclose(d8, d1, atol=1e-4)


def _human_render_setup():
    from tests.test_render import tiny_cap, tiny_opt
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.models import smpl as smpl_module

    opt = tiny_opt()
    spec = hn.build_human_nerf_spec(opt)
    body = smpl_module.synthetic_smpl_model(num_verts=64, num_joints=6)
    n = 3
    rng = np.random.default_rng(0)
    params = hn.init_human_nerf_params(
        jax.random.PRNGKey(0), spec,
        rng.normal(size=(n, 18)).astype(np.float32) * 0.1,
        rng.normal(size=(n, 10)).astype(np.float32) * 0.1,
        np.tile(np.eye(4, dtype=np.float32)[None], (n, 1, 1)),
    )
    da = hn.da_pose_params(6)
    wv, t = hn.vertex_forward(spec, params, body, da, scale=1.0, idx=0)
    verts = np.asarray(wv[0])
    Ts = np.asarray(t[0])
    faces = np.concatenate([body.faces, body.faces], axis=1)
    cap = tiny_cap(h=16, w=16)  # 256 rays; chunks of 64 divide the mesh
    return spec, params, cap, verts, faces, Ts


@pytest.mark.parametrize("dispatch", ["compact", "scan"])
def test_mesh_sharded_hybrid_render_matches_single_device(dispatch):
    """render_hybrid_nerf (the render_test_views/360/reposing path, ref
    render_utils.py:249-362) sharded over the 8-device mesh == unsharded,
    for both frame-level dispatch protocols."""
    from neuman_tpu.render import renderer

    spec, params, cap, verts, faces, Ts = _human_render_setup()
    kw = dict(
        rays_per_batch=64, samples_per_ray=8, importance_samples_per_ray=8,
        geo_threshold=0.3, knn_k=4, compute_dtype_name="float32",
        return_depth=True, return_acc=True, dispatch=dispatch,
    )
    out1 = renderer.render_hybrid_nerf(
        spec, params, cap, verts, faces, Ts, **kw
    )
    out8 = renderer.render_hybrid_nerf(
        spec, params, cap, verts, faces, Ts, mesh=make_mesh(8), **kw
    )
    for a, b, name in zip(out8, out1, ("rgb", "depth", "acc")):
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_mesh_sharded_multi_person_render_matches_single_device():
    """render_hybrid_nerf_multi_persons (ref render_utils.py:365-461)
    sharded over the 8-device mesh == unsharded."""
    from neuman_tpu.render import renderer

    spec, params, cap, verts, faces, Ts = _human_render_setup()
    actors = dict(
        human_specs=[spec, spec],
        human_params_list=[params, params],
        posed_verts_list=[verts, verts + np.array([0.6, 0, 0], np.float32)],
        faces_list=[faces, faces],
        Ts_list=[Ts, Ts],
    )
    kw = dict(
        rays_per_batch=64, samples_per_ray=8, importance_samples_per_ray=8,
        geo_threshold=0.3, knn_k=4, compute_dtype_name="float32",
        return_depth=True,
    )
    rgb1, d1 = renderer.render_hybrid_nerf_multi_persons(
        spec, params, cap, **actors, **kw
    )
    rgb8, d8 = renderer.render_hybrid_nerf_multi_persons(
        spec, params, cap, mesh=make_mesh(8), **actors, **kw
    )
    np.testing.assert_allclose(rgb8, rgb1, atol=1e-5)
    np.testing.assert_allclose(d8, d1, atol=1e-4)


def test_indivisible_chunk_warns_unsharded():
    """A chunk size not divisible by the mesh size must renderer-warn (the
    silent fallback was a quiet perf cliff) and still produce correct
    pixels."""
    import warnings as _warnings

    from tests.test_render import tiny_cap, tiny_opt
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.render import renderer

    opt = tiny_opt()
    spec = hn.build_human_nerf_spec(opt)
    params = hn.init_human_nerf_params(jax.random.PRNGKey(0), spec)
    cap = tiny_cap(h=10, w=10)
    kw = dict(
        fine_params=params["fine_bkg_net"], rays_per_batch=50,
        samples_per_ray=8, importance_samples_per_ray=8,
        compute_dtype_name="float32",
    )
    rgb1 = renderer.render_vanilla(spec.bkg, params["coarse_bkg_net"], cap, **kw)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        rgb8 = renderer.render_vanilla(
            spec.bkg, params["coarse_bkg_net"], cap, mesh=make_mesh(8), **kw
        )
    assert any("UNSHARDED" in str(w.message) for w in rec), [
        str(w.message) for w in rec
    ]
    np.testing.assert_allclose(rgb8, rgb1, atol=1e-5)
