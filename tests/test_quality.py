"""Self-contained image-quality gate (the reference's implicit quality bar
is eval PSNR on real scenes, render_test_views.py:27-41; no real assets are
mounted, so this gates on a multi-view-consistent RENDERABLE synthetic
scene: textured backdrop plane + true depths + a PHOTOMETRIC HUMAN — a
watertight sphere-proxy SMPL body rasterized into every frame with
view-consistent vertex colors (tests/fixtures.py), so BOTH branches have
ground truth.

Two-stage mini-train (bkg 500 iters -> human 300 iters loading the
pretrained bkg) driven through the real CLIs, then floors (ratcheted in
round 3 to within ~3-4 dB of measured so a badly-degraded trainer cannot
hide under a slack bar):
- stage-2 hybrid test view: >= 24 dB PSNR on background pixels (measured
  ~28; a broken renderer/trainer lands at 8-12) and >= the SSIM floor on
  the full view;
- human pixels: volume-rendered body opacity (acc) >= 0.85 (measured
  ~0.93; a broken warp/geometry chain gives ~0), human-region PSNR
  >= 13.5 dB AND >= background-only + 3 dB (measured ~15 vs ~8 — the
  discriminative check that the human branch ADDS correct content, not
  merely that the composite isn't catastrophic).

A second gate trains the PRODUCTION network spec (8x256, 10/4 freq bands —
the exact reference architecture, options.py:52-68) on the background
stage with fewer iters, so the real network configuration sits inside the
quality bar, not only the 4x64 miniature (measured 27.1 dB at 150 iters,
33.9 dB at 500; floor 22).

Eval-harness gotcha (cost a day of round 3): NeuManReader.read_scene
defaults bkg_range_scale to 1.1 while training (options/config.py) uses
3.0 — rendering a trained checkpoint through a scene read with the
DEFAULT gives a near/far window 3x too narrow and ~8 dB of garbage that
looks exactly like a broken trainer. Any in-process render of a trained
model must pass the training range scales.

Recorded as the regression bar in BASELINE.md.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TINY = [
    "--nerf_depth", "4", "--nerf_width", "64", "--pos_N_freqs", "6",
    "--pos_max_freq", "5", "--dir_N_freqs", "2", "--dir_max_freq", "1",
    "--samples_per_ray", "16", "--importance_samples_per_ray", "16",
]


def run_cli(script, args, data_root, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["NEUMAN_DATA_ROOT"] = data_root
    env["PYTHONPATH"] = REPO
    # 1800s: the production-spec gate measured 451s standalone but exceeded
    # a 900s cap under 1-CPU contention with a concurrent pytest run
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        capture_output=True, text=True, timeout=1800, cwd=cwd, env=env,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"{script} failed\nstdout:\n{proc.stdout[-3000:]}\n"
            f"stderr:\n{proc.stderr[-3000:]}"
        )
    return proc


@pytest.fixture(scope="module")
def renderable_setup(tmp_path_factory):
    from tests.fixtures import build_synthetic_scene

    # build_synthetic_scene points NEUMAN_DATA_ROOT at THIS scene's
    # (sphere-bodied) SMPL model; restore afterwards so later test modules
    # resolve the shared session fixture's model again
    prev = os.environ.get("NEUMAN_DATA_ROOT")
    root = tmp_path_factory.mktemp("qgate")
    scene_dir = build_synthetic_scene(
        root, renderable=True, photometric_human=True
    )
    data_root = os.path.join(str(root), "data")
    workdir = str(tmp_path_factory.mktemp("qgate_run"))
    yield scene_dir, data_root, workdir
    if prev is not None:
        os.environ["NEUMAN_DATA_ROOT"] = prev
    else:
        os.environ.pop("NEUMAN_DATA_ROOT", None)


def _psnr(a, b, mask=None):
    err = (a.astype(np.float32) - b.astype(np.float32)) ** 2
    if mask is not None:
        err = err[mask.astype(bool)]
    return -10.0 * np.log10(err.mean() / 255.0**2 + 1e-12)


@pytest.fixture(scope="module")
def trained_human(renderable_setup):
    """Two-stage mini-train through the real CLIs (bkg 500 iters -> human
    300 iters loading the pretrained bkg); shared by the quality gate and
    the reposing/gathering discriminative gates below."""
    scene_dir, data_root, workdir = renderable_setup

    run_cli(
        "train.py",
        [
            "--train_mode", "bkg", "--scene_dir", scene_dir, "--name", "qbkg",
            "--out_dir", os.path.join(workdir, "out"),
            "--rays_per_batch", "1024", "--max_iter", "500",
            "--valid_iter", "100000", "--dilation", "2",
        ]
        + TINY,
        data_root, workdir,
    )

    run_cli(
        "train.py",
        [
            "--train_mode", "smpl_and_offset", "--scene_dir", scene_dir,
            "--name", "qhuman", "--out_dir", os.path.join(workdir, "out"),
            "--load_background", "qbkg",
            "--rays_per_batch", "256", "--max_iter", "300",
            "--valid_iter", "100000", "--dilation", "2",
            "--penalize_lpips", "0", "--geo_threshold", "0.3",
            "--learning_rate", "2e-3",
        ]
        + TINY,
        data_root, workdir,
    )
    human_ckpt = os.path.join(workdir, "out", "qhuman", "checkpoint.npz")
    assert os.path.isfile(human_ckpt)
    return human_ckpt


def _human_eval_context(scene_dir, human_ckpt):
    """(spec, params, scene) for in-process renders of the trained model,
    matching the TINY training spec."""
    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
    from neuman_tpu.trainers import checkpoint as ckpt_mod

    cfg = apply_mode_defaults(NeuManConfig(), "smpl_and_offset")
    cfg.nerf_depth, cfg.nerf_width = 4, 64
    cfg.pos_N_freqs, cfg.pos_max_freq = 6, 5
    cfg.dir_N_freqs, cfg.dir_max_freq = 2, 1
    cfg.samples_per_ray = cfg.importance_samples_per_ray = 16
    spec = hn.build_human_nerf_spec(cfg)
    scene = neuman.NeuManReader.read_scene(
        scene_dir, normalize=True, smpl_type="optimized"
    )
    params = ckpt_mod.load_checkpoint(human_ckpt)["hybrid_model"]
    return spec, params, scene


def test_two_stage_quality_gate(renderable_setup, trained_human):
    import imageio.v2 as imageio

    scene_dir, data_root, workdir = renderable_setup
    human_ckpt = trained_human

    proc = run_cli(
        "render_test_views.py",
        [
            "--scene_dir", scene_dir, "--weights_path", human_ckpt,
            "--rays_per_batch", "1024",
        ]
        + TINY,
        data_root, workdir,
    )
    out_dir = os.path.join(
        workdir, "demo", "test_views", os.path.basename(scene_dir)
    )
    renders = sorted(os.listdir(out_dir))
    assert renders, "no test-view renders produced"

    # ground truth + mask for the rendered test view
    test_split = os.path.join(scene_dir, "test_split.txt")
    fname = open(test_split).read().split()[0]
    gt = imageio.imread(os.path.join(scene_dir, "images", fname))
    seg = imageio.imread(os.path.join(scene_dir, "segmentations", fname))
    bkg_mask = seg == 255  # 255 = background on disk (detectron convention)

    pred = imageio.imread(os.path.join(out_dir, renders[0]))[..., :3]
    bkg_mask3 = np.repeat(bkg_mask[..., None], 3, axis=-1)
    psnr_bkg = _psnr(pred, gt, bkg_mask3)
    assert psnr_bkg >= 24.0, f"hybrid bkg-region PSNR {psnr_bkg:.2f} < 24 dB"

    from neuman_tpu.utils.metrics import ssim as ssim_metric

    s = float(ssim_metric(gt[..., :3], pred))
    print(f"quality gate: bkg PSNR {psnr_bkg:.2f} dB, SSIM {s:.4f}")
    assert s >= 0.80, f"hybrid test-view SSIM {s:.4f} < 0.80"

    # reference-harness metrics were printed
    assert "psnr" in proc.stdout

    # ---- human-branch gate (in-process renders on the test view) ----
    import jax  # noqa: F401  (forces CPU via conftest)
    from neuman_tpu.render import renderer

    spec, params, scene = _human_eval_context(scene_dir, human_ckpt)
    i = int(fname.split(".")[0])
    cap = scene.captures[i]
    rgb, _, acc = renderer.render_hybrid_nerf(
        spec, params, cap, scene.verts[i], scene.faces, scene.Ts[i],
        rays_per_batch=1024, samples_per_ray=16,
        importance_samples_per_ray=16, geo_threshold=0.3, return_acc=True,
        knn_k=4,
    )
    bkg_only, _ = renderer.render_vanilla(
        spec.bkg, params["coarse_bkg_net"], cap,
        fine_params=params["fine_bkg_net"], rays_per_batch=1024,
        samples_per_ray=16, importance_samples_per_ray=16, return_depth=True,
    )
    hm = ~bkg_mask
    gt_f = gt.astype(np.float32) / 255.0

    def region_psnr(img):
        return -10.0 * np.log10(
            ((img[hm] - gt_f[hm]) ** 2).mean() + 1e-12
        )

    acc_mean = float(acc[hm].mean())
    p_hybrid = region_psnr(np.asarray(rgb, dtype=np.float32))
    p_bkg_only = region_psnr(np.asarray(bkg_only, dtype=np.float32))
    print(
        f"quality gate: acc {acc_mean:.3f}, human PSNR {p_hybrid:.2f}, "
        f"bkg-only {p_bkg_only:.2f}"
    )
    assert acc_mean >= 0.85, f"human body acc {acc_mean:.3f} < 0.85"
    assert p_hybrid >= 13.5, f"human-region PSNR {p_hybrid:.2f} < 13.5 dB"
    assert p_hybrid >= p_bkg_only + 3.0, (
        f"human branch adds nothing: hybrid {p_hybrid:.2f} vs "
        f"bkg-only {p_bkg_only:.2f} dB on human pixels"
    )


PRODUCTION = [
    # the exact reference network spec (options.py:52-68): 8x256 MLPs,
    # 10-freq positional / 4-freq directional encodings
    "--nerf_depth", "8", "--nerf_width", "256", "--pos_N_freqs", "10",
    "--pos_max_freq", "9", "--dir_N_freqs", "4", "--dir_max_freq", "3",
    "--samples_per_ray", "16", "--importance_samples_per_ray", "16",
]


def test_production_spec_quality_gate(renderable_setup):
    """Background stage at the PRODUCTION 8x256/10-freq spec: short train,
    then the held-out view must beat a PSNR floor. Catches regressions that
    only manifest at the real network configuration (skip-concat indexing,
    PE band count, head wiring) which the 4x64 miniature cannot see.
    Calibrated: 27.1 dB at these settings (33.9 at 500 iters); a broken
    trainer/renderer lands at 8-12 dB."""
    import imageio.v2 as imageio

    scene_dir, data_root, workdir = renderable_setup

    run_cli(
        "train.py",
        [
            "--train_mode", "bkg", "--scene_dir", scene_dir, "--name", "qprod",
            "--out_dir", os.path.join(workdir, "out"),
            "--rays_per_batch", "1024", "--max_iter", "150",
            "--valid_iter", "100000", "--dilation", "2",
        ]
        + PRODUCTION,
        data_root, workdir,
    )
    ckpt_path = os.path.join(workdir, "out", "qprod", "checkpoint.npz")
    assert os.path.isfile(ckpt_path)

    from neuman_tpu.data_io import neuman
    from neuman_tpu.models import human_nerf as hn
    from neuman_tpu.options.config import NeuManConfig, apply_mode_defaults
    from neuman_tpu.render import renderer
    from neuman_tpu.trainers import checkpoint as ckpt_mod

    cfg = apply_mode_defaults(NeuManConfig(), "bkg")
    spec = hn.build_human_nerf_spec(cfg)
    # range scales MUST match training's (see module docstring): the
    # read_scene defaults give a 3x-too-narrow near/far window
    scene = neuman.NeuManReader.read_scene(
        scene_dir, normalize=True, smpl_type="optimized",
        bkg_range_scale=cfg.bkg_range_scale,
        human_range_scale=cfg.human_range_scale,
    )
    loaded = ckpt_mod.load_checkpoint(ckpt_path)
    fname = open(os.path.join(scene_dir, "test_split.txt")).read().split()[0]
    cap = scene.captures[int(fname.split(".")[0])]
    rgb, _ = renderer.render_vanilla(
        spec.bkg, loaded["coarse_model"], cap,
        fine_params=loaded.get("fine_model"), rays_per_batch=1024,
        samples_per_ray=16, importance_samples_per_ray=16, return_depth=True,
        compute_dtype_name="float32",
    )
    gt = imageio.imread(os.path.join(scene_dir, "images", fname))
    seg = imageio.imread(os.path.join(scene_dir, "segmentations", fname))
    bkg_mask3 = np.repeat((seg == 255)[..., None], 3, axis=-1)
    pred = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
    p = _psnr(pred, gt, bkg_mask3)
    print(f"production-spec gate: bkg PSNR {p:.2f} dB")
    assert p >= 22.0, f"production-spec bkg PSNR {p:.2f} < 22 dB"


# ---------------------------------------------------------------------------
# Discriminative gates for the reposing + gathering paths (VERDICT r3 task 7).
# The shape/finiteness tests in test_reposing_gathering.py would pass for a
# renderer that drew zero actors; these gates use the TRAINED mini model and
# assert the actors are actually drawn, in the right place, with the right
# content. Ref paths: render_reposing.py:95-124, render_utils.py:365-461.
# ---------------------------------------------------------------------------


def _silhouette(verts, faces, cap):
    from neuman_tpu.render.rasterize import rasterize_mesh

    rgba = rasterize_mesh(np.asarray(verts), np.asarray(faces[:, :3]), cap)
    return rgba[..., 3] > 0.5


def _iou(a, b):
    a = a.astype(bool)
    b = b.astype(bool)
    return (a & b).sum() / max((a | b).sum(), 1)


def test_reposing_silhouette_gate(renderable_setup, trained_human):
    """Reposed render must DRAW the body where the mocap puts it: the
    volume-rendered opacity mask (acc > 0.5) tracks the rasterized
    reposed-mesh silhouette per frame, and tracks its OWN frame's
    silhouette better than the other frame's (the two mocap frames are
    deliberately displaced laterally)."""
    import render_reposing
    from neuman_tpu.options.config import NeuManConfig
    from neuman_tpu.render import renderer

    scene_dir, data_root, workdir = renderable_setup
    spec, params, scene = _human_eval_context(scene_dir, trained_human)

    rng = np.random.default_rng(7)
    poses = rng.normal(size=(2, 156)).astype(np.float64) * 0.05
    trans = np.array([[0.0, 0.0, 0.0], [0.25, 0.0, 0.0]])
    mocap = os.path.join(workdir, "gate_motion.npz")
    np.savez(mocap, poses=poses, trans=trans)

    cfg = NeuManConfig(
        scene_dir=scene_dir, motion_name="gate_motion", mocap_path=mocap,
        mocap_start=0, mocap_end=2, mocap_skip=1, offset_scale=1.0,
    )
    raw_verts, ts_list = render_reposing.read_human_poses(cfg, scene)
    caps = render_reposing.read_novel_caps(cfg, 2, scene)

    sils, accs = [], []
    for f in range(2):
        _, _, acc = renderer.render_hybrid_nerf(
            spec, params, caps[f], raw_verts[f], scene.faces, ts_list[f],
            rays_per_batch=1024, samples_per_ray=16,
            importance_samples_per_ray=16, geo_threshold=0.3,
            return_acc=True, knn_k=4,
        )
        sils.append(_silhouette(raw_verts[f], scene.faces, caps[f]))
        accs.append(np.asarray(acc) > 0.5)

    for f in range(2):
        assert sils[f].sum() > 20, f"reposed mesh frame {f} not in view"
        iou_own = _iou(accs[f], sils[f])
        iou_other = _iou(accs[f], sils[1 - f])
        print(
            f"reposing gate frame {f}: IoU(own) {iou_own:.3f}, "
            f"IoU(other) {iou_other:.3f}"
        )
        assert iou_own >= 0.45, (
            f"frame {f}: opacity mask does not track the reposed mesh "
            f"(IoU {iou_own:.3f})"
        )
        assert iou_own > iou_other, (
            f"frame {f}: opacity does not follow the mocap displacement"
        )


def test_gathering_composite_gate(renderable_setup, trained_human):
    """Multi-actor composite: actor 1 sits at its ground-truth scene pose
    (same discriminative bar as the single-human gate: beats the
    background-only render by >= 3 dB on its pixels); actor 2 is a
    translated copy that must (a) visibly appear inside its rasterized
    silhouette, (b) agree with the single-actor renderer on those pixels,
    and (c) NOT contaminate pixels outside both actors."""
    import imageio.v2 as imageio
    from scipy.ndimage import binary_dilation

    from neuman_tpu.render import renderer

    scene_dir, data_root, workdir = renderable_setup
    spec, params, scene = _human_eval_context(scene_dir, trained_human)

    fname = open(os.path.join(scene_dir, "test_split.txt")).read().split()[0]
    i = int(fname.split(".")[0])
    cap = scene.captures[i]
    gt = imageio.imread(
        os.path.join(scene_dir, "images", fname)
    ).astype(np.float32)[..., :3] / 255.0
    seg = imageio.imread(os.path.join(scene_dir, "segmentations", fname))
    hm = seg != 255  # human pixels (detectron convention: 255 = background)

    v1, t1 = np.asarray(scene.verts[i]), np.asarray(scene.Ts[i])
    offset = 0.35 * np.asarray(cap.cam_pose.right)
    v2 = v1 + offset
    # Ts maps canonical -> posed per vertex; the translated actor's map is
    # Tr(offset) @ T so its warp lands in the SAME canonical body
    shift = np.eye(4, dtype=t1.dtype)
    shift[:3, 3] = offset
    t2 = np.einsum("ij,vjk->vik", shift, t1)
    sil2 = _silhouette(v2, scene.faces, cap)
    assert sil2.sum() > 20, "actor 2 not in view; adjust the offset"

    comp = np.asarray(
        renderer.render_hybrid_nerf_multi_persons(
            spec, params, cap, [spec, spec], [params, params], [v1, v2],
            [scene.faces, scene.faces], [t1, t2],
            rays_per_batch=1024, samples_per_ray=16,
            importance_samples_per_ray=16, geo_threshold=0.3, knn_k=4,
        ),
        dtype=np.float32,
    )
    bkg_only = np.asarray(
        renderer.render_vanilla(
            spec.bkg, params["coarse_bkg_net"], cap,
            fine_params=params["fine_bkg_net"], rays_per_batch=1024,
            samples_per_ray=16, importance_samples_per_ray=16,
            return_depth=True,
        )[0],
        dtype=np.float32,
    )
    single2 = np.asarray(
        renderer.render_hybrid_nerf(
            spec, params, cap, v2, scene.faces, t2, rays_per_batch=1024,
            samples_per_ray=16, importance_samples_per_ray=16,
            geo_threshold=0.3, knn_k=4,
        ),
        dtype=np.float32,
    )

    def region_psnr(img, region):
        return -10.0 * np.log10(((img[region] - gt[region]) ** 2).mean() + 1e-12)

    # actor 2 may legitimately occlude part of actor 1; grade actor 1 only
    # on its unoccluded GT pixels
    hm_vis = hm & ~binary_dilation(sil2, iterations=1)
    assert hm_vis.sum() > 20, "actors fully overlap; adjust the offset"
    p_comp = region_psnr(comp, hm_vis)
    p_bkg = region_psnr(bkg_only, hm_vis)
    d2 = np.abs(comp - bkg_only)[sil2].mean()
    p_c2 = -10.0 * np.log10(((comp[sil2] - single2[sil2]) ** 2).mean() + 1e-12)
    outside = ~(
        binary_dilation(sil2, iterations=2) | binary_dilation(hm, iterations=2)
    )
    d_out = np.abs(comp - bkg_only)[outside].mean()
    print(
        f"gathering gate: actor1 PSNR {p_comp:.2f} (bkg-only {p_bkg:.2f}), "
        f"actor2 delta {d2:.3f}, actor2-vs-single PSNR {p_c2:.2f}, "
        f"outside delta {d_out:.4f}"
    )
    # absolute floor is looser than the single-human gate's 13.5: each run
    # retrains 300 iters and the composite lands 12.5-15 dB run-to-run;
    # the discriminative +3 dB margin below is the real gate
    assert p_comp >= 11.5, f"actor-1 region PSNR {p_comp:.2f} < 11.5 dB"
    assert p_comp >= p_bkg + 3.0, (
        f"actor 1 adds nothing over background-only "
        f"({p_comp:.2f} vs {p_bkg:.2f} dB)"
    )
    assert d2 >= 0.05, f"actor 2 not drawn (mean |delta| {d2:.3f} vs bkg-only)"
    assert p_c2 >= 15.0, (
        f"composite disagrees with the single-actor render on actor-2 "
        f"pixels ({p_c2:.2f} dB)"
    )
    assert d_out <= 0.01, (
        f"actors contaminate background pixels (mean |delta| {d_out:.4f})"
    )


def test_lpips_patch_path_trains(renderable_setup):
    """CLI-driven training exercises the LPIPS patch path end to end:
    patch sampling (32x32 leading block) -> perceptual loss -> gradients.

    The main quality gate trains with --penalize_lpips 0 and train.py
    silently disables the loss without weights, so before this test no
    CI training ever ran the path (the reference default TRAINS with it,
    train.py:203, human_nerf_trainer.py:432-435). Calibrated AlexNet
    weights are environment-blocked; a random-init fixture
    (init_lpips_params) exercises identical code/FLOPs — only the values
    differ, which this test does not assert."""
    import jax

    scene_dir, data_root, workdir = renderable_setup

    from neuman_tpu.models.lpips import init_lpips_params
    from neuman_tpu.trainers.checkpoint import save_checkpoint

    fixture = os.path.join(workdir, "lpips_fixture.npz")
    save_checkpoint(fixture, init_lpips_params(jax.random.PRNGKey(0)))

    out_dir = os.path.join(workdir, "out")
    run_cli(
        "train.py",
        [
            "--train_mode", "smpl_and_offset", "--scene_dir", scene_dir,
            "--name", "qlpips", "--out_dir", out_dir,
            # > PATCH_SIZE_SQUARED=1024 rays so the leading 32x32 patch fits
            "--rays_per_batch", "1100", "--max_iter", "25",
            "--valid_iter", "100000", "--dilation", "2",
            "--penalize_lpips", "0.01", "--lpips_weights", fixture,
            "--geo_threshold", "0.3", "--learning_rate", "2e-3",
        ]
        + TINY,
        data_root, workdir,
    )
    metrics_path = os.path.join(out_dir, "qlpips", "metrics.jsonl")
    lpips_vals = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss/lpips_loss" in rec:
                lpips_vals.append(rec["train_loss/lpips_loss"])
                assert np.isfinite(rec["train_loss/total_loss"])
    assert lpips_vals, "no lpips_loss records in metrics.jsonl"
    # patch draws are stochastic (~body_ratio chance per step) but over the
    # logged iterations at least one must have fired with a nonzero loss
    assert max(lpips_vals) > 0.0, lpips_vals
    assert os.path.isfile(os.path.join(out_dir, "qlpips", "checkpoint.npz"))
