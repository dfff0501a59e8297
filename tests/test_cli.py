"""End-to-end CLI tests: the full reference workflow on the synthetic scene.

train (bkg) -> train (human, loading the pretrained bkg) -> render_360
canonical -> render_test_views metrics. Each stage runs as a subprocess with
tiny settings, exactly as a user would drive it.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TINY = [
    "--nerf_depth", "2", "--nerf_width", "32", "--pos_N_freqs", "4",
    "--pos_max_freq", "3", "--dir_N_freqs", "2", "--dir_max_freq", "1",
    "--samples_per_ray", "8", "--importance_samples_per_ray", "8",
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
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_run"))


def test_cli_full_workflow(synthetic_scene_dir, smpl_data_root, workdir):
    scene = synthetic_scene_dir

    # stage 1: background
    run_cli(
        "train.py",
        [
            "--train_mode", "bkg", "--scene_dir", scene, "--name", "test_bkg",
            "--out_dir", os.path.join(workdir, "out"),
            "--rays_per_batch", "128", "--max_iter", "2", "--valid_iter", "10",
            "--dilation", "2",
        ]
        + TINY,
        smpl_data_root, workdir,
    )
    bkg_ckpt = os.path.join(workdir, "out", "test_bkg", "checkpoint.npz")
    assert os.path.isfile(bkg_ckpt)
    assert os.path.isfile(os.path.join(workdir, "out", "test_bkg", "params.json"))

    # stage 2: human (loads the pretrained background)
    run_cli(
        "train.py",
        [
            "--train_mode", "smpl_and_offset", "--scene_dir", scene,
            "--name", "test_human", "--out_dir", os.path.join(workdir, "out"),
            "--load_background", "test_bkg",
            "--rays_per_batch", "64", "--max_iter", "2", "--valid_iter", "10",
            "--dilation", "2", "--penalize_lpips", "0", "--geo_threshold", "0.3",
        ]
        + TINY,
        smpl_data_root, workdir,
    )
    human_ckpt = os.path.join(workdir, "out", "test_human", "checkpoint.npz")
    assert os.path.isfile(human_ckpt)
    # metrics were logged
    metrics_file = os.path.join(workdir, "out", "test_human", "metrics.jsonl")
    assert os.path.isfile(metrics_file)
    records = [json.loads(l) for l in open(metrics_file)]
    assert any("val_loss/total_loss" in r for r in records)

    # canonical 360 render from the trained human checkpoint
    run_cli(
        "render_360.py",
        [
            "--mode", "canonical_360", "--scene_dir", scene,
            "--weights_path", human_ckpt, "--rays_per_batch", "128",
            "--trajectory_resolution", "2",
        ]
        + TINY,
        smpl_data_root, workdir,
    )
    demo = os.path.join(
        workdir, "demo", "canonical_360", os.path.basename(scene)
    )
    pngs = sorted(os.listdir(demo))
    assert len(pngs) == 2
    import imageio.v2 as imageio

    img = imageio.imread(os.path.join(demo, pngs[0]))
    assert img.shape[2] == 3 and img.shape[0] > 0

    # test-view eval with metrics
    proc = run_cli(
        "render_test_views.py",
        [
            "--scene_dir", scene, "--weights_path", human_ckpt,
            "--rays_per_batch", "128",
        ]
        + TINY,
        smpl_data_root, workdir,
    )
    assert "psnr" in proc.stdout and "ssim" in proc.stdout
    out_dir = os.path.join(workdir, "demo", "test_views", os.path.basename(scene))
    assert len(os.listdir(out_dir)) == 1  # one test view in the split


def test_cli_optional_typed_flags_parse_to_numbers():
    """Optional[int]/Optional[float] dataclass fields must parse from the
    CLI as numbers — dataclasses stores f.type as the typing OBJECT here,
    and a string-only comparison made --render_h/--render_w parse as str
    (broke render_360 --render_h 48 with a str/int TypeError)."""
    from neuman_tpu.options import config as config_module

    opt = config_module.from_cli(
        ["--render_h", "48", "--render_w", "64", "--lrate_decay", "10"],
        mode_aware=False,
    )
    assert opt.render_h == 48 and isinstance(opt.render_h, int)
    assert opt.render_size == (48, 64)
    assert opt.lrate_decay == 10 and isinstance(opt.lrate_decay, int)


def test_run_real_parity_dry_run():
    """tools/run_real_parity.sh --dry-run must execute the full runbook
    (train a tiny checkpoint -> canonical-360 -> test-view metrics) on the
    synthetic scene, so the one-command real-data parity script stays
    green until the released assets land (VERDICT r4 task 8)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "run_real_parity.sh"),
         "--dry-run"],
        capture_output=True, text=True, timeout=1800, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    assert "DRY-RUN OK" in proc.stdout and "psnr" in proc.stdout
