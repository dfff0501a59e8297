"""Marginal cost of each human-step loss family, measured on the FULL step.

Runs bench.bench_human_train_step repeatedly, each time zeroing one loss
family's weight via a config hook (the families the reference schedules in
human_nerf_trainer.py:366-435), and reports full-objective minus ablated —
the honest marginal cost including the backward pass and anything XLA can
no longer fuse/share once the family is gone. Used to keep BASELINE.md's
train-step decomposition tied to the step users actually run.

Each family runs in its own subprocess: benching several configs in one
process measured 10x degradations on the later ones (device memory filling
with the live jit caches of earlier configs), so in-process sequencing
produces garbage marginals.

Usage: python tools/bench_step_ablate.py [family ...]
Families: full lpips shape sym color sparsity mask
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ABLATIONS = {
    "full": {},
    "lpips": {"penalize_lpips": 0.0},
    "shape": {"penalize_smpl_alpha": 0.0, "penalize_dummy": 0.0},
    "sym": {"penalize_symmetric_alpha": 0.0},
    "color": {"penalize_color_range": 0.0},
    "sparsity": {"penalize_sharp_edge": 0.0, "penalize_hard_surface": 0.0},
    "mask": {"penalize_mask": 0.0},
}


def run_one(name):
    """Run ONE ablation in this process and print its ms/step."""
    import bench
    from neuman_tpu.options import config as config_mod

    orig = config_mod.apply_mode_defaults
    overrides = ABLATIONS[name]

    def hooked(cfg, mode):
        cfg = orig(cfg, mode)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg

    config_mod.apply_mode_defaults = hooked
    print(f"RESULT {name} {bench.bench_human_train_step():.2f}", flush=True)


def main():
    which = sys.argv[1:] or list(ABLATIONS)
    results = {}
    for name in which:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            cwd=REPO, capture_output=True, text=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if proc.returncode != 0 or not line:
            print(f"{name}: FAILED\n{proc.stderr[-1500:]}")
            continue
        ms = float(line[-1].split()[-1])
        results[name] = ms
        base = results.get("full")
        marg = f"  (marginal {base - ms:+.1f} ms)" if base and name != "full" else ""
        print(f"{name}: {ms:.1f} ms/step{marg}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
