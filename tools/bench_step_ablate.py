"""Marginal cost of each human-step loss family, measured on the FULL step.

Runs bench.bench_human_train_step repeatedly, each time zeroing one loss
family's weight via a config hook (the families the reference schedules in
human_nerf_trainer.py:366-435), and reports full-objective minus ablated —
the honest marginal cost including the backward pass and anything XLA can
no longer fuse/share once the family is gone. Used to keep BASELINE.md's
train-step decomposition tied to the step users actually run.

Usage: python tools/bench_step_ablate.py [family ...]
Families: full lpips shape sym color sparsity mask patch
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ABLATIONS = {
    "full": {},
    "lpips": {"penalize_lpips": 0.0},
    "shape": {"penalize_smpl_alpha": 0.0, "penalize_dummy": 0.0},
    "sym": {"penalize_symmetric_alpha": 0.0},
    "color": {"penalize_color_range": 0.0},
    "sparsity": {"penalize_sharp_edge": 0.0, "penalize_hard_surface": 0.0},
    "mask": {"penalize_mask": 0.0},
}


def main():
    import bench
    from neuman_tpu.options import config as config_mod

    orig = config_mod.apply_mode_defaults
    overrides = {}

    def hooked(cfg, mode):
        cfg = orig(cfg, mode)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        return cfg

    config_mod.apply_mode_defaults = hooked
    which = sys.argv[1:] or list(ABLATIONS)
    results = {}
    for name in which:
        overrides.clear()
        overrides.update(ABLATIONS[name])
        ms = bench.bench_human_train_step()
        results[name] = ms
        base = results.get("full")
        marg = f"  (marginal {base - ms:+.1f} ms)" if base and name != "full" else ""
        print(f"{name}: {ms:.1f} ms/step{marg}", flush=True)


if __name__ == "__main__":
    main()
