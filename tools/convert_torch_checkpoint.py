#!/usr/bin/env python
"""Convert reference PyTorch checkpoints (.pth.tar) to native .npz format.

Usage:
  python tools/convert_torch_checkpoint.py --input out/bike_bkg/checkpoint.pth.tar \
      --output out/bike_bkg/checkpoint.npz --kind bkg
  python tools/convert_torch_checkpoint.py --input out/bike_human/checkpoint.pth.tar \
      --output out/bike_human/checkpoint.npz --kind hybrid --num_offset_nets 1

Converts the reference's state-dict formats (SURVEY.md §5):
- bkg:    {epoch, iteration, optim_state_dict, coarse/fine_model_state_dict}
- hybrid: {epoch, iteration, optim_state_dict, hybrid_model_state_dict}
Optimizer state is not converted (resume restarts Adam moments).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--kind", choices=["bkg", "hybrid"], required=True)
    parser.add_argument("--depth", type=int, default=8)
    parser.add_argument("--num_offset_nets", type=int, default=1)
    parser.add_argument("--specular_can", type=lambda s: s.lower() in ("1", "true", "yes"), default=True)
    args = parser.parse_args()

    import torch

    from neuman_tpu.trainers import checkpoint as ckpt

    saved = torch.load(args.input, map_location="cpu")
    out = {
        "epoch": np.int64(saved.get("epoch", 0)),
        "iteration": np.int64(saved.get("iteration", 0)),
    }
    to_np = lambda sd: {k: v.numpy() for k, v in sd.items()}
    if args.kind == "bkg":
        out["coarse_model"] = ckpt.convert_joiner_state_dict(
            to_np(saved["coarse_model_state_dict"]), depth=args.depth,
            use_viewdirs=True,
        )
        if "fine_model_state_dict" in saved:
            out["fine_model"] = ckpt.convert_joiner_state_dict(
                to_np(saved["fine_model_state_dict"]), depth=args.depth,
                use_viewdirs=True,
            )
    else:
        out["hybrid_model"] = ckpt.convert_hybrid_state_dict(
            to_np(saved["hybrid_model_state_dict"]),
            num_offset_nets=args.num_offset_nets, depth=args.depth,
            specular_can=args.specular_can,
        )
    ckpt.save_checkpoint(args.output, out)
    print(f"converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
