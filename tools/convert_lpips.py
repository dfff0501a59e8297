#!/usr/bin/env python
"""Port LPIPS(Alex) weights from the pip `lpips` package to data/lpips_alex.npz.

Run once in an environment that has the `lpips` package (and its cached
weights); the output file enables the LPIPS patch loss and eval metric.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import lpips as lpips_pkg  # requires the pip package + cached weights
    import torch

    from neuman_tpu.models.lpips import convert_torch_lpips
    from neuman_tpu.trainers.checkpoint import save_checkpoint

    net = lpips_pkg.LPIPS(net="alex")
    sd = {k: v for k, v in net.state_dict().items()}
    params = convert_torch_lpips(sd)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "lpips_alex.npz",
    )
    save_checkpoint(out, params)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
