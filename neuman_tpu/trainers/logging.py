"""Training metrics/observability.

Keeps the reference's datapack/pusher abstraction
(trainers/tensorboard_helper.py:10-101): scalars/images/text collected into a
`TensorboardDatapack` and pushed per iteration. Backends: tensorboardX when
available, always mirrored to a `metrics.jsonl` (one JSON object per push)
so headless/TPU-pod runs have greppable telemetry, plus a steps/sec and
ray-samples/sec counter (the BASELINE metric) as first-class scalars.
"""

import json
import os
import time


class TensorboardDatapack:
    SCALAR_NAME = "scalar"
    HISTOGRAM_NAME = "histogram"
    IMAGE_NAME = "image"
    TEXT_NAME = "text"

    def __init__(self):
        self.datapack = {
            self.SCALAR_NAME: {},
            self.HISTOGRAM_NAME: {},
            self.IMAGE_NAME: {},
            self.TEXT_NAME: {},
        }
        self.training = True
        self.iteration = 0

    def set_training(self, training):
        self.training = training

    def set_iteration(self, iteration):
        self.iteration = iteration

    def add_scalar(self, d):
        self.datapack[self.SCALAR_NAME].update(d)

    def add_histogram(self, d):
        self.datapack[self.HISTOGRAM_NAME].update(d)

    def add_image(self, d):
        self.datapack[self.IMAGE_NAME].update(d)

    def add_text(self, d):
        self.datapack[self.TEXT_NAME].update(d)


class MetricsPusher:
    """tensorboardX (optional) + jsonl metrics sink."""

    def __init__(self, opt=None, tb_dir=None, out_dir=None):
        tb_dir = tb_dir or (opt.tb_dir if opt is not None else None)
        out_dir = out_dir or (opt.out if opt is not None else ".")
        os.makedirs(out_dir, exist_ok=True)
        self.jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self.writer = None
        if tb_dir is not None:
            try:
                import tensorboardX

                os.makedirs(tb_dir, exist_ok=True)
                self.writer = tensorboardX.SummaryWriter(tb_dir)
            except ImportError:
                self.writer = None
        self._t_last = time.time()

    def push_to_tensorboard(self, datapack: TensorboardDatapack):
        it = datapack.iteration
        scalars = datapack.datapack[TensorboardDatapack.SCALAR_NAME]
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, float(v), it)
            for k, v in datapack.datapack[TensorboardDatapack.IMAGE_NAME].items():
                self.writer.add_image(k, v, it)
            for k, v in datapack.datapack[TensorboardDatapack.TEXT_NAME].items():
                self.writer.add_text(k, v, it)
            self.writer.flush()
        record = {"iteration": it, "training": datapack.training}
        record.update({k: float(v) for k, v in scalars.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def push_scalars(self, iteration, scalars, training=True):
        pack = TensorboardDatapack()
        pack.set_training(training)
        pack.set_iteration(iteration)
        pack.add_scalar(scalars)
        self.push_to_tensorboard(pack)

    def push_images(self, iteration, images, training=False, out_dir=None):
        """Push validation images (ref: human_nerf_trainer.py:475-514).

        images: {name: HWC float [0,1] or HW float}. Written as PNGs next
        to metrics.jsonl (and to tensorboard when available, CHW)."""
        import numpy as np

        pack = TensorboardDatapack()
        pack.set_training(training)
        pack.set_iteration(iteration)
        out_dir = out_dir or os.path.dirname(self.jsonl_path) or "."
        for name, img in images.items():
            img = np.asarray(img, dtype=np.float32)
            if img.ndim == 2:  # depth/acc maps: normalize for display
                lo, hi = float(img.min()), float(img.max())
                img = (img - lo) / max(hi - lo, 1e-9)
                img = np.repeat(img[..., None], 3, axis=-1)
            img = np.clip(img, 0.0, 1.0)
            pack.add_image({name: np.transpose(img, (2, 0, 1))})
            try:
                import imageio.v2 as imageio

                imageio.imwrite(
                    os.path.join(out_dir, f"{name}_{iteration:08d}.png"),
                    (img * 255).astype(np.uint8),
                )
            except Exception:
                pass
        self.push_to_tensorboard(pack)


class ThroughputMeter:
    """steps/sec + ray-samples/sec window meter."""

    def __init__(self, samples_per_step):
        self.samples_per_step = samples_per_step
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.steps = 0

    def tick(self, n=1):
        self.steps += n

    def rates(self):
        dt = max(time.time() - self.t0, 1e-9)
        sps = self.steps / dt
        return {"steps_per_sec": sps, "ray_samples_per_sec": sps * self.samples_per_step}
