"""Typed configuration.

The reference builds ~70 argparse flags with mode-dependent defaults parsed in
two passes (options/options.py:47-87, train.py:157-258). Here the same flag
surface is a flat dataclass: field names and defaults match the reference
exactly so `params.json` files are interchangeable; `apply_mode_defaults`
reproduces the bkg/human two-pass default switching; `add_cli_args` /
`from_cli` expose every field as a CLI flag.
"""

import argparse
import dataclasses
import json
import math
import os
from dataclasses import dataclass
from typing import Optional, Tuple


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes", "y", "t")


@dataclass
class NeuManConfig:
    # ---- general (ref: options.py:47-49) ----
    use_cuda: bool = False  # kept for params.json parity; TPU path ignores it

    # ---- nerf (ref: options.py:52-57) ----
    nerf_depth: int = 8
    nerf_width: int = 256
    use_viewdirs: bool = True
    specular_can: bool = True

    # ---- positional encoding (ref: options.py:60-71) ----
    raw_pos_dim: int = 3
    pos_min_freq: int = 0
    pos_max_freq: int = 9
    pos_N_freqs: int = 10
    raw_dir_dim: int = 3
    dir_max_freq: int = 3
    dir_N_freqs: int = 4
    log_sampling: bool = True
    include_input: bool = True
    can_posenc: str = "rotate"
    posenc: str = "posenc"

    # ---- rendering (ref: options.py:74-82) ----
    rays_per_batch: int = 2048
    samples_per_ray: int = 128
    importance_samples_per_ray: int = 128
    render_h: Optional[int] = None
    render_w: Optional[int] = None
    weights_path: Optional[str] = None
    # explicit LPIPS weights .npz (tools/convert_lpips.py output); default
    # search path is <repo>/data/lpips_alex.npz (train.py load_lpips_params)
    lpips_weights: Optional[str] = None
    white_bkg: bool = True
    trajectory_resolution: int = 40

    # ---- scene (ref: train.py:216-235) ----
    scene_dir: Optional[str] = None
    normalize: bool = True
    bkg_range_scale: float = 3.0
    human_range_scale: float = 1.5
    image_height: Optional[int] = None
    image_width: Optional[int] = None
    mask_dir: str = "segmentations"
    smpl_type: str = "optimized"
    dilation: int = 30

    # ---- training, shared (ref: train.py:223-232) ----
    train_mode: str = "bkg"  # bkg | smpl_only | smpl_and_offset
    delay_iters: int = 0
    learning_rate: float = 5e-4
    lrate_decay: Optional[int] = 250
    raw_noise_std: float = 0.0
    out_dir: str = "./out"
    name: str = "dummy"
    resume: bool = False
    load_weights: Optional[str] = None
    max_iter: int = 500_000
    valid_iter: int = 5000
    perturb: float = 0.0
    body_rays_ratio: float = 0.0
    border_rays_ratio: float = 0.0
    bkg_rays_ratio: float = 1.0

    # ---- background stage (ref: train.py:174-178) ----
    empty_space_loss_fn: str = "mse"
    use_fused_depth: bool = True
    penalize_empty_space: float = 0.1
    margin: float = 0.8
    ablate_nerft: bool = False

    # ---- human stage (ref: train.py:189-214) ----
    bkg_lr: float = 0.0
    smpl_lr: float = 3e-4
    geo_threshold: float = -1.0
    # group-KNN stride for the training mesh queries: the vertex-KNN phase
    # runs once per `knn_stride` consecutive ray samples (midpoint
    # representative). 4 measured 98.8% exact-face recall vs 99.7% at
    # stride 1 on the body proxy (tools/bench_mesh_query.py --recall
    # --ray_points); the Ericson candidate phase stays exact per sample.
    knn_stride: int = 4
    penalize_smpl_alpha: float = 1.0
    penalize_outside: bool = True
    penalize_outside_factor: float = 2.0
    penalize_outside_loss: str = "l1"
    dist_exponent: float = 1.0
    penalize_symmetric_alpha: float = 0.1
    penalize_hard_surface: float = 0.1
    penalize_dummy: float = 1.0
    penalize_color_range: float = 0.1
    penalize_mask: float = 0.01
    penalize_sharp_edge: float = 0.1
    penalize_lpips: float = 0.01
    chunk: int = 10000
    load_background: Optional[str] = None
    load_can: Optional[str] = None
    num_offset_nets: int = 1
    offset_scale: float = 0.0
    offset_scale_type: str = "linear"
    offset_lim: float = 1.0
    offset_delay: int = 20000
    prior_knowledge_decay: bool = False
    block_grad: bool = True
    random_view: bool = False

    # ---- TPU-native additions ----
    profile_dir: Optional[str] = None  # jax.profiler trace of train steps
    profile_steps: int = 5
    seed: int = 42
    data_axis: str = "data"  # mesh axis name for ray-batch sharding
    # GSPMD data parallelism over all visible devices (the reference's
    # nn.DataParallel analog, train.py:26-28): "auto" builds a 1-D data
    # mesh when >1 device is visible, "on" forces it (errors on 1 device
    # only if the batch can't shard — constraints are no-ops at size 1),
    # "off" trains single-device. Sharded == unsharded is bit-equality
    # tested for both stages (tests/test_parallel.py).
    data_parallel: str = "auto"
    compute_dtype: str = "float32"  # or "bfloat16" for the MLP matmuls
    # fused Pallas kernels on the hot paths (render + both train steps).
    # None = auto: enabled on TPU, off elsewhere (resolved in finalize();
    # every path has an XLA twin that parity tests pin to the kernels)
    use_pallas: Optional[bool] = None
    # positional-encoding sin/cos via the double-angle octave recurrence
    # (2 transcendentals + ~4 FMAs/band instead of 2 transcendentals/band;
    # 3.98e-5 max f32 error on the 10-octave reference ladder). None =
    # auto: on for TPU (where the kernels' serial VPU time pays for it),
    # exact trig elsewhere. Only applies when the bands are an exact
    # octave ladder (the reference's 2**linspace config always is).
    pe_recurrence: Optional[bool] = None
    # custom-VJP MLP backward strategy: "recompute" re-derives the trunk
    # activations in VMEM (no extra HBM traffic, 4x-fwd FLOPs), "hbm"
    # streams a forward-written activation tape (3x-fwd FLOPs, the tape
    # DMA pipelines behind the MXU-bound contractions). Bit-identical
    # gradients either way; a measurement knob, not a semantic one.
    mlp_tape: str = "recompute"

    # ---- derived (set by finalize) ----
    out: Optional[str] = None
    tb_dir: Optional[str] = None
    load_weights_path: Optional[str] = None
    tgt_size: Optional[Tuple[int, int]] = None
    render_size: Optional[Tuple[int, int]] = None
    motion_name: str = "speedvault"
    mocap_path: Optional[str] = None  # override the per-scene mocap presets
    mocap_start: int = 0
    mocap_end: int = -1
    mocap_skip: int = 1

    def finalize(self):
        """Derived fields + invariants (ref: train.py:237-258)."""
        if self.use_pallas is None:
            import jax

            self.use_pallas = jax.default_backend() == "tpu"
        if self.pe_recurrence is None:
            import jax

            self.pe_recurrence = jax.default_backend() == "tpu"
        if self.image_height is not None or self.image_width is not None:
            assert self.image_height is not None and self.image_width is not None
            self.tgt_size = (self.image_height, self.image_width)
        if self.render_h is not None:
            self.render_size = (self.render_h, self.render_w)
        self.out = os.path.join(self.out_dir, self.name)
        self.tb_dir = os.path.join(self.out_dir, "tensorboard_out", self.name)
        if self.load_weights is not None:
            self.load_weights_path = os.path.join(
                self.out_dir, self.load_weights, "checkpoint.npz"
            )
        elif self.resume:
            self.load_weights_path = os.path.join(
                self.out_dir, self.name, "checkpoint.npz"
            )
        assert math.isclose(
            self.body_rays_ratio + self.border_rays_ratio + self.bkg_rays_ratio, 1.0
        ), f"{self.body_rays_ratio + self.border_rays_ratio + self.bkg_rays_ratio}"
        if self.ablate_nerft:
            assert self.raw_pos_dim == 4 and self.train_mode == "bkg"
        return self

    def save(self, path=None):
        path = path or os.path.join(self.out, "params.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fp:
            json.dump(dataclasses.asdict(self), fp, indent=0, sort_keys=True, default=str)
        return path

    @classmethod
    def load(cls, path):
        with open(path) as fp:
            raw = json.load(fp)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        for k in ("tgt_size", "render_size"):
            if kwargs.get(k) is not None:
                kwargs[k] = tuple(kwargs[k])
        return cls(**kwargs)


def apply_mode_defaults(cfg: NeuManConfig, train_mode: str) -> NeuManConfig:
    """Mode-dependent defaults (ref: train.py:164-214 two-pass parsing)."""
    cfg.train_mode = train_mode
    if train_mode == "bkg":
        cfg.rays_per_batch = 4096
        cfg.valid_iter = 5000
        cfg.max_iter = 500_000
        cfg.body_rays_ratio = 0.0
        cfg.border_rays_ratio = 0.0
        cfg.bkg_rays_ratio = 1.0
        cfg.perturb = 0.0
    elif train_mode in ("smpl_only", "smpl_and_offset"):
        cfg.rays_per_batch = 1536
        cfg.valid_iter = 1000
        cfg.max_iter = 300_000
        cfg.body_rays_ratio = 0.95
        cfg.border_rays_ratio = 0.05
        cfg.bkg_rays_ratio = 0.0
        cfg.perturb = 1.0
    else:
        raise ValueError(train_mode)
    return cfg



def add_cli_args(parser: argparse.ArgumentParser, cfg: NeuManConfig):
    """Expose every config field as a CLI flag with the current value as
    default (reference flag names preserved)."""
    for f in dataclasses.fields(NeuManConfig):
        if f.name in ("out", "tb_dir", "load_weights_path", "tgt_size", "render_size"):
            continue  # derived
        value = getattr(cfg, f.name)
        if (
            f.type in ("bool", bool, "Optional[bool]", Optional[bool])
            or isinstance(value, bool)
        ):
            parser.add_argument(f"--{f.name}", type=str2bool, default=value)
        elif isinstance(value, int):
            parser.add_argument(f"--{f.name}", type=int, default=value)
        elif isinstance(value, float):
            parser.add_argument(f"--{f.name}", type=float, default=value)
        else:
            # f.type is the typing object (or its string form under
            # `from __future__ import annotations`) — accept both, else
            # --render_h etc. silently parse as str and break downstream
            typ = str
            if f.type in ("Optional[int]", Optional[int]):
                typ = int
            elif f.type in ("Optional[float]", Optional[float]):
                typ = float
            parser.add_argument(f"--{f.name}", type=typ, default=value)
    return parser


def from_cli(argv=None, mode_aware=True, base: Optional[NeuManConfig] = None):
    """Two-pass CLI parsing with mode-dependent defaults (ref: train.py)."""
    cfg = base or NeuManConfig()
    if mode_aware:
        pre = argparse.ArgumentParser(add_help=False)
        pre.add_argument("--train_mode", type=str, default=cfg.train_mode)
        known, _ = pre.parse_known_args(argv)
        cfg = apply_mode_defaults(cfg, known.train_mode)
    parser = argparse.ArgumentParser()
    add_cli_args(parser, cfg)
    args = parser.parse_args(argv)
    for k, v in vars(args).items():
        setattr(cfg, k, v)
    return cfg.finalize()


def print_opt(cfg: NeuManConfig):
    rows = sorted(dataclasses.asdict(cfg).items())
    content = [k.rjust(25, " ") + "  " + str(v) for k, v in rows]
    from neuman_tpu.utils.misc import print_notification

    print_notification(content, "OPTIONS")
