"""NeRF MLPs as functional pytrees.

Same network family as the reference (models/vanilla.py:95-250): depth x
width MLP with a skip concat, optional view-direction head (alpha from the
trunk; rgb from feature+dir through one width/2 layer), and the offset-net
output scaling modes no/linear/tanh. Parameters are plain dict pytrees with
reference-compatible names so torch checkpoints convert 1:1
(`pts_linears.{i}`, `views_linears.0`, `feature_linear`, `alpha_linear`,
`rgb_linear`, `output_linear`).

Weights are stored (in, out) — forward is x @ W — i.e. the transpose of
torch's Linear layout; the checkpoint converter transposes.

TPU notes: matmuls run in `compute_dtype` (bfloat16 on the fast path) with
float32 params and outputs; shapes are static so XLA fuses PE + MLP +
integration into large MXU-friendly batches.
"""

import math

import jax
import jax.numpy as jnp
from flax import struct

from neuman_tpu.models import embedder as embedder_module


@struct.dataclass
class NeRFSpec:
    depth: int = struct.field(pytree_node=False, default=8)
    width: int = struct.field(pytree_node=False, default=256)
    input_ch: int = struct.field(pytree_node=False, default=3)
    input_ch_views: int = struct.field(pytree_node=False, default=3)
    output_ch: int = struct.field(pytree_node=False, default=4)
    skips: tuple = struct.field(pytree_node=False, default=(4,))
    use_viewdirs: bool = struct.field(pytree_node=False, default=False)
    scale_type: str = struct.field(pytree_node=False, default="no")


def _init_linear(key, fan_in, fan_out):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def init_nerf_params(key, spec: NeRFSpec):
    keys = jax.random.split(key, spec.depth + 4)
    params = {}
    pts_linears = []
    in_ch = spec.input_ch
    for i in range(spec.depth):
        fan_in = in_ch if i == 0 else (
            spec.width + spec.input_ch if (i - 1) in spec.skips else spec.width
        )
        pts_linears.append(_init_linear(keys[i], fan_in, spec.width))
    params["pts_linears"] = pts_linears
    if spec.use_viewdirs:
        params["views_linears"] = [
            _init_linear(keys[spec.depth], spec.input_ch_views + spec.width, spec.width // 2)
        ]
        params["feature_linear"] = _init_linear(keys[spec.depth + 1], spec.width, spec.width)
        params["alpha_linear"] = _init_linear(keys[spec.depth + 2], spec.width, 1)
        params["rgb_linear"] = _init_linear(keys[spec.depth + 3], spec.width // 2, 3)
    else:
        params["output_linear"] = _init_linear(keys[spec.depth], spec.width, spec.output_ch)
    return params


def _linear(p, x, compute_dtype):
    w = p["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    return y + p["b"]


def apply_nerf(
    spec: NeRFSpec, params, input_pts, input_views=None, scale=1.0,
    compute_dtype=jnp.float32,
):
    """Forward pass; input_pts: [..., input_ch] (already embedded).

    `scale` only matters for scale_type != 'no' (offset nets); it is a
    runtime scalar because the trainer ramps it per iteration
    (ref: human_nerf_trainer.py:597-603).
    """
    assert input_pts.shape[-1] == spec.input_ch
    h = input_pts
    for i, p in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_linear(p, h, compute_dtype))
        if i in spec.skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    if spec.use_viewdirs:
        assert input_views is not None
        assert input_views.shape[-1] == spec.input_ch_views
        alpha = _linear(params["alpha_linear"], h, compute_dtype)
        feature = _linear(params["feature_linear"], h, compute_dtype)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for p in params["views_linears"]:
            h = jax.nn.relu(_linear(p, h, compute_dtype))
        rgb = _linear(params["rgb_linear"], h, compute_dtype)
        outputs = jnp.concatenate([rgb, alpha], axis=-1)
    else:
        outputs = _linear(params["output_linear"], h, compute_dtype)

    if spec.scale_type == "no":
        return outputs
    elif spec.scale_type == "linear":
        return outputs * scale
    elif spec.scale_type == "tanh":
        return jnp.tanh(outputs) * scale
    raise ValueError(spec.scale_type)


@struct.dataclass
class JoinerSpec:
    """PE∘MLP closure over points + view dirs (ref: vanilla.py:155-166)."""

    pos_pe: embedder_module.EmbedderSpec = struct.field(pytree_node=False)
    dir_pe: embedder_module.EmbedderSpec = struct.field(pytree_node=False)
    nerf: NeRFSpec = struct.field(pytree_node=False)


def apply_joiner(spec: JoinerSpec, params, input_pts, input_views=None, compute_dtype=jnp.float32):
    pts = embedder_module.embed(spec.pos_pe, input_pts)
    views = None
    if input_views is not None and spec.nerf.use_viewdirs:
        views = embedder_module.embed(spec.dir_pe, input_views)
    return apply_nerf(spec.nerf, params, pts, views, compute_dtype=compute_dtype)


@struct.dataclass
class OffsetNetSpec:
    """PE∘MLP on (xyz, t) -> 3-vector offset (ref: vanilla.py:169-177)."""

    pos_pe: embedder_module.EmbedderSpec = struct.field(pytree_node=False)
    nerf: NeRFSpec = struct.field(pytree_node=False)


def apply_offset_net(spec: OffsetNetSpec, params, input_pts, scale, compute_dtype=jnp.float32):
    pts = embedder_module.embed(spec.pos_pe, input_pts)
    return apply_nerf(spec.nerf, params, pts, scale=scale, compute_dtype=compute_dtype)


def _pe_recurrence(opt):
    """Resolve the config's pe_recurrence (None = auto: on for TPU) —
    configs reach spec builders unfinalized in tools/benches."""
    rec = getattr(opt, "pe_recurrence", None)
    if rec is None:
        import jax

        rec = jax.default_backend() == "tpu"
    return rec


def build_nerf_specs(opt, posenc=None):
    """Coarse+fine joiner specs from config (ref: vanilla.py:208-250)."""
    mapping = posenc if posenc is not None else getattr(opt, "posenc", "posenc")
    recurrence = _pe_recurrence(opt)
    pos_pe = embedder_module.make_embedder(
        opt.raw_pos_dim,
        opt.pos_max_freq,
        opt.pos_N_freqs,
        opt.log_sampling,
        opt.include_input,
        min_freq=opt.pos_min_freq,
        mapping=mapping,
        recurrence=recurrence,
    )
    dir_pe = embedder_module.make_embedder(
        opt.raw_dir_dim,
        opt.dir_max_freq,
        opt.dir_N_freqs,
        opt.log_sampling,
        opt.include_input,
        mapping=mapping,
        recurrence=recurrence,
    )
    nerf = NeRFSpec(
        depth=opt.nerf_depth,
        width=opt.nerf_width,
        input_ch=pos_pe.out_dim,
        input_ch_views=dir_pe.out_dim,
        use_viewdirs=opt.use_viewdirs,
    )
    return JoinerSpec(pos_pe=pos_pe, dir_pe=dir_pe, nerf=nerf)


def build_offset_net_spec(opt):
    """Offset net spec from config (ref: vanilla.py:180-205)."""
    st_pe = embedder_module.make_embedder(
        opt.raw_pos_dim + 1,
        opt.pos_max_freq,
        opt.pos_N_freqs,
        opt.log_sampling,
        opt.include_input,
        min_freq=opt.pos_min_freq,
        recurrence=_pe_recurrence(opt),
    )
    nerf = NeRFSpec(
        depth=opt.nerf_depth,
        width=opt.nerf_width,
        input_ch=st_pe.out_dim,
        input_ch_views=0,
        output_ch=3,
        use_viewdirs=False,
        scale_type=opt.offset_scale_type,
    )
    return OffsetNetSpec(pos_pe=st_pe, nerf=nerf)


def weight_reset(key, spec):
    """Fresh init for the dead-network restart mechanism
    (ref: vanilla.py:11-13, human_nerf_trainer.py:437-442)."""
    return init_nerf_params(key, spec if isinstance(spec, NeRFSpec) else spec.nerf)
