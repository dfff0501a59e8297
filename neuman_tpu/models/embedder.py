"""Positional encodings (pure JAX).

Two mappings, matching the reference models/vanilla.py:17-92:

- 'posenc': classic NeRF sin/cos frequency bands. Output layout (checkpoint
  parity matters): [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]
  with frequencies 2**linspace(min_freq, max_freq, N_freqs).
- 'rotate': canonical-space encoding — an axis-aligned frequency matrix
  rotated by two fixed 45-degree rotations; output [x, sin(x@B.T), cos(x@B.T)]
  (ref: vanilla.py:44-58, 83-89).

Encoders are static specs (frequencies precomputed host-side); `embed` is a
pure jittable function of the input points.
"""

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EmbedderSpec:
    mapping: str = struct.field(pytree_node=False)
    input_dims: int = struct.field(pytree_node=False)
    include_input: bool = struct.field(pytree_node=False)
    out_dim: int = struct.field(pytree_node=False)
    # 'posenc': [N_freqs]; 'rotate': unused
    freq_bands: tuple = struct.field(pytree_node=False, default=())
    # 'rotate': [N_freqs*3, 3] flattened row-major; 'posenc': unused
    bvals: tuple = struct.field(pytree_node=False, default=())


def make_embedder(
    input_dims,
    max_freq,
    n_freqs,
    log_sampling=True,
    include_input=True,
    min_freq=0,
    mapping="posenc",
):
    assert log_sampling, "linear frequency sampling unsupported (ref asserts too)"
    if mapping == "posenc":
        # Bit-parity with the reference (vanilla.py:67-68):
        # `2.**torch.linspace(...)` rounds the exponents to float32 FIRST,
        # then pows in extended precision. Matching that exactly matters at
        # non-integer exponents (min_freq > 0): an ULP of frequency error at
        # freq~512 becomes ~6e-5 of phase error in the PE output.
        exps = np.linspace(min_freq, max_freq, num=n_freqs).astype(np.float32)
        freqs = (2.0 ** exps.astype(np.float64)).astype(np.float32)
        out_dim = (1 if include_input else 0) * input_dims + 2 * n_freqs * input_dims
        return EmbedderSpec(
            mapping="posenc",
            input_dims=input_dims,
            include_input=include_input,
            out_dim=out_dim,
            freq_bands=tuple(float(f) for f in freqs),
        )
    elif mapping == "rotate":
        assert input_dims == 3
        bvals = 2.0 ** np.linspace(min_freq, max_freq, num=n_freqs)
        bvals = np.reshape(np.eye(3) * bvals[:, None, None], [n_freqs * 3, 3])
        s = (2**0.5) / 2
        rot1 = np.array([[s, -s, 0], [s, s, 0], [0, 0, 1]])
        bvals = bvals @ rot1.T
        rot2 = np.array([[1, 0, 0], [0, s, -s], [0, s, s]])
        bvals = bvals @ rot2.T
        out_dim = n_freqs * 2 * 3 + (3 if include_input else 0)
        return EmbedderSpec(
            mapping="rotate",
            input_dims=input_dims,
            include_input=include_input,
            out_dim=out_dim,
            bvals=tuple(float(v) for v in bvals.reshape(-1)),
        )
    raise ValueError(mapping)


def embed(spec: EmbedderSpec, x):
    """Apply the positional encoding; x: [..., input_dims]."""
    assert x.shape[-1] == spec.input_dims, (x.shape, spec.input_dims)
    if spec.mapping == "posenc":
        parts = [x] if spec.include_input else []
        for f in spec.freq_bands:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)
    else:  # rotate
        bvals = jnp.asarray(np.array(spec.bvals).reshape(-1, 3), dtype=x.dtype)
        proj = x @ bvals.T
        out = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        if spec.include_input:
            out = jnp.concatenate([x, out], axis=-1)
        return out
