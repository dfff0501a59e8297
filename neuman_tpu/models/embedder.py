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
    # compute sin/cos via the double-angle recurrence (one transcendental
    # pair at the base band, then s' = 2sc, c' = (c-s)(c+s) per octave —
    # ~4 VPU FMAs per band instead of 2 transcendentals; 3.98e-5 max f32
    # error over |x|<=3.2 for the reference's 10-octave ladder, invisible
    # under the bf16 matmuls that consume the rows). Only set when the
    # bands form an exact octave ladder; the TPU kernels' serial VPU time
    # is where this pays.
    recurrence: bool = struct.field(pytree_node=False, default=False)


def _is_octave_ladder(vals, stride=1):
    """True when vals[i+stride] == 2 * vals[i] for all i (f32 exact-ish)."""
    v = np.asarray(vals, dtype=np.float32)
    if v.size <= stride:
        return True
    return bool(
        np.allclose(v[stride:], 2.0 * v[:-stride], rtol=1e-6, atol=0.0)
    )


def make_embedder(
    input_dims,
    max_freq,
    n_freqs,
    log_sampling=True,
    include_input=True,
    min_freq=0,
    mapping="posenc",
    recurrence=False,
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
            recurrence=recurrence and _is_octave_ladder(freqs),
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
        bvals32 = bvals.astype(np.float32)
        # band j's 3 basis rows are exactly 2x band j-1's (same rotations,
        # doubled frequency), so the projection ladder is octave-exact
        return EmbedderSpec(
            mapping="rotate",
            input_dims=input_dims,
            include_input=include_input,
            out_dim=out_dim,
            bvals=tuple(float(v) for v in bvals.reshape(-1)),
            recurrence=recurrence
            and _is_octave_ladder(bvals32.reshape(-1), stride=9),
        )
    raise ValueError(mapping)


def trig_ladder(x0, n_bands):
    """sin/cos at x0, 2*x0, 4*x0, ... via the double-angle recurrence:
    one transcendental pair, then s' = 2sc, c' = (c-s)(c+s) per octave.
    Returns (sins, coss) lists of length n_bands."""
    s = jnp.sin(x0)
    c = jnp.cos(x0)
    sins, coss = [s], [c]
    for _ in range(n_bands - 1):
        s, c = 2.0 * s * c, (c - s) * (c + s)
        sins.append(s)
        coss.append(c)
    return sins, coss


def embed(spec: EmbedderSpec, x):
    """Apply the positional encoding; x: [..., input_dims]."""
    assert x.shape[-1] == spec.input_dims, (x.shape, spec.input_dims)
    if spec.mapping == "posenc":
        parts = [x] if spec.include_input else []
        if spec.recurrence:
            sins, coss = trig_ladder(
                x * spec.freq_bands[0], len(spec.freq_bands)
            )
            for s, c in zip(sins, coss):
                parts.append(s)
                parts.append(c)
        else:
            for f in spec.freq_bands:
                parts.append(jnp.sin(x * f))
                parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)
    else:  # rotate
        bvals = jnp.asarray(np.array(spec.bvals).reshape(-1, 3), dtype=x.dtype)
        if spec.recurrence:
            nb = bvals.shape[0] // 3
            sins, coss = trig_ladder(x @ bvals[:3].T, nb)
            out = jnp.concatenate(sins + coss, axis=-1)
        else:
            proj = x @ bvals.T
            out = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        if spec.include_input:
            out = jnp.concatenate([x, out], axis=-1)
        return out
