"""LPIPS perceptual distance (AlexNet variant) in pure JAX.

Replaces the torch `lpips.LPIPS(net='alex')` used for the patch loss
(human_nerf_trainer.py:153, 432-435) and eval metrics
(render_test_views.py:19, 36-38).

Architecture (LPIPS v0.1, alex): input in [-1, 1] -> fixed shift/scale ->
AlexNet conv stack; features after each of the five ReLUs are channel-unit-
normalized; squared differences pass through learned 1x1 "lin" heads; spatial
mean; sum over the five layers.

Pretrained weights are not downloadable in this environment; use
`convert_torch_lpips` (tools/convert_lpips.py) to port weights from the pip
`lpips` package once, then `load_lpips_params`. Random-init params keep the
module testable and the loss well-defined (it is still a valid perceptual-ish
metric, just not LPIPS-calibrated).
"""

import numpy as np
import jax
import jax.numpy as jnp

# (out_ch, in_ch, kernel, stride, pad) for the 5 conv layers
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# maxpool (k3 s2) after relu1 and relu2
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_lpips_params(key):
    params = {"convs": [], "lins": []}
    keys = jax.random.split(key, 10)
    for i, (oc, ic, k, _, _) in enumerate(_ALEX_CONVS):
        fan_in = ic * k * k
        bound = 1.0 / np.sqrt(fan_in)
        params["convs"].append(
            {
                "w": jax.random.uniform(keys[i], (oc, ic, k, k), jnp.float32, -bound, bound),
                "b": jnp.zeros((oc,)),
            }
        )
        params["lins"].append(
            jnp.abs(jax.random.uniform(keys[5 + i], (oc,), jnp.float32, 0, 0.1))
        )
    return params


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


def _features(params, x):
    feats = []
    h = x
    for i, (oc, ic, k, stride, pad) in enumerate(_ALEX_CONVS):
        h = _conv(h, params["convs"][i]["w"], params["convs"][i]["b"], stride, pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _maxpool(h)
    return feats


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True))
    return f / (norm + eps)


def lpips(params, img0, img1):
    """Perceptual distance between images in [-1, 1], NCHW [B, 3, H, W].

    Returns [B] distances.
    """
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale
    f0 = _features(params, x0)
    f1 = _features(params, x1)
    total = 0.0
    for i in range(len(f0)):
        d = (_unit_normalize(f0[i]) - _unit_normalize(f1[i])) ** 2
        lin = jnp.maximum(params["lins"][i], 0.0)[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total


def convert_torch_lpips(torch_state_dict):
    """Map the pip `lpips` package's state dict (net='alex', v0.1) onto our
    param pytree. Keys: net.slice{1..5}.{idx}.weight/bias (alexnet convs at
    indices 0,3,6,8,10 of torchvision features) and lin{0..4}.model.1.weight."""
    sd = {k: np.asarray(v) for k, v in torch_state_dict.items()}
    params = {"convs": [], "lins": []}
    # alexnet conv indices inside the flattened feature stack per slice
    slice_convs = [
        ("net.slice1.0", None), ("net.slice2.3", "net.slice2.0"),
        ("net.slice3.6", None), ("net.slice4.8", None), ("net.slice5.10", None),
    ]
    # the lpips package names convs by their torchvision index within slices;
    # search for any key that endswith the right shapes instead.
    conv_keys = sorted(
        [k for k in sd if k.startswith("net.") and k.endswith(".weight")],
        key=lambda k: int(k.split(".")[-2]),
    )
    assert len(conv_keys) == 5, conv_keys
    for i, wk in enumerate(conv_keys):
        bk = wk[: -len("weight")] + "bias"
        params["convs"].append({"w": jnp.asarray(sd[wk]), "b": jnp.asarray(sd[bk])})
    for i in range(5):
        lin = sd[f"lin{i}.model.1.weight"]  # [1, C, 1, 1]
        params["lins"].append(jnp.asarray(lin[0, :, 0, 0]))
    return params
