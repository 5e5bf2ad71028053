"""SqueezeNet 1.0 with a 2-class head, as pure-jnp functional forward.

Replicates torchvision's squeezenet1_0 graph as modified by the reference
(segment_classification.py:47-67: classifier conv 512 -> num_classes), with
NHWC layout and a flat params dict keyed by the torch state_dict names —
so converted `model.pt` weights slot in directly (see models/convert.py).

Architecture (torchvision squeezenet 1.0):
    conv 7x7/2 (96) -> relu -> maxpool 3/2 ceil
    fire(16, 64, 64) fire(16, 64, 64) fire(32, 128, 128) -> maxpool 3/2 ceil
    fire(32, 128, 128) fire(48, 192, 192) fire(48, 192, 192)
    fire(64, 256, 256) -> maxpool 3/2 ceil -> fire(64, 256, 256)
    dropout -> conv 1x1 (num_classes) -> relu -> global avg pool -> flatten

Dropout is treated as identity (deterministic eval-mode forward).  Note the
reference never calls model.eval(), leaving torch dropout nominally active
and its per-segment scores stochastic — a latent bug; the deterministic
forward is the intended behavior its report evaluates.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (squeeze, expand1x1, expand3x3) per fire module, torchvision 1.0 layout,
# keyed by the feature index in the torch Sequential.
FIRE_LAYOUT: Tuple[Tuple[int, int, int, int], ...] = (
    (3, 16, 64, 64),
    (4, 16, 64, 64),
    (5, 32, 128, 128),
    (7, 32, 128, 128),
    (8, 48, 192, 192),
    (9, 48, 192, 192),
    (10, 64, 256, 256),
    (12, 64, 256, 256),
)
POOL_AFTER = {2, 6, 11}  # maxpool positions in the features Sequential


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, stride: int = 1,
          padding: str | Sequence[Tuple[int, int]] = "VALID") -> jnp.ndarray:
    """NHWC conv with HWIO weights + bias."""
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
        # true-f32 passes: TPU's default bf16 conv drifts logits by ~2e-2,
        # enough to flip argmax on near-tie segments (classification parity)
        precision=jax.lax.Precision.HIGHEST,
    )
    return y + b.reshape(1, 1, 1, -1)


def _maxpool_ceil(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """torch MaxPool2d(window, stride, ceil_mode=True): pad right/bottom so
    partial windows produce outputs (padding value -inf never wins)."""
    H, W = x.shape[1], x.shape[2]
    out_h = -(-(H - window) // stride) + 1
    out_w = -(-(W - window) // stride) + 1
    pad_h = max((out_h - 1) * stride + window - H, 0)
    pad_w = max((out_w - 1) * stride + window - W, 0)
    neg = jnp.asarray(-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def _fire(x: jnp.ndarray, params: Dict[str, jnp.ndarray], idx: int) -> jnp.ndarray:
    p = lambda name: params[f"features.{idx}.{name}"]
    s = jax.nn.relu(_conv(x, p("squeeze.weight"), p("squeeze.bias")))
    e1 = jax.nn.relu(_conv(s, p("expand1x1.weight"), p("expand1x1.bias")))
    e3 = jax.nn.relu(
        _conv(s, p("expand3x3.weight"), p("expand3x3.bias"), padding=((1, 1), (1, 1)))
    )
    return jnp.concatenate([e1, e3], axis=-1)


def forward(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(N, 224, 224, 3) float32 normalized input -> (N, num_classes) logits."""
    x = jax.nn.relu(_conv(x, params["features.0.weight"], params["features.0.bias"], stride=2))
    fire_by_idx = {idx: cfg for idx, *cfg in FIRE_LAYOUT}
    for idx in range(1, 13):
        if idx in POOL_AFTER:
            x = _maxpool_ceil(x)
        elif idx in fire_by_idx:
            x = _fire(x, params, idx)
    x = _conv(x, params["classifier.1.weight"], params["classifier.1.bias"])
    x = jax.nn.relu(x)
    x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
    return x


@jax.jit
def predict(params: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """argmax class per example (segment_classification.py:36)."""
    return jnp.argmax(forward(params, x), axis=1)


def convert_torch_state_dict(state: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """torch state_dict (OIHW convs) -> our params (HWIO), numpy."""
    out = {}
    for k, v in state.items():
        a = np.asarray(v)
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        out[k] = a.astype(np.float32)
    return out


def random_params(rng: np.random.Generator, num_classes: int = 2) -> Dict[str, np.ndarray]:
    """He-initialized params with the exact state_dict key layout (for tests
    and for training from scratch)."""
    params: Dict[str, np.ndarray] = {}

    def conv(key, kh, kw, cin, cout):
        fan_in = kh * kw * cin
        params[f"{key}.weight"] = (
            rng.standard_normal((kh, kw, cin, cout)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        params[f"{key}.bias"] = np.zeros((cout,), np.float32)

    conv("features.0", 7, 7, 3, 96)
    cin = 96
    for idx, sq, e1, e3 in FIRE_LAYOUT:
        conv(f"features.{idx}.squeeze", 1, 1, cin, sq)
        conv(f"features.{idx}.expand1x1", 1, 1, sq, e1)
        conv(f"features.{idx}.expand3x3", 3, 3, sq, e3)
        cin = e1 + e3
    conv("classifier.1", 1, 1, 512, num_classes)
    return params
