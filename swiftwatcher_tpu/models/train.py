"""Classifier fine-tuning: transfer learning for the segment CNN.

The reference ships pre-trained weights produced by freezing SqueezeNet's
features and training the 2-class head conv (segment_classification.py:51-63,
"Freeze layer parameters if feature extracting").  This module provides that
training capability TPU-natively: an optax step over the head parameters
with the feature trunk frozen, built to shard over a device mesh —
data-parallel batch plus tensor-parallel head (the 512-channel contraction
of the head conv splits across the 'model' axis with a psum).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .squeezenet import FIRE_LAYOUT, POOL_AFTER, _conv, _maxpool_ceil, _fire

HEAD_KEYS = ("classifier.1.weight", "classifier.1.bias")


def split_params(params: Dict[str, jnp.ndarray]):
    head = {k: params[k] for k in HEAD_KEYS}
    trunk = {k: v for k, v in params.items() if k not in HEAD_KEYS}
    return trunk, head


def features(trunk: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """Frozen feature trunk: (N, 224, 224, 3) -> (N, h, w, 512)."""
    x = jax.nn.relu(_conv(x, trunk["features.0.weight"], trunk["features.0.bias"], stride=2))
    fire_by_idx = {idx: cfg for idx, *cfg in FIRE_LAYOUT}
    for idx in range(1, 13):
        if idx in POOL_AFTER:
            x = _maxpool_ceil(x)
        elif idx in fire_by_idx:
            x = _fire(x, trunk, idx)
    return x


def head_logits(head: Dict[str, jnp.ndarray], feats: jnp.ndarray) -> jnp.ndarray:
    x = _conv(feats, head["classifier.1.weight"], head["classifier.1.bias"])
    x = jax.nn.relu(x)
    return jnp.mean(x, axis=(1, 2))


def loss_fn(head, feats, labels):
    logits = head_logits(head, feats)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(optimizer: optax.GradientTransformation):
    """(head, opt_state, feats, labels) -> (head, opt_state, loss).

    Pure function of shardable arrays; pjit-able over any mesh (see
    parallel.mesh.sharded_train_step for the dp x tp placement)."""

    def step(head, opt_state, feats, labels):
        loss, grads = jax.value_and_grad(loss_fn)(head, feats, labels)
        updates, opt_state = optimizer.update(grads, opt_state, head)
        head = optax.apply_updates(head, updates)
        return head, opt_state, loss

    return step


def finetune(
    params: Dict[str, np.ndarray],
    images: np.ndarray,
    labels: np.ndarray,
    steps: int = 100,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Single-host fine-tune of the head on (N,224,224,3) float images."""
    trunk, head = split_params({k: jnp.asarray(v) for k, v in params.items()})
    opt = optax.adam(lr)
    opt_state = opt.init(head)
    step = jax.jit(make_train_step(opt))
    feats_fn = jax.jit(lambda x: features(trunk, x))

    rng = np.random.default_rng(seed)
    n = len(images)
    for s in range(steps):
        idx = rng.integers(0, n, size=batch_size)
        feats = feats_fn(jnp.asarray(images[idx]))
        head, opt_state, loss = step(head, opt_state, feats, jnp.asarray(labels[idx]))
    out = dict(trunk)
    out.update(head)
    return {k: np.asarray(v) for k, v in out.items()}
