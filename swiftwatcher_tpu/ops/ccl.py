"""Connected-component labeling on TPU.

Replaces the reference's per-frame cv2.connectedComponents call
(image_filtering.py:325-329) — the stage its author marked "CPU processing
bottleneck" (__main__.py:78) — with a batched, jittable label-propagation
kernel over the whole (T, H, W) window:

  * init: every foreground pixel's label = its linear raster index
  * iterate: 8-neighborhood min-pool + two pointer-jumping (path-halving)
    gathers, until fixpoint — O(log diameter) iterations for blob-like
    components instead of O(diameter) plain flooding
  * compact: a component's root is its minimum linear index == its first
    raster-scan pixel, so ranking roots by a per-frame cumulative sum yields
    labels 1..N in raster-first-occurrence order.

Connectivity is 8 — the reference passes `4` positionally into the *labels*
output slot of the cv2 binding, so its effective connectivity is the default
8 (verified empirically; SURVEY.md §2.1).

Numbering note: OpenCV's block-based union-find occasionally numbers
components out of raster order; we use strict raster-first-occurrence. The
pixel partition is identical; only label values may permute within a frame,
which downstream tracking is invariant to (costs are pairwise).  The
reference then casts labels to uint8 (aliasing components ≥ 256, label 256
collapsing into background); `wrap_labels_uint8` reproduces that.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _min_pool_8(lbl: jnp.ndarray, sentinel: int) -> jnp.ndarray:
    """3x3 min over the trailing two dims, borders padded with sentinel."""
    pad = [(0, 0)] * (lbl.ndim - 2) + [(1, 1), (1, 1)]
    padded = jnp.pad(lbl, pad, mode="constant", constant_values=sentinel)
    window = (1,) * (lbl.ndim - 2) + (3, 3)
    return jax.lax.reduce_window(
        padded,
        jnp.asarray(sentinel, lbl.dtype),
        jax.lax.min,
        window_dimensions=window,
        window_strides=(1,) * lbl.ndim,
        padding="VALID",
    )


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(fg: jnp.ndarray, max_iters: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label 8-connected foreground components of a (T, H, W) bool batch.

    Returns (labels, counts): labels is int32 (T, H, W) with background 0 and
    components numbered 1..N per frame in raster-first-occurrence order;
    counts is (T,) int32 per-frame component totals.
    """
    T, H, W = fg.shape
    P = H * W
    sentinel = P  # larger than any linear index

    idx = jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 1) * W + jax.lax.broadcasted_iota(
        jnp.int32, (T, H, W), 2
    )
    lbl0 = jnp.where(fg, idx, sentinel)

    # Sentinel row appended so background/sentinel gathers stay in range.
    def jump(lbl_flat):
        ext = jnp.concatenate(
            [lbl_flat, jnp.full((T, 1), sentinel, jnp.int32)], axis=1
        )
        return jnp.take_along_axis(ext, lbl_flat, axis=1)

    def body(state):
        lbl, _, it = state
        pooled = _min_pool_8(lbl, sentinel)
        cand = jnp.where(fg, jnp.minimum(lbl, pooled), sentinel)
        flat = cand.reshape(T, P)
        flat = jump(jump(flat))  # path halving x2
        new = jnp.where(fg, flat.reshape(T, H, W), sentinel)
        return new, jnp.any(new != lbl), it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    lbl, _, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))

    # Compact: rank roots in raster order.
    is_root = jnp.logical_and(fg, lbl == idx)
    ranks = jnp.cumsum(is_root.reshape(T, P).astype(jnp.int32), axis=1)  # 1-based at roots
    ext = jnp.concatenate([ranks, jnp.zeros((T, 1), jnp.int32)], axis=1)
    labels = jnp.take_along_axis(ext, lbl.reshape(T, P), axis=1).reshape(T, H, W)
    labels = jnp.where(fg, labels, 0)
    counts = ranks[:, -1]
    return labels, counts


def wrap_labels_uint8(labels: jnp.ndarray) -> jnp.ndarray:
    """Reference parity: cc_labeling casts int labels to uint8
    (image_filtering.py:329), aliasing labels mod 256 (256 -> background)."""
    return (labels % 256).astype(jnp.uint8)
