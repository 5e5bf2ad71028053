"""Region statistics as fixed-capacity padded tables.

Replaces skimage.measure.regionprops (image_filtering.py:332-335) — whose
downstream consumers only use `.centroid`, `.bbox`, `.label`, `.area` — with
moment accumulation over the uint8 label map into dense (T, 256) tables.
Slot k holds the statistics of label value k (the union of all aliased
components with that value, matching regionprops on the reference's
uint8-wrapped label image); slot 0 (background) is marked invalid.

Dynamic per-frame segment lists become a static MAX_LABELS=256 table with a
validity mask — the key static-shape design that lets the whole window
pipeline compile once (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import chex

MAX_LABELS = 256  # uint8 label domain, slot 0 = background


@chex.dataclass(frozen=True)
class RegionTable:
    """Per-frame region statistics, padded to MAX_LABELS slots.

    Shapes are (T, MAX_LABELS) unless noted. Sums are exact int32 so float
    centroids can be derived at any precision downstream.
    """

    area: jnp.ndarray      # int32 pixel count
    sum_y: jnp.ndarray     # int32 sum of row indices
    sum_x: jnp.ndarray     # int32 sum of col indices
    min_y: jnp.ndarray     # int32 bbox top (inclusive)
    min_x: jnp.ndarray     # int32 bbox left (inclusive)
    max_y: jnp.ndarray     # int32 bbox bottom (exclusive, regionprops style)
    max_x: jnp.ndarray     # int32 bbox right (exclusive)
    valid: jnp.ndarray     # bool, area > 0 and label != 0

    @property
    def centroid_y(self) -> jnp.ndarray:
        return self.sum_y / jnp.maximum(self.area, 1)

    @property
    def centroid_x(self) -> jnp.ndarray:
        return self.sum_x / jnp.maximum(self.area, 1)

    @property
    def num_segments(self) -> jnp.ndarray:
        return jnp.sum(self.valid, axis=-1)


@jax.jit
def region_tables(labels_u8: jnp.ndarray) -> RegionTable:
    """Compute RegionTable for a (T, H, W) uint8 label batch."""
    T, H, W = labels_u8.shape
    P = H * W
    seg = labels_u8.reshape(T, P).astype(jnp.int32)

    ys = jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 1).reshape(T, P)
    xs = jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 2).reshape(T, P)
    ones = jnp.ones((T, P), jnp.int32)

    def per_frame(seg_f, ys_f, xs_f, ones_f):
        area = jax.ops.segment_sum(ones_f, seg_f, num_segments=MAX_LABELS)
        sum_y = jax.ops.segment_sum(ys_f, seg_f, num_segments=MAX_LABELS)
        sum_x = jax.ops.segment_sum(xs_f, seg_f, num_segments=MAX_LABELS)
        min_y = jax.ops.segment_min(ys_f, seg_f, num_segments=MAX_LABELS)
        min_x = jax.ops.segment_min(xs_f, seg_f, num_segments=MAX_LABELS)
        max_y = jax.ops.segment_max(ys_f, seg_f, num_segments=MAX_LABELS)
        max_x = jax.ops.segment_max(xs_f, seg_f, num_segments=MAX_LABELS)
        return area, sum_y, sum_x, min_y, min_x, max_y, max_x

    area, sum_y, sum_x, min_y, min_x, max_y, max_x = jax.vmap(per_frame)(
        seg, ys, xs, ones
    )

    label_ids = jnp.arange(MAX_LABELS, dtype=jnp.int32)[None, :]
    valid = jnp.logical_and(area > 0, label_ids != 0)
    zero = jnp.zeros_like(area)
    return RegionTable(
        area=jnp.where(valid, area, zero),
        sum_y=jnp.where(valid, sum_y, zero),
        sum_x=jnp.where(valid, sum_x, zero),
        min_y=jnp.where(valid, min_y, zero),
        min_x=jnp.where(valid, min_x, zero),
        max_y=jnp.where(valid, max_y + 1, zero),   # exclusive, regionprops bbox
        max_x=jnp.where(valid, max_x + 1, zero),
        valid=valid,
    )
