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

import functools

import jax
import jax.numpy as jnp
import numpy as np
import chex

MAX_LABELS = 256  # uint8 label domain, slot 0 = background


@chex.dataclass(frozen=True)
class RegionTable:
    """Per-frame region statistics, padded to MAX_LABELS slots.

    Shapes are (..., MAX_LABELS). Sums are int32 (accumulated in f32 on the
    MXU — exact whenever a component's total coordinate mass stays below
    2^24, i.e. for any realistically-sized segment) so float centroids can
    be derived at any precision downstream.
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


# Label capacity of the fast moment path.  Realistic frames hold < 10
# segments; the full 256-slot path runs (via lax.cond) only when a frame in
# the batch actually uses a label >= this.
FAST_LABELS = 32


def _moment_tables(lab: jnp.ndarray, K: int, with_bbox: bool):
    """Moments/extents of labels 0..K-1 for (T, H, W) int32 labels.

    Moment accumulation is a one-hot reduction (XLA fuses the iota-compare
    one-hot into the sum) rather than scatter-adds, which are slow on TPU.
    Row/column extents come from per-row / per-column label presence masks,
    avoiding scatter-min/max.  The streamed virtual (T, H, W, K) one-hot is
    the cost of this op — linear in K, which is why the K=FAST_LABELS path
    exists.
    """
    T, H, W = lab.shape
    k_ids = jnp.arange(K, dtype=jnp.int32)

    # One-hot in bf16 (0/1 are exact) with f32 accumulation.  All sums stay
    # exact: per-row/column counts are <= max(H, W) and accumulate in f32;
    # coordinate-weighted sums are then taken over the SMALL count tensors.
    onehot = (lab[..., None] == k_ids).astype(jnp.bfloat16)
    row_counts = jnp.einsum(
        "thwk->thk", onehot, preferred_element_type=jnp.float32
    )
    col_counts = jnp.einsum(
        "thwk->twk", onehot, preferred_element_type=jnp.float32
    )
    area_f = jnp.sum(row_counts, axis=1)
    ys = jnp.arange(H, dtype=jnp.float32)
    sum_y_f = jnp.einsum("thk,h->tk", row_counts, ys, preferred_element_type=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    sum_x_f = jnp.einsum("twk,w->tk", col_counts, xs, preferred_element_type=jnp.float32)

    area = jnp.round(area_f).astype(jnp.int32)
    sum_y = jnp.round(sum_y_f).astype(jnp.int32)
    sum_x = jnp.round(sum_x_f).astype(jnp.int32)

    valid = jnp.logical_and(area > 0, k_ids[None, :] != 0)
    zero = jnp.zeros_like(area)

    if with_bbox:
        BIG = jnp.int32(1 << 20)
        row_has = row_counts > 0                       # (T, H, K)
        col_has = col_counts > 0                       # (T, W, K)
        yy = jnp.arange(H, dtype=jnp.int32)[None, :, None]
        xx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
        min_y = jnp.min(jnp.where(row_has, yy, BIG), axis=1)
        max_y = jnp.max(jnp.where(row_has, yy, -1), axis=1)
        min_x = jnp.min(jnp.where(col_has, xx, BIG), axis=1)
        max_x = jnp.max(jnp.where(col_has, xx, -1), axis=1)
        min_y = jnp.where(valid, min_y, zero)
        min_x = jnp.where(valid, min_x, zero)
        max_y = jnp.where(valid, max_y + 1, zero)      # exclusive, regionprops
        max_x = jnp.where(valid, max_x + 1, zero)
    else:
        min_y = min_x = max_y = max_x = zero

    pad = ((0, 0), (0, MAX_LABELS - K))
    def expand(a):
        return jnp.pad(a, pad) if K != MAX_LABELS else a

    return tuple(
        expand(a)
        for a in (
            jnp.where(valid, area, zero),
            jnp.where(valid, sum_y, zero),
            jnp.where(valid, sum_x, zero),
            min_y, min_x, max_y, max_x,
            valid,
        )
    )


@functools.partial(jax.jit, static_argnames=("with_bbox",))
def region_tables(labels_u8: jnp.ndarray, with_bbox: bool = True) -> RegionTable:
    """Compute RegionTable for a (..., H, W) uint8 label batch.

    The moment reduction streams a virtual (T, H, W, K) one-hot, so its cost
    is linear in the label capacity K.  Realistic frames hold far fewer than
    FAST_LABELS segments, so a runtime lax.cond picks the K=FAST_LABELS
    reduction (padded back to 256 slots with zeros — bit-identical output by
    construction) whenever every label in the batch fits, and the full
    K=256 path otherwise (pathological scenes, aliased-label stress tests).

    with_bbox=False skips the bbox work: tracking and event detection only
    use centroids (segment_tracking.py uses .centroid; bbox feeds only the
    --classify / --export crop extraction).
    """
    *lead, H, W = labels_u8.shape
    T = int(np.prod(lead)) if lead else 1
    lab = labels_u8.reshape(T, H, W).astype(jnp.int32)

    fits = jnp.max(labels_u8) < FAST_LABELS
    parts = jax.lax.cond(
        fits,
        lambda l: _moment_tables(l, FAST_LABELS, with_bbox),
        lambda l: _moment_tables(l, MAX_LABELS, with_bbox),
        lab,
    )
    area, sum_y, sum_x, min_y, min_x, max_y, max_x, valid = parts

    def shape(a):
        return a.reshape(*lead, MAX_LABELS) if lead else a[0]

    return RegionTable(
        area=shape(area),
        sum_y=shape(sum_y),
        sum_x=shape(sum_x),
        min_y=shape(min_y),
        min_x=shape(min_x),
        max_y=shape(max_y),
        max_x=shape(max_x),
        valid=shape(valid),
    )
