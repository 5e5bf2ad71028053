"""Zero-extra-dispatch classify: the CNN keep-mask fused into the tracking
scan (VERDICT r4 #1).

The r4 classify fast path's cost on a slow host link was dispatch round
trips, not compute: its committed budget showed classify_device 1.64 s per
1680 frames while the SqueezeNet forward itself is ~0.2 s
(tools/cnn_forward_ab.py).  Per consumed batch it paid: canvas upload +
hs upload + ws upload + a classify-program dispatch + a keep-mask readback
+ a separate track_window dispatch — each its own ~35 ms tunnel round trip
on this rig.

This module compiles ONE program per (padded_n, canvas-bucket) shape:

    coeff-table gather -> PIL-parity resize -> pad/normalize -> SqueezeNet
    -> argmax -> keep-mask scattered into the compacted valid slots ->
    kvalid AND -> the full tracking scan

with a single packed int32 meta upload riding alongside the u8 canvases,
and only the event buffers read back (shared with the tracking readback the
consume step already pays).  Results are identical to the unfused path by
construction: the keep-mask scatter lands at exactly the compacted slot
each crop was extracted from, degenerate (empty-slice) crops are dropped
via a forced-drop flag (the unfused path's keep=False), and padding rows
scatter out of bounds (mode="drop").

Reference anchor: segment_classification.py:26-44 (the --classify config:
classify each segment, keep label==1, then track survivors).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..models.preprocess import preprocess_batch, pack_canvases
from ..models.squeezenet import predict
from .tracking_jax import track_window


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"))
def classify_track_fused(
    params,
    coeff_table: jnp.ndarray,   # (mx, out, mx) i32 PIL tap-weight table
    canv: jnp.ndarray,          # (P, mx, mx, 3) u8 zero-padded crop canvases
    meta: jnp.ndarray,          # (4, P) i32: hs, ws, flat slot idx, drop flag
    state,                      # TrackState
    roi_mask: jnp.ndarray,
    cy: jnp.ndarray,            # (B, T, K) f32 compacted centroids
    cx: jnp.ndarray,
    kvalid: jnp.ndarray,        # (B, T, K) bool (already null-frame gated)
    fns: jnp.ndarray,           # (B*T,) i32
    active: jnp.ndarray,        # (B*T,) bool
    cfg: PipelineConfig = DEFAULT_CONFIG,
    chunk: int = 1,
):
    """One device program: classify every segment crop, AND the keep-mask
    into the compacted valid slots, and run the tracking scan.

    Returns (new_state, EventBuffer, n_kept) where n_kept is the number of
    real (non-padding) crops the CNN kept — the unfused path's
    metrics.segments_total increment — riding the event readback."""
    hs, ws, slot, drop = meta[0], meta[1], meta[2], meta[3]
    batch = preprocess_batch(canv, coeff_table[ws - 1], coeff_table[hs - 1], cfg)
    pred = predict(params, batch)
    keep_flat = (pred == 1) & (drop == 0)

    B, T, K = kvalid.shape
    # Padding rows carry slot == B*T*K (out of bounds) and are dropped by
    # the scatter; degenerate crops carry their real slot with drop=1 so
    # the scatter clears them (the unfused path's keep=False).
    keep = jnp.ones((B * T * K,), bool).at[slot].set(keep_flat, mode="drop")
    kvalid = kvalid & keep.reshape(B, T, K)
    n_kept = jnp.sum(keep_flat & (slot < B * T * K))

    state, events = track_window(
        state,
        roi_mask,
        cy.reshape(B * T, -1),
        cx.reshape(B * T, -1),
        kvalid.reshape(B * T, -1),
        fns,
        cfg,
        active=active,
        chunk=chunk,
    )
    return state, events, n_kept


def pack_fused(
    segment_filter, view, frames: dict, crop_region, timers=None
) -> Tuple[np.ndarray, np.ndarray, int] | None:
    """Host half of the fused program: extract every valid slot's crop,
    pack canvases, and build the (4, P) int32 meta plane (hs, ws, flat slot
    index, forced-drop flag) in ONE upload-ready array.

    view: _CompactTableView over the compacted (B, T, K) readback.
    frames: {(b, t): full-resolution BGR frame} for frames with >= 1 valid
    (and non-null) slot — the same dict batch_call takes.

    Returns (canv, meta, mx) or None when a crop exceeds every device
    canvas bucket (caller falls back to the unfused classify path, exactly
    as classify_images falls back to host PIL preprocessing)."""
    import time as _time

    t0 = _time.perf_counter()
    B, T, K = view.valid.shape
    images, slots, drops = [], [], []
    for key in sorted(frames.keys()):
        b, t = key
        imgs, degenerate = segment_filter._frame_images(
            view, key, frames[key], crop_region
        )
        ks = np.nonzero(view.valid[b, t])[0]
        for k, img, is_degen in zip(ks, imgs, degenerate):
            slots.append((b * T + t) * K + int(k))
            drops.append(1 if is_degen else 0)
            # degenerate (empty-slice) crops still occupy a batch row so
            # slot/drop alignment stays positional; a 1x1 zero canvas is
            # the cheapest placeholder
            images.append(img if not is_degen else np.zeros((1, 1, 3), np.uint8))
    if timers is not None:
        timers["classify_crop"] = timers.get("classify_crop", 0.0) + (
            _time.perf_counter() - t0
        )
    if not images:
        return None
    t1 = _time.perf_counter()
    mx = segment_filter._canvas_bucket(images)
    if mx == 0:  # oversized segment: no device canvas fits
        return None
    n = len(images)
    padded_n = segment_filter._padded_n(n)
    canv, hs, ws = pack_canvases(images, mx)
    slot = np.asarray(slots, np.int32)
    drop = np.asarray(drops, np.int32)
    if padded_n != n:
        pad = padded_n - n
        canv = np.concatenate([canv, np.zeros((pad, mx, mx, 3), np.uint8)])
        # size-1 padding keeps the coeff normalizer away from 0/0; the
        # out-of-bounds slot makes the keep scatter drop the row
        hs = np.concatenate([hs, np.ones(pad, np.int32)])
        ws = np.concatenate([ws, np.ones(pad, np.int32)])
        slot = np.concatenate([slot, np.full(pad, B * T * K, np.int32)])
        drop = np.concatenate([drop, np.ones(pad, np.int32)])
    meta = np.stack([hs, ws, slot, drop])
    segment_filter.upload_bytes += canv.nbytes + meta.nbytes
    if timers is not None:
        timers["classify_pack"] = timers.get("classify_pack", 0.0) + (
            _time.perf_counter() - t1
        )
    return canv, meta, mx
