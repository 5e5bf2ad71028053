"""The compiled per-window localization program.

One jitted function consumes a (T, Hc, Wc, 3) uint8 BGR crop batch and emits
fixed-capacity segment tables — the whole of the reference's
preprocess_queue + segment_queue hot path (data_structures.py:171-217)
as a single XLA program:

    grayscale -> IALM RPCA -> bilateral(7,15,1) -> thresh-to-zero(15)
    -> 3x3 grey opening -> 8-conn CCL -> uint8 label wrap -> region tables

No per-frame Python, no dynamic shapes: recompiles only when the crop
geometry (i.e. the chimney) changes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..ops.color import bgr_to_gray
from ..ops.rpca import rpca_motion_window, rpca_motion_window_batched
from ..ops.filtering import motion_postfilter
from ..ops.ccl import label_components, wrap_labels_uint8
from ..ops.props import RegionTable, region_tables


def _localize_impl(crop_bgr: jnp.ndarray, cfg: PipelineConfig):
    gray = bgr_to_gray(crop_bgr)
    if cfg.stabilize_max_shift > 0:  # opt-in extension; off = parity
        from ..ops.stabilize import stabilize_window

        gray, _ = stabilize_window(gray, cfg.stabilize_max_shift)
    motion, iters = rpca_motion_window(gray, cfg)
    filtered = motion_postfilter(motion, cfg)
    labels, _ = label_components(filtered > 0, cfg.ccl_max_iters)
    labels_u8 = wrap_labels_uint8(labels, cfg.label_modulus)
    table = region_tables(labels_u8)
    return table, labels_u8, iters


@functools.partial(jax.jit, static_argnames=("cfg",))
def localize_window(
    crop_bgr: jnp.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> Tuple[RegionTable, jnp.ndarray, jnp.ndarray]:
    """(T, Hc, Wc, 3) uint8 BGR crop -> (RegionTable, labels_u8, ialm_iters).

    labels_u8 is returned for debug/introspection parity with the
    reference's named intermediate stages (data_structures.py:151-169).
    """
    return _localize_impl(crop_bgr, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "with_bbox"))
def localize_windows(
    crops_bgr: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
) -> Tuple[RegionTable, jnp.ndarray]:
    """Batched variant: (B, T, Hc, Wc, 3) -> (RegionTable batched over B,
    ialm_iters (B,)).

    One dispatch amortizes the host<->device round trip over B windows.
    RPCA runs natively batched (explicit done-masking, not vmap — vmap's
    while_loop batching was ~15x slower on TPU); the per-frame stages are
    frame-parallel and simply fold B into the frame axis.  Bboxes are
    skipped unless requested (tracking uses centroids only).
    """
    gray = bgr_to_gray(crops_bgr)
    return localize_windows_gray(gray, cfg, with_bbox)


@functools.partial(jax.jit, static_argnames=("cfg", "with_bbox"))
def localize_windows_gray(
    gray: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
    stab_ref: jnp.ndarray = None,
) -> Tuple[RegionTable, jnp.ndarray]:
    """As localize_windows but taking pre-grayscaled (B, T, H, W) uint8.

    Used when the host converts to grayscale before upload (bit-identical
    either way — see ops.color.bgr_to_gray_host) to cut transfer bytes 3x on
    bandwidth-bound links."""
    B, T, H, W = gray.shape
    if cfg.stabilize_max_shift > 0:  # opt-in extension; off = parity
        from ..ops.stabilize import stabilize_window

        # stab_ref (the ROI-mask sample frame's gray crop) pins every
        # window to the mask's pose; None falls back to the window mean
        gray, _ = stabilize_window(gray, cfg.stabilize_max_shift, stab_ref)
    motion, iters = rpca_motion_window_batched(gray, cfg)
    flat = motion.reshape(B * T, H, W)
    from ..ops.filtering import apply_postfilter

    filtered = apply_postfilter(flat, cfg)
    labels, _ = label_components(filtered > 0, cfg.ccl_max_iters)
    labels_u8 = wrap_labels_uint8(labels, cfg.label_modulus)
    table = region_tables(labels_u8, with_bbox=with_bbox)
    table = jax.tree.map(lambda a: a.reshape(B, T, *a.shape[1:]), table)
    return table, iters


@functools.partial(jax.jit, static_argnames=("cfg", "with_bbox", "shape"))
def localize_windows_packed(
    first: jnp.ndarray,
    packed: jnp.ndarray,
    esc_idx: jnp.ndarray,
    esc_val: jnp.ndarray,
    shape: Tuple[int, int, int, int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
    stab_ref: jnp.ndarray = None,
) -> Tuple[RegionTable, jnp.ndarray]:
    """As localize_windows_gray, but consuming a wire-codec packet
    (io/wirecodec.py): the bit-lossless delta4 decode runs on device as a
    prologue of the same compiled program, so bandwidth-bound links ship
    ~half the bytes with zero extra dispatches."""
    from ..io.wirecodec import decode_delta4

    B, T, H, W = shape
    gray = decode_delta4(first, packed, esc_idx, esc_val, B * T, H, W)
    return localize_windows_gray(gray.reshape(B, T, H, W), cfg, with_bbox,
                                 stab_ref)


@functools.partial(jax.jit, static_argnames=("cfg", "with_bbox", "shape"))
def localize_windows_packed6(
    mode: jnp.ndarray,
    bg: jnp.ndarray,
    lvl1: jnp.ndarray,
    lvl2: jnp.ndarray,
    esc_idx: jnp.ndarray,
    esc_val: jnp.ndarray,
    shape: Tuple[int, int, int, int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
    stab_ref: jnp.ndarray = None,
) -> Tuple[RegionTable, jnp.ndarray]:
    """As localize_windows_packed, for the denser delta6 (wire codec v2)
    format — predictive base-6 residuals decoded on device as a prologue of
    the same compiled program (io/wirecodec.py:decode_delta6)."""
    from ..io.wirecodec import decode_delta6

    B, T, H, W = shape
    gray = decode_delta6(mode, bg, lvl1, lvl2, esc_idx, esc_val, B * T, H, W)
    return localize_windows_gray(gray.reshape(B, T, H, W), cfg, with_bbox,
                                 stab_ref)


@functools.partial(jax.jit, static_argnames=("cfg", "keep_stages"))
def localize_window_debug(
    crop_bgr: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep_stages: bool = True,
):
    """Debug variant returning every named intermediate stage, mirroring the
    reference's Frame.processed_frames OrderedDict keys."""
    gray = bgr_to_gray(crop_bgr)
    motion, iters = rpca_motion_window(gray, cfg)
    from ..ops.filtering import bilateral_blur, thresh_to_zero, grayscale_opening

    bil = bilateral_blur(
        motion, cfg.bilateral_d, cfg.bilateral_sigma_color, cfg.bilateral_sigma_space
    )
    thr = thresh_to_zero(bil, cfg.motion_threshold)
    opened = grayscale_opening(thr, cfg.opening_size)
    labels, counts = label_components(opened > 0, cfg.ccl_max_iters)
    labels_u8 = wrap_labels_uint8(labels, cfg.label_modulus)
    table = region_tables(labels_u8)
    stages = {
        "grayscale": gray,
        "RPCA": motion,
        "bilateral": bil,
        "thresh_15": thr,
        "opened": opened,
        "cc_labeling": labels_u8,
    }
    return table, stages, iters
