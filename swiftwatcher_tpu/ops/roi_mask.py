"""Chimney ROI-mask construction ops (once-per-video init path).

Replicates, in jnp, the reference's generate_roi_mask chain
(image_filtering.py:99-180):

    crop(ROI strip) -> medianBlur(9) x2 -> B channel -> Otsu binary
    -> Canny(0, 256) -> 20x1 upward dilation -> paste into full-frame
    canvas -> grayscale (identity on 2-D) -> crop(crop_region) -> Otsu

Each op reproduces OpenCV's integer semantics:
  * medianBlur: k x k per-channel median, BORDER_REPLICATE
  * Otsu: double-precision between-class-variance scan, first maximum wins;
    THRESH_BINARY keeps values strictly greater than the threshold
  * Canny: Sobel(3) with BORDER_REPLICATE, L1 magnitude, cv2's fixed-point
    TG22 direction quantization and its exact strict/non-strict neighbor
    comparisons, zero-magnitude virtual borders, 8-connected hysteresis
  * dilate(N x 1, anchor (0,0)): max over the N pixels *below* (dilation
    extends bright pixels upward)

This is init-time code (runs once per video), so clarity over speed; the
hysteresis flood runs as a bounded while_loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..geometry import Region


@functools.partial(jax.jit, static_argnames=("ksize",))
def median_blur(img: jnp.ndarray, ksize: int = 9) -> jnp.ndarray:
    """cv2.medianBlur parity: per-channel k x k median, edge-replicated.

    img: (H, W) or (H, W, C) uint8.
    """
    r = ksize // 2
    chan = img.ndim == 3
    x = img if chan else img[..., None]
    padded = jnp.pad(x, ((r, r), (r, r), (0, 0)), mode="edge")
    H, W = x.shape[0], x.shape[1]
    shifts = [
        jax.lax.dynamic_slice(padded, (i, j, 0), (H, W, x.shape[2]))
        for i in range(ksize)
        for j in range(ksize)
    ]
    stack = jnp.stack(shifts, axis=0)  # (k*k, H, W, C)
    med = jnp.sort(stack, axis=0)[(ksize * ksize) // 2]
    return med if chan else med[..., 0]


def otsu_threshold_value(img) -> int:
    """Otsu threshold of a uint8 image, cv2's exact double-precision scan
    (first maximum wins).

    Runs on the host in float64: cv2's getThreshVal_Otsu_8u uses doubles,
    and a float32 scan can flip the argmax when two bins' between-class
    variances differ below f32 resolution.  This is init-only code (once
    per video), so host math costs nothing.
    """
    import numpy as np

    img = np.asarray(img)
    hist = np.bincount(img.astype(np.int32).ravel(), minlength=256).astype(np.float64)
    scale = 1.0 / img.size
    i = np.arange(256, dtype=np.float64)
    p = hist * scale
    q1 = np.cumsum(p)
    cum_ip = np.cumsum(i * p)
    mu_total = cum_ip[-1]
    q2 = 1.0 - q1
    eps = np.float32(1.1920929e-07)  # FLT_EPSILON, as cv2 uses
    valid = (np.minimum(q1, q2) >= eps) & (np.maximum(q1, q2) <= 1.0 - eps)
    mu1 = cum_ip / np.where(q1 > 0, q1, 1.0)
    mu2 = (mu_total - q1 * mu1) / np.where(q2 > 0, q2, 1.0)
    sigma = q1 * q2 * (mu1 - mu2) ** 2
    sigma = np.where(valid, sigma, -1.0)
    # cv2 keeps the FIRST maximum ('sigma > max_sigma'); argmax does too.
    return int(np.argmax(sigma))


def otsu_binary(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.threshold(..., THRESH_BINARY + THRESH_OTSU): 255 where strictly
    above the Otsu threshold (image_filtering.py:141-150)."""
    t = otsu_threshold_value(img)
    return jnp.where(img.astype(jnp.int32) > t, jnp.uint8(255), jnp.uint8(0))


def _sobel3(img_i32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel dx, dy with BORDER_REPLICATE (cv2.Canny's choice)."""
    p = jnp.pad(img_i32, 1, mode="edge")
    H, W = img_i32.shape

    def sl(dy, dx):
        return jax.lax.dynamic_slice(p, (dy, dx), (H, W))

    # dx kernel: [[-1,0,1],[-2,0,2],[-1,0,1]]
    dx = (
        -sl(0, 0) + sl(0, 2)
        - 2 * sl(1, 0) + 2 * sl(1, 2)
        - sl(2, 0) + sl(2, 2)
    )
    # dy kernel: [[-1,-2,-1],[0,0,0],[1,2,1]]
    dy = (
        -sl(0, 0) - 2 * sl(0, 1) - sl(0, 2)
        + sl(2, 0) + 2 * sl(2, 1) + sl(2, 2)
    )
    return dx, dy


@functools.partial(jax.jit, static_argnames=("low", "high"))
def canny(img: jnp.ndarray, low: int = 0, high: int = 256) -> jnp.ndarray:
    """cv2.Canny(img, low, high) parity: L1 gradient, aperture 3.

    Follows canny.cpp's scalar path: fixed-point TG22 direction
    quantization, its exact >/>= neighbor comparisons, zero-magnitude
    virtual borders, 8-connected hysteresis from strong (> high) pixels
    through candidates (> low).
    """
    x = img.astype(jnp.int32)
    dx, dy = _sobel3(x)
    mag = jnp.abs(dx) + jnp.abs(dy)  # L2gradient=False

    # Virtual zero borders for neighbor comparisons.
    magp = jnp.pad(mag, 1, mode="constant", constant_values=0)
    H, W = mag.shape

    def nb(dyo, dxo):
        return jax.lax.dynamic_slice(magp, (1 + dyo, 1 + dxo), (H, W))

    CANNY_SHIFT = 15
    TG22 = int(0.4142135623730950488016887242097 * (1 << CANNY_SHIFT) + 0.5)

    ax = jnp.abs(dx)
    ay = jnp.abs(dy) << CANNY_SHIFT
    tg22x = ax * TG22
    tg67x = tg22x + (ax << (CANNY_SHIFT + 1))
    s = jnp.where((dx ^ dy) < 0, -1, 1)

    horiz = ay < tg22x
    vert = jnp.logical_and(~horiz, ay > tg67x)
    diag = jnp.logical_and(~horiz, ~vert)

    keep_h = jnp.logical_and(mag > nb(0, -1), mag >= nb(0, 1))
    keep_v = jnp.logical_and(mag > nb(-1, 0), mag >= nb(1, 0))
    # s = +1: compare up-left (strict) and down-right (strict)
    keep_d_pos = jnp.logical_and(mag > nb(-1, -1), mag > nb(1, 1))
    keep_d_neg = jnp.logical_and(mag > nb(-1, 1), mag > nb(1, -1))
    keep_d = jnp.where(s > 0, keep_d_pos, keep_d_neg)

    keep = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_d))
    candidate = jnp.logical_and(mag > low, keep)
    strong = jnp.logical_and(candidate, mag > high)

    # 8-connected hysteresis: grow strong through candidates to fixpoint.
    def body(state):
        edges, _ = state
        ep = jnp.pad(edges, 1, mode="constant", constant_values=False)
        grown = jax.lax.reduce_window(
            ep,
            False,
            jax.lax.bitwise_or,
            window_dimensions=(3, 3),
            window_strides=(1, 1),
            padding="VALID",
        )
        new = jnp.logical_and(candidate, grown)
        new = jnp.logical_or(new, edges)
        return new, jnp.any(new != edges)

    edges, _ = jax.lax.while_loop(
        lambda st: st[1], body, (strong, jnp.asarray(True))
    )
    return jnp.where(edges, jnp.uint8(255), jnp.uint8(0))


@functools.partial(jax.jit, static_argnames=("n",))
def dilate_upwards(img: jnp.ndarray, n: int = 20) -> jnp.ndarray:
    """cv2.dilate with an (n x 1) kernel anchored at (0, 0): each output
    pixel takes the max of the n pixels at and below it, extending bright
    regions upward (image_filtering.py:161-169)."""
    padded = jnp.pad(img, ((0, n - 1), (0, 0)), mode="constant", constant_values=0)
    return jax.lax.reduce_window(
        padded,
        jnp.asarray(0, img.dtype),
        jax.lax.max,
        window_dimensions=(n, 1),
        window_strides=(1, 1),
        padding="VALID",
    )


def generate_roi_mask(
    frame_bgr,
    roi_region: Region,
    crop_region: Region,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Full ROI-mask build (image_filtering.py:99-122).

    frame_bgr: (H, W, 3) uint8 full frame.  Returns the crop-region-sized
    uint8 mask (255 = inside chimney ROI).
    """
    frame_bgr = jnp.asarray(frame_bgr)
    strip = frame_bgr[
        roi_region[0][1] : roi_region[1][1], roi_region[0][0] : roi_region[1][0]
    ]
    blurred = median_blur(median_blur(strip, cfg.roi_median_ksize), cfg.roi_median_ksize)
    b_channel = blurred[..., 0]
    thresh = otsu_binary(b_channel)
    edges = canny(thresh, 0, 256)
    dilated = dilate_upwards(edges, cfg.roi_dilate_n)

    canvas = jnp.zeros(frame_bgr.shape[:2], jnp.uint8)
    canvas = jax.lax.dynamic_update_slice(
        canvas, dilated, (roi_region[0][1], roi_region[0][0])
    )
    cropped = canvas[
        crop_region[0][1] : crop_region[1][1], crop_region[0][0] : crop_region[1][0]
    ]
    return otsu_binary(cropped)
