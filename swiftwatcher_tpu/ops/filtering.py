"""Per-frame motion post-filters: bilateral blur, threshold-to-zero, opening.

These replicate, on device, the per-frame OpenCV/scipy calls of the
reference's hot loop (data_structures.py:194-204):

    bilateral_blur(frame, d=7, sigmaColor=15, sigmaSpace=1)   cv2 C++
    thresh_to_zero(frame, 15)                                 cv2 C++
    grayscale_opening(frame, (3, 3))                          scipy.ndimage C

Semantics notes:
  * cv2.bilateralFilter with d=7 uses radius 3 and a *circular* neighborhood
    (offsets with sqrt(i^2+j^2) <= radius), float32 space/color weight LUTs,
    BORDER_REFLECT_101 padding, and rounds sum/wsum half-to-even.
  * cv2.THRESH_TOZERO keeps values strictly greater than the threshold.
  * scipy.ndimage.grey_opening uses mode='reflect' borders; for a 3x3
    footprint (1-pixel reach) that equals edge replication.

All functions are batch-first: input (..., H, W) uint8.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG


def _bilateral_offsets(radius: int) -> Tuple[Tuple[int, int, float], ...]:
    """Circular neighborhood offsets (i, j, r^2), in cv2's scan order."""
    offs = []
    for i in range(-radius, radius + 1):
        for j in range(-radius, radius + 1):
            r = math.sqrt(i * i + j * j)
            if r > radius:
                continue
            offs.append((i, j, r * r))
    return tuple(offs)


@functools.partial(jax.jit, static_argnames=("d", "sigma_color", "sigma_space"))
def bilateral_blur(
    frames: jnp.ndarray,
    d: int = 7,
    sigma_color: float = 15.0,
    sigma_space: float = 1.0,
) -> jnp.ndarray:
    """cv2.bilateralFilter-parity bilateral blur over uint8 frames.

    Args:
      frames: (..., H, W) uint8.
    Returns:
      (..., H, W) uint8.
    """
    radius = max(d // 2, 1)
    gauss_color = -0.5 / (sigma_color * sigma_color)
    gauss_space = -0.5 / (sigma_space * sigma_space)

    pad = [(0, 0)] * (frames.ndim - 2) + [(radius, radius), (radius, radius)]
    padded = jnp.pad(frames, pad, mode="reflect")  # BORDER_REFLECT_101
    center = frames.astype(jnp.float32)

    H, W = frames.shape[-2], frames.shape[-1]
    num = jnp.zeros(frames.shape, jnp.float32)
    den = jnp.zeros(frames.shape, jnp.float32)
    for i, j, r2 in _bilateral_offsets(radius):
        sw = jnp.float32(math.exp(r2 * gauss_space))
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(padded, radius + i, radius + i + H, axis=frames.ndim - 2),
            radius + j,
            radius + j + W,
            axis=frames.ndim - 1,
        )
        sv = shifted.astype(jnp.float32)
        # cv2 looks the color weight up in a float32 LUT of exp(d^2 * coeff)
        # computed in DOUBLE and rounded once; evaluating f32 exp on the VPU
        # avoids 29 gathers (which dominated this kernel's runtime on TPU)
        # at the cost of a last-ulp weight difference on some inputs —
        # measured envelope: <=+-1 uint8 on <1% of output pixels
        # (tests/test_filtering.py asserts it; PARITY.md deviation 9).
        ddiff = sv - center
        w = sw * jnp.exp(ddiff * ddiff * jnp.float32(gauss_color))
        num = num + w * sv
        den = den + w
    # cvRound: round half to even.
    out = jnp.round(num / den)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def thresh_to_zero(frames: jnp.ndarray, thresh: int) -> jnp.ndarray:
    """cv2.THRESH_TOZERO: keep values strictly above `thresh`, else 0."""
    return jnp.where(frames > thresh, frames, jnp.zeros_like(frames))


def _pool2d(frames: jnp.ndarray, size: Tuple[int, int], op: str) -> jnp.ndarray:
    """Min/max pool with edge-replicate borders (ndimage 'reflect' for 1-px
    reach) over the trailing two dims, stride 1, same shape out."""
    kh, kw = size
    ph_lo, ph_hi = (kh - 1) // 2, kh // 2
    pw_lo, pw_hi = (kw - 1) // 2, kw // 2
    pad = [(0, 0)] * (frames.ndim - 2) + [(ph_lo, ph_hi), (pw_lo, pw_hi)]
    padded = jnp.pad(frames, pad, mode="edge")
    init = jnp.iinfo(frames.dtype).max if op == "min" else jnp.iinfo(frames.dtype).min
    reducer = jax.lax.min if op == "min" else jax.lax.max
    window = (1,) * (frames.ndim - 2) + (kh, kw)
    strides = (1,) * frames.ndim
    return jax.lax.reduce_window(
        padded,
        jnp.asarray(init, frames.dtype),
        reducer,
        window_dimensions=window,
        window_strides=strides,
        padding="VALID",
    )


@functools.partial(jax.jit, static_argnames=("size",))
def grayscale_opening(frames: jnp.ndarray, size: Tuple[int, int] = (3, 3)) -> jnp.ndarray:
    """scipy.ndimage.grey_opening parity: erosion then dilation, reflect borders."""
    return _pool2d(_pool2d(frames, size, "min"), size, "max")


def motion_postfilter(
    motion: jnp.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> jnp.ndarray:
    """bilateral -> thresh-to-zero -> 3x3 opening, as in segment_queue
    (data_structures.py:187-204)."""
    x = bilateral_blur(
        motion, cfg.bilateral_d, cfg.bilateral_sigma_color, cfg.bilateral_sigma_space
    )
    x = thresh_to_zero(x, cfg.motion_threshold)
    return grayscale_opening(x, cfg.opening_size)


def apply_postfilter(
    motion: jnp.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> jnp.ndarray:
    """Postfilter with the fused-kernel gate — THE one gate shared by the
    single-chip and sharded localization paths.

    The fused Pallas pass (one HBM round trip instead of four) bakes a 3x3
    opening, so any other cfg.opening_size must take the XLA chain — gating
    here keeps a non-default opening from being silently ignored on TPU."""
    import jax

    if (
        cfg.use_pallas_postfilter
        and jax.default_backend() == "tpu"
        and tuple(cfg.opening_size) == (3, 3)
    ):
        from .pallas.fused_motion import fused_motion_filter

        return fused_motion_filter(motion, cfg)
    return motion_postfilter(motion, cfg)


# MEASURED NEGATIVE (r3, don't re-litigate without a new layout idea): a
# postfilter kernel that emits the CCL flood seed (lbl0 f32) directly —
# skipping the filtered-u8 materialization between the stages — is ~4%
# SLOWER end to end (42.3 vs 40.6 ms per 672 frames on v5e).  Two causes:
# XLA already fuses the u8 boundary into the CCL init, and deriving the
# foreground mask from the f32 seed (lbl0 < sentinel) reads 251 MB where
# filtered>0 read 63.  A second kernel output plane for fg also blows the
# 16 MB scoped-VMEM budget (by 68 KB).  The cheap real win at this
# boundary was the two-level rank cumsum (ops/scan.py, −2.3 ms).
