"""Color conversion ops.

BGR -> grayscale with OpenCV's exact fixed-point arithmetic
(reference call sites: image_filtering.py:188-196, used per frame at
data_structures.py:183-185).  OpenCV computes

    Y = (R*4899 + G*9617 + B*1868 + 2^13) >> 14

in int32 (with R2Y + G2Y + B2Y forced to sum to 2^shift), which differs from
a float BT.601 dot product by occasional one-count rounding, so we reproduce
the integer form bit-exactly on device.  Modern OpenCV (>= 4.x) uses a
15-bit shift; coefficients below were verified exhaustively against the
installed cv2.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV fixed-point BT.601 coefficients (shift = 15):
# R2Y = round(0.299 * 2^15), G2Y = round(0.587 * 2^15), B2Y = 2^15 - R2Y - G2Y.
_R2Y = 9798
_G2Y = 19235
_B2Y = 3735
_SHIFT = 15


def bgr_to_gray_host(frames) -> "np.ndarray":
    """Host-side exact counterpart of bgr_to_gray (cv2 when available, else
    the same fixed-point formula in NumPy).

    Exists for transfer-bound deployments: grayscale on host cuts
    host->device bytes 3x, and cv2.cvtColor IS the reference's own op, so
    host and device paths are all bit-identical."""
    import numpy as np

    try:
        import cv2

        x = np.asarray(frames)
        H, W = x.shape[-3], x.shape[-2]
        flat = x.reshape(-1, H, W, 3)
        out = np.empty((flat.shape[0], H, W), np.uint8)
        for i in range(flat.shape[0]):
            out[i] = cv2.cvtColor(flat[i], cv2.COLOR_BGR2GRAY)
        return out.reshape(x.shape[:-1])
    except ImportError:
        x = np.asarray(frames).astype(np.int32)
        b, g, r = x[..., 0], x[..., 1], x[..., 2]
        y = (r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_SHIFT - 1))) >> _SHIFT
        return y.astype(np.uint8)


def bgr_to_gray(frames: jnp.ndarray) -> jnp.ndarray:
    """Convert uint8 BGR image(s) to uint8 grayscale, bit-exact with cv2.

    Args:
      frames: uint8 array of shape (..., 3), channel order B, G, R.

    Returns:
      uint8 array of shape (...,).
    """
    x = frames.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = (r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)
