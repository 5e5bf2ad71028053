"""Device-side classifier preprocessing: PIL-parity antialiased resize as
static-shape weighted matmuls.

The reference preprocesses each segment on the host, one at a time, through
torchvision's ToPILImage -> Resize((24, 24)) -> ToTensor -> Normalize stack
(segment_classification.py:18-24).  PIL's bilinear resize is ALWAYS
antialiased: the kernel support is scaled by the downsampling ratio, the
normalized tap weights are quantized to 22-bit fixed point, and the image
is resampled horizontally into a uint8 intermediate, then vertically
(Pillow Resample.c: precompute_coeffs + normalize_coeffs_8bpc +
ImagingResampleHorizontal_8bpc).

That whole recipe is a pair of small matmuls with data-independent STATIC
shapes once every segment crop is zero-padded into a fixed (MAXH, MAXW)
canvas: padding taps get weight exactly 0, so one compiled program serves
every segment geometry.  The tap-weight matrices are tiny (24 x MAXW per
segment) and depend only on the integer (h, w) — they are computed on the
host in float64, exactly PIL's arithmetic, so the quantized coefficients
are bit-identical to Pillow's; all per-pixel work (the resample, the
pad-to-224, the normalize, the CNN forward) runs on device in one jitted
program.

Parity: BIT-EXACT.  The tap weights are 22-bit fixed-point integers and the
resample accumulates coeff * pixel products in int32 (bounded by
255 * 2^22 < 2^31, exactly PIL's accumulator) — integer arithmetic is exact
on every backend, so the device resize reproduces Pillow byte-for-byte
across all segment geometries (test_classifier_device.py sweeps 100 size
pairs).  A float32 formulation was measured first: ~0.6% of pixels land
exactly on rounding half-boundaries (quantized coeffs x integer pixels) and
f32 accumulation noise flips them — hence integer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, DEFAULT_CONFIG

# PIL quantizes normalized tap weights to this fixed-point precision
# (Pillow src/libImaging/Resample.c: PRECISION_BITS = 32 - 8 - 2).
_PRECISION = 22


def resize_coeffs(sizes: np.ndarray, max_in: int, out_size: int) -> np.ndarray:
    """Per-segment PIL-bilinear tap-weight matrices, (N, out_size, max_in)
    int32 in 22-bit fixed point.

    sizes: (N,) true input extents; taps at index >= size get weight exactly
    0, so zero-padded canvases reproduce PIL's edge handling (PIL clips the
    tap window to the image and renormalizes — identical to masking then
    normalizing, since taps at the support boundary have weight 0).

    Float64 throughout, then the 22-bit quantization — bit-identical to
    Pillow's precompute_coeffs/normalize_coeffs_8bpc for every (size,
    out_size) pair (verified against PIL in tests).
    """
    sizes = np.asarray(sizes, np.int64)
    scale = sizes.astype(np.float64)[:, None] / out_size            # (N, 1)
    fscale = np.maximum(scale, 1.0)
    centers = (np.arange(out_size, dtype=np.float64) + 0.5)[None, :] * scale
    j = np.arange(max_in, dtype=np.float64)
    # bilinear filter f(x) = max(0, 1 - |x|), stretched by the filter scale
    w = 1.0 - np.abs(
        (j[None, None, :] + 0.5 - centers[:, :, None]) / fscale[:, :, None]
    )
    np.clip(w, 0.0, None, out=w)
    w *= j[None, None, :] < sizes[:, None, None]
    w /= np.sum(w, axis=-1, keepdims=True)
    # PIL: kk[x] = (int)(k * (1 << 22) + 0.5) for k >= 0 (all bilinear taps)
    return np.floor(w * (1 << _PRECISION) + 0.5).astype(np.int32)


def _shift_u8(ss: jnp.ndarray) -> jnp.ndarray:
    # PIL: clip8((sum + (1 << 21)) >> 22) — round half UP, then clamp
    return jnp.clip((ss + (1 << (_PRECISION - 1))) >> _PRECISION, 0, 255)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_batch(
    crops: jnp.ndarray,      # (N, MAXH, MAXW, 3) uint8, zero-padded canvases
    wh: jnp.ndarray,         # (N, out, MAXW) int32 fixed-point h tap weights
    wv: jnp.ndarray,         # (N, out, MAXH) int32 fixed-point v tap weights
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Segment canvases -> (N, 224, 224, 3) normalized network input.

    Replicates preprocess_segment (this package) / the reference transform
    stack (segment_classification.py:18-24) on device: antialiased 24x24
    resize (horizontal pass, uint8 round, vertical pass, uint8 round),
    zero-pad to 224, scale to [0,1], ImageNet-normalize — preserving the
    reference's BGR-bytes-as-RGB quirk (channels pass through untouched).
    """
    N = crops.shape[0]
    out = cfg.cnn_resize_to
    img = crops.astype(jnp.int32)
    # horizontal pass first, uint8 intermediate between passes (PIL order);
    # int32 accumulation is PIL's own and exact on every backend
    tmp = _shift_u8(jnp.einsum("now,nhwc->nhoc", wh, img))
    small = _shift_u8(jnp.einsum("noh,nhwc->nowc", wv, tmp))
    small = small.astype(jnp.float32) / 255.0
    pad = (cfg.cnn_input_size - out) // 2
    full = jnp.zeros((N, cfg.cnn_input_size, cfg.cnn_input_size, 3), jnp.float32)
    full = full.at[:, pad : pad + out, pad : pad + out, :].set(small)
    mean = jnp.asarray(cfg.cnn_mean, jnp.float32)
    std = jnp.asarray(cfg.cnn_std, jnp.float32)
    return (full - mean) / std


def pack_canvases(images, max_hw: int):
    """Host-side packing: variable-size uint8 crops -> one zero-padded
    (N, max_hw, max_hw, 3) canvas batch + true (h, w) vectors.

    Pure numpy slicing — no per-segment resampling, no PIL; everything
    per-pixel happens on device with static shapes."""
    n = len(images)
    canv = np.zeros((n, max_hw, max_hw, 3), np.uint8)
    hs = np.empty((n,), np.int32)
    ws = np.empty((n,), np.int32)
    for i, im in enumerate(images):
        h, w = im.shape[:2]
        canv[i, :h, :w] = im
        hs[i], ws[i] = h, w
    return canv, hs, ws
