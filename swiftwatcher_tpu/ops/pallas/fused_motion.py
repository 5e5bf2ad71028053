"""Fused motion post-filter as one Pallas TPU kernel.

bilateral(7, 15, 1) -> threshold-to-zero(15) -> 3x3 grey opening, the whole
per-frame chain of data_structures.py:194-204, in a single VMEM-resident
kernel: one frame per grid step, all intermediates live in registers/VMEM,
one HBM read of the (reflect-padded) motion image and one HBM write of the
filtered result — versus four kernel round-trips through HBM for the
unfused XLA version.

Border semantics match the reference exactly: the bilateral sees
BORDER_REFLECT_101 (pre-padded by the caller, radius 3); erosion/dilation
see edge replication of the previous stage's output (built in-kernel by
concatenating edge rows/columns).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import PipelineConfig, DEFAULT_CONFIG
from ..filtering import _bilateral_offsets


def _edge_pad1(a: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (H+2, W+2) edge replication via concatenation."""
    a = jnp.concatenate([a[0:1, :], a, a[-1:, :]], axis=0)
    return jnp.concatenate([a[:, 0:1], a, a[:, -1:]], axis=1)


def _min3x3(a: jnp.ndarray) -> jnp.ndarray:
    H, W = a.shape[0] - 2, a.shape[1] - 2
    out = None
    for dy in range(3):
        for dx in range(3):
            s = a[dy : dy + H, dx : dx + W]
            out = s if out is None else jnp.minimum(out, s)
    return out


def _max3x3(a: jnp.ndarray) -> jnp.ndarray:
    H, W = a.shape[0] - 2, a.shape[1] - 2
    out = None
    for dy in range(3):
        for dx in range(3):
            s = a[dy : dy + H, dx : dx + W]
            out = s if out is None else jnp.maximum(out, s)
    return out


def _make_kernel(H: int, W: int, radius: int, cfg: PipelineConfig):
    gauss_color = -0.5 / (cfg.bilateral_sigma_color**2)
    gauss_space = -0.5 / (cfg.bilateral_sigma_space**2)
    offsets = _bilateral_offsets(radius)
    thresh = float(cfg.motion_threshold)

    def kernel(pad_ref, out_ref):
        # Mosaic can't cast u8->f32 directly; hop through int32.
        p = pad_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H+2r, W+2r)
        center = p[radius : radius + H, radius : radius + W]
        num = jnp.zeros((H, W), jnp.float32)
        den = jnp.zeros((H, W), jnp.float32)
        for i, j, r2 in offsets:
            sw = jnp.float32(math.exp(r2 * gauss_space))
            s = p[radius + i : radius + i + H, radius + j : radius + j + W]
            d = s - center
            w = sw * jnp.exp(d * d * jnp.float32(gauss_color))
            num = num + w * s
            den = den + w
        bil = jnp.round(num / den)                   # cvRound half-to-even
        thr = jnp.where(bil > thresh, bil, 0.0)
        opened = _max3x3(_edge_pad1(_min3x3(_edge_pad1(thr))))
        out_ref[0] = jnp.clip(opened, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_motion_filter(
    motion: jnp.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) uint8 motion -> filtered uint8, one fused kernel pass."""
    N, H, W = motion.shape
    radius = max(cfg.bilateral_d // 2, 1)
    padded = jnp.pad(
        motion, ((0, 0), (radius, radius), (radius, radius)), mode="reflect"
    )
    kernel = _make_kernel(H, W, radius, cfg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.uint8),
        grid=(N,),
        in_specs=[
            pl.BlockSpec(
                (1, H + 2 * radius, W + 2 * radius),
                lambda n: (n, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(padded)
