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


# Row-chunk granularity of the in-kernel early-out.  RPCA motion images
# are overwhelmingly sub-threshold noise (the birds are tiny): on the
# bench scene 88% of 36-row chunks have NO pixel above the threshold in
# their (extended) input slice, and for those the output is provably all
# zeros — the bilateral (a weighted average) cannot exceed the local max,
# threshold-to-zero kills everything <= thresh, and the opening cannot
# resurrect zeros.  Skipping the 48-tap exp loop there removes ~90% of
# the kernel's compute.
_CHUNK_ROWS = 36


def _make_kernel(H: int, W: int, radius: int, cfg: PipelineConfig):
    gauss_color = -0.5 / (cfg.bilateral_sigma_color**2)
    gauss_space = -0.5 / (cfg.bilateral_sigma_space**2)
    offsets = _bilateral_offsets(radius)
    thresh = float(cfg.motion_threshold)

    def kernel(pad_ref, out_ref):
        # Mosaic can't cast u8->f32 directly; hop through int32.
        p = pad_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H+2r, W+2r)

        for a in range(0, H, _CHUNK_ROWS):
            b = min(a + _CHUNK_ROWS, H)
            # everything influencing opened rows [a, b): thr rows
            # [a-2, b+2) <- bilateral taps over p rows [a-2, b+2+2r)
            lo = max(a - 2, 0)
            hi = min(b + 2 + 2 * radius, H + 2 * radius)
            guard = p[lo:hi, :]

            def compute(a=a, b=b):
                # bilateral + threshold for the extended rows [ea, eb)
                ea, eb = max(a - 2, 0), min(b + 2, H)
                n = eb - ea
                center = p[radius + ea : radius + eb, radius : radius + W]
                num = jnp.zeros((n, W), jnp.float32)
                den = jnp.zeros((n, W), jnp.float32)
                for i, j, r2 in offsets:
                    sw = jnp.float32(math.exp(r2 * gauss_space))
                    s = p[
                        radius + ea + i : radius + ea + i + n,
                        radius + j : radius + j + W,
                    ]
                    d = s - center
                    w = sw * jnp.exp(d * d * jnp.float32(gauss_color))
                    num = num + w * s
                    den = den + w
                bil = jnp.round(num / den)           # cvRound half-to-even
                thr = jnp.where(bil > thresh, bil, 0.0)
                # erosion rows [ec_a, ec_b) from thr rows [ec_a-1, ec_b+1)
                # with edge replication at the FRAME borders only
                ec_a, ec_b = max(a - 1, 0), min(b + 1, H)
                top = thr[0:1] if ec_a - 1 < 0 else thr[ec_a - 1 - ea : ec_a - ea]
                bot = thr[n - 1 : n] if ec_b + 1 > H else thr[ec_b + 1 - ea - 1 : ec_b + 1 - ea]
                tv = jnp.concatenate(
                    [top, thr[ec_a - ea : ec_b - ea], bot], axis=0
                )
                tv = jnp.concatenate([tv[:, 0:1], tv, tv[:, -1:]], axis=1)
                ero = _min3x3(tv)                    # rows [ec_a, ec_b)
                # dilation rows [a, b) from eroded rows [a-1, b+1) with
                # frame-border replication
                etop = ero[0:1] if a - 1 < 0 else ero[a - 1 - ec_a : a - ec_a]
                ebot = (
                    ero[ec_b - ec_a - 1 : ec_b - ec_a]
                    if b + 1 > H
                    else ero[b + 1 - ec_a - 1 : b + 1 - ec_a]
                )
                ev = jnp.concatenate(
                    [etop, ero[a - ec_a : b - ec_a], ebot], axis=0
                )
                ev = jnp.concatenate([ev[:, 0:1], ev, ev[:, -1:]], axis=1)
                opened = _max3x3(ev)                 # rows [a, b)
                return jnp.clip(opened, 0.0, 255.0).astype(jnp.int32)

            active = jnp.max(guard) > thresh
            out = jax.lax.cond(
                active,
                compute,
                lambda a=a, b=b: jnp.zeros((b - a, W), jnp.int32),
            )
            out_ref[0, a:b, :] = out.astype(jnp.uint8)

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
