"""Pallas kernel: seed compact CCL ranks and flood them in ONE HBM pass.

After the label flood converges, every foreground pixel holds its
component's root (minimum linear raster index); the reference's label
values are then 1..N in raster-first-occurrence order — each pixel's final
label is the RANK of its root among the frame's roots
(cv2.connectedComponents semantics, image_filtering.py:325-329; see
ops/ccl.py).  The XLA compaction ranks roots with a (T, P) two-level
cumulative sum (~9 ms per 672-frame batch) and then FLOODS ranks back
through each component with a second chunked min-pool flood (~16 ms) —
every chunk a full HBM round trip.

Here the whole frame stays in VMEM for the entire compaction:

  * rank the roots with an in-register raster cumsum of the root mask
    (lane-axis log-shift prefix sums + a row-offset prefix over the
    per-row totals);
  * seed rank[root] = cumsum[root], everything else = sentinel;
  * run S separable 3x3 min sweeps back to back (identical arithmetic to
    ccl_sweep.py) — realistic swift blobs (diameter < S) reach their
    fixpoint inside the kernel; the caller verifies convergence with one
    cheap pool pass and finishes pathological frames with the existing
    chunked flood / whole-frame converge machinery — bit-identical output.

One HBM read of the converged labels (the foreground mask is implicit:
lbl < sentinel), one write of the rank map: the cumsum, the seed and all
S sweeps ride VMEM.  Measured on v5e at (672, 216, 432): 9.6 ms vs
~25.5 ms for the two-level cumsum + chunked bf16 rank flood it replaces.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Frames per grid step: the body keeps ~6 (H, W) f32 temps live per frame;
# 2 frames at crop sizes is ~5 MB against the ~16 MB scoped-VMEM budget.
_FRAMES_PER_STEP = 2

# Sweeps fused after seeding.  Covers components of flood distance <= 12
# — single blobs AND merged blob pairs (the realistic worst case), so the
# caller's chunked finish flood almost never runs; larger components are
# finished there exactly.  Swept on v5e over the FULL label_components at
# (672, 216, 432) realistic blobs: 6 -> 37.5 ms (stragglers pay chunked
# HBM round trips), 10 -> 35.9, 12 -> 29.4, 14 -> 29.8.
RANK_SWEEPS = 12


def _make_kernel(F: int, H: int, W: int, sweeps: int, sentinel: float):
    P = float(sentinel)

    def kernel(lbl_ref, out_ref):
        # Per-frame 2D bodies: Mosaic's layout rules want >= 2 dims on
        # reductions/broadcasts ((1,1)-keepdims is the supported shape).
        for f in range(F):
            lbl = lbl_ref[f]                        # (H, W) f32
            # the converged label image already encodes the mask
            fg = lbl < jnp.float32(P)
            row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
            idx = (row * W + col).astype(jnp.float32)   # exact: P < 2^24
            is_root = jnp.logical_and(fg, lbl == idx)
            m = jnp.where(is_root, 1.0, 0.0)
            # inclusive within-row prefix sum (lane-axis log shifts)
            rc = m
            s = 1
            while s < W:
                z = jnp.zeros((H, s), jnp.float32)
                rc = rc + jnp.concatenate([z, rc[:, : W - s]], axis=1)
                s <<= 1
            # Row totals broadcast across lanes WITHOUT width-1 arrays or
            # keepdims reductions (both hit Mosaic layout limits): a lane
            # max-butterfly over the monotone inclusive cumsum leaves every
            # lane holding its row's total (max of any suffix == rc[:, -1]).
            base = rc
            s = 1
            while s < W:
                z = jnp.zeros((H, s), jnp.float32)      # rc >= 0
                base = jnp.maximum(
                    base, jnp.concatenate([base[:, s:], z], axis=1)
                )
                s <<= 1
            # exclusive row-offset prefix over per-row totals, at full width
            # — the same (s, W)/(H-s, W) sublane concat shape the production
            # sweep kernel uses.
            inc = base
            s = 1
            while s < H:
                z = jnp.zeros((s, W), jnp.float32)
                inc = inc + jnp.concatenate([z, inc[: H - s, :]], axis=0)
                s <<= 1
            csum = rc + (inc - base)                # raster-order root rank
            rank = jnp.where(is_root, csum, jnp.float32(P))
            # S separable 3x3 min sweeps (same arithmetic as ccl_sweep.py)
            col_s = jnp.full((H, 1), P, jnp.float32)
            row_s = jnp.full((1, W), P, jnp.float32)
            prev = rank
            for i in range(sweeps):
                prev = rank
                left = jnp.concatenate([col_s, rank[:, :-1]], axis=1)
                right = jnp.concatenate([rank[:, 1:], col_s], axis=1)
                rmin = jnp.minimum(jnp.minimum(left, right), rank)
                up = jnp.concatenate([row_s, rmin[:-1, :]], axis=0)
                down = jnp.concatenate([rmin[1:, :], row_s], axis=0)
                rank = jnp.where(
                    fg, jnp.minimum(jnp.minimum(up, down), rmin), jnp.float32(P)
                )
            out_ref[f] = rank

    return kernel


@functools.partial(jax.jit, static_argnames=("sweeps", "sentinel", "interpret"))
def rank_seed_sweep(
    lbl: jnp.ndarray,
    sweeps: int,
    sentinel: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) converged f32 labels -> f32 rank map.

    The foreground mask is implicit (lbl < sentinel), saving its read.

    lbl must be at its flood fixpoint (each foreground pixel = its
    component's min linear index; background = sentinel == H*W).  Returns
    the f32 rank map after seeding + `sweeps` min sweeps: background =
    sentinel, roots carry their exact 1-based raster rank (values < 2^24,
    so ANY component count is exact — no capacity gate), and components
    whose flood distance exceeds `sweeps` are left partially flooded —
    the caller checks convergence with one cheap pool pass and finishes
    stragglers with the chunked flood machinery (ops/ccl.py), so the
    final labels are bit-identical to the pure-XLA path.
    """
    N, H, W = lbl.shape
    F = _FRAMES_PER_STEP
    pad = (-N) % F
    if pad:
        lbl = jnp.concatenate(
            [lbl, jnp.full((pad, H, W), sentinel, lbl.dtype)], axis=0
        )
    rank = pl.pallas_call(
        _make_kernel(F, H, W, sweeps, sentinel),
        out_shape=jax.ShapeDtypeStruct((N + pad, H, W), jnp.float32),
        grid=((N + pad) // F,),
        in_specs=[
            pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lbl.astype(jnp.float32))
    return rank[:N] if pad else rank
