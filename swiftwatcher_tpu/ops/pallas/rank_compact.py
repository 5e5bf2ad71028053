"""Pallas kernels: whole-CCL and rank-compaction passes that ride VMEM.

After the label flood converges, every foreground pixel holds its
component's root (minimum linear raster index); the reference's label
values are then 1..N in raster-first-occurrence order — each pixel's final
label is the RANK of its root among the frame's roots
(cv2.connectedComponents semantics, image_filtering.py:325-329; see
ops/ccl.py).  The XLA compaction ranks roots with a (T, P) two-level
cumulative sum (~9 ms per 672-frame batch) and then FLOODS ranks back
through each component with a second chunked min-pool flood (~16 ms) —
every chunk a full HBM round trip, on top of the chunked label flood
itself (init ~4 ms + ~12 ms).

Two kernels keep the whole frame in VMEM instead:

  * `label_rank_fused` — the ENTIRE realistic-scene CCL in one HBM pass:
    seed labels with the raster iota, run S separable 3x3 min sweeps,
    rank the surviving roots with an in-register raster cumsum (lane-axis
    log-shift prefix sums + a row-offset prefix over per-row totals),
    seed rank[root] = cumsum[root], and run S more sweeps to flood them.
    One read of the fg mask, one write each of the swept labels and the
    rank map.
  * `rank_seed_sweep` — the compaction half alone (cumsum + seed + S
    sweeps) for the fallback path that finished a pathological label
    flood with the chunked machinery first.

Correctness contract (ops/ccl.py): the label flood and the rank flood are
isomorphic — both propagate a minimum from the component's unique root at
one pixel per sweep over the same 8-neighborhood — so the label image
converging within S sweeps implies the rank map did too.  The caller
verifies the LABEL fixpoint with one cheap pool pass; frames that fail it
(flood distance > S: giant or snake-like components) are recomputed
through the chunked flood / whole-frame converge machinery, so final
labels are bit-identical for ANY input.  Rank values are f32-exact for
any component count (< 2^24).

Measured on v5e at (672, 216, 432) realistic blobs, full label_components
(matched chip moods): chunked XLA+sweep path 41.6 ms -> rank_seed_sweep
integration 29.4 ms -> label_rank_fused integration 18.5 ms.  Resident
bench same-moment A/B: 4694 -> 4744 fps over the rank_seed_sweep step
(and 4440 -> 4775 over the original chunked path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Frames per grid step: the fused body keeps ~8 (H, W) f32 temps live per
# frame (~32 B/px/frame); 2 frames at typical crop sizes is ~6 MB against
# the ~16 MB scoped-VMEM budget.  Large crops drop to 1 frame/step so the
# kernels stay inside the budget up to the caller's admission gate
# (ops/ccl.py local_kernel: H*W*4*8 <= 12 MiB, i.e. ~393k px ~= 12.6 MB
# of per-frame temps at F=1).
_FRAMES_PER_STEP = 2
_F1_BYTES = 12 * (1 << 20)  # per-step temp budget that forces F=1


def _frames_per_step(H: int, W: int) -> int:
    return 1 if _FRAMES_PER_STEP * H * W * 4 * 8 > _F1_BYTES else _FRAMES_PER_STEP

# Sweeps per flood stage.  Covers components of flood distance <= 12
# — single blobs AND merged blob pairs (the realistic worst case), so the
# caller's chunked finish flood almost never runs; larger components are
# finished there exactly.  Swept on v5e over the FULL label_components at
# (672, 216, 432) realistic blobs (rank_seed_sweep integration):
# 6 -> 37.5 ms (stragglers pay chunked HBM round trips), 10 -> 35.9,
# 12 -> 29.4, 14 -> 29.8.
RANK_SWEEPS = 12


def _sweep(x, fg, P, sweeps):
    """S separable 3x3 min sweeps (identical arithmetic to ccl_sweep.py)."""
    H, W = x.shape
    col_s = jnp.full((H, 1), P, jnp.float32)
    row_s = jnp.full((1, W), P, jnp.float32)
    for _ in range(sweeps):
        left = jnp.concatenate([col_s, x[:, :-1]], axis=1)
        right = jnp.concatenate([x[:, 1:], col_s], axis=1)
        rmin = jnp.minimum(jnp.minimum(left, right), x)
        up = jnp.concatenate([row_s, rmin[:-1, :]], axis=0)
        down = jnp.concatenate([rmin[1:, :], row_s], axis=0)
        x = jnp.where(fg, jnp.minimum(jnp.minimum(up, down), rmin), jnp.float32(P))
    return x


def _seed_ranks(lbl, fg, idx, P):
    """Rank roots (lbl == own index) in raster order via in-register
    prefix sums; return the seeded rank image (roots exact, else P).

    Mosaic layout constraints shape this code: no width-1 columns, no
    keepdims reductions — row totals are broadcast with a lane
    max-butterfly over the monotone inclusive cumsum, and the row-offset
    prefix runs at full width W (the same (s, W)/(H-s, W) sublane concat
    shape the production sweep kernel uses)."""
    H, W = lbl.shape
    is_root = jnp.logical_and(fg, lbl == idx)
    m = jnp.where(is_root, 1.0, 0.0)
    # inclusive within-row prefix sum (lane-axis log shifts)
    rc = m
    s = 1
    while s < W:
        z = jnp.zeros((H, s), jnp.float32)
        rc = rc + jnp.concatenate([z, rc[:, : W - s]], axis=1)
        s <<= 1
    # row totals broadcast across lanes: max of any suffix == rc[:, -1]
    base = rc
    s = 1
    while s < W:
        z = jnp.zeros((H, s), jnp.float32)      # rc >= 0
        base = jnp.maximum(base, jnp.concatenate([base[:, s:], z], axis=1))
        s <<= 1
    # exclusive row-offset prefix over per-row totals, at full width
    inc = base
    s = 1
    while s < H:
        z = jnp.zeros((s, W), jnp.float32)
        inc = inc + jnp.concatenate([z, inc[: H - s, :]], axis=0)
        s <<= 1
    csum = rc + (inc - base)                    # raster-order root rank
    return jnp.where(is_root, csum, jnp.float32(P))


def _iota_idx(H, W):
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (row * W + col).astype(jnp.float32)  # exact: H*W < 2^24


def _make_fused_kernel(F: int, H: int, W: int, sweeps: int, sentinel: float):
    P = float(sentinel)

    def kernel(fg_ref, lbl_ref, out_ref):
        # Per-frame 2D bodies: Mosaic's layout rules want >= 2 dims on
        # reductions/broadcasts.
        for f in range(F):
            fgf = fg_ref[f].astype(jnp.float32)

            def full_frame(fgf=fgf):
                fg = fgf > 0
                idx = _iota_idx(H, W)
                lbl = jnp.where(fg, idx, jnp.float32(P))
                lbl = _sweep(lbl, fg, P, sweeps)
                # In-kernel convergence certificate: one extra sweep while
                # the frame is VMEM-resident (~0.3 ms/batch) replaces the
                # caller's XLA pool-pass verify (~2-3 ms).  The sweep
                # operator is monotone with a unique fixpoint, so one
                # no-op sweep proves convergence.  The flag rides in the
                # f32 label output at [0, 0] as a NEGATIVE encoding
                # (-(v+1)); only the slow branch consumes lblk and decodes
                # it back (ops/ccl.py).
                probe = _sweep(lbl, fg, P, 1)
                changed = jnp.max(
                    jnp.where(probe != lbl, 1.0, 0.0), keepdims=True
                )                                                # (1, 1)
                row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
                at00 = jnp.logical_and(row == 0, col == 0)
                lbl_out = jnp.where(
                    jnp.logical_and(at00, changed > 0.0), -(lbl + 1.0), lbl
                )
                rank = _seed_ranks(lbl, fg, idx, P)
                rank = _sweep(rank, fg, P, sweeps)
                # FINAL compact labels (background 0) — saves the caller a
                # separate (T, P) convert pass on the fast path
                return lbl_out, jnp.where(fg, rank, 0.0).astype(jnp.int32)

            def empty_frame():
                # post-filtered surveillance frames are often ALL-quiet
                # (42% on the bench scene): skip the sweeps + cumsum and
                # emit the converged empty result directly
                return (
                    jnp.full((H, W), jnp.float32(P)),
                    jnp.zeros((H, W), jnp.int32),
                )

            lblo, labo = jax.lax.cond(
                jnp.max(fgf) > 0.0, full_frame, empty_frame
            )
            lbl_ref[f] = lblo
            out_ref[f] = labo

    return kernel


def _make_rank_kernel(F: int, H: int, W: int, sweeps: int, sentinel: float):
    P = float(sentinel)

    def kernel(lbl_ref, out_ref):
        for f in range(F):
            lbl = lbl_ref[f]                        # (H, W) f32
            # the converged label image already encodes the mask
            fg = lbl < jnp.float32(P)
            rank = _seed_ranks(lbl, fg, _iota_idx(H, W), P)
            out_ref[f] = _sweep(rank, fg, P, sweeps)

    return kernel


def _pad_frames(x, pad, fill):
    if not pad:
        return x
    H, W = x.shape[1], x.shape[2]
    return jnp.concatenate(
        [x, jnp.full((pad, H, W), fill, x.dtype)], axis=0
    )


@functools.partial(jax.jit, static_argnames=("sweeps", "sentinel", "interpret"))
def label_rank_fused(
    fg: jnp.ndarray,
    sweeps: int,
    sentinel: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, H, W) bool fg -> (swept f32 labels, compact int32 labels).

    Labels are seeded with the raster iota (background = sentinel == H*W)
    and min-swept `sweeps` times; ranks are seeded from the roots that
    survive those sweeps, swept as many times again, and emitted as the
    final compact int32 labeling (background 0).  The kernel certifies
    label-flood convergence itself (one extra VMEM sweep; monotone
    operator, so a no-op sweep proves the fixpoint) and encodes the
    per-frame flag as a NEGATIVE value at the f32 label output's [0, 0]
    (-(v+1)); converged frames' compact labels are exact (see module
    docstring), flagged frames are recomputed by the caller through the
    chunked machinery after decoding the marker.
    """
    N, H, W = fg.shape
    F = _frames_per_step(H, W)
    pad = (-N) % F
    fgp = _pad_frames(fg.astype(jnp.bfloat16), pad, 0)
    lbl, rank = pl.pallas_call(
        _make_fused_kernel(F, H, W, sweeps, sentinel),
        out_shape=(
            jax.ShapeDtypeStruct((N + pad, H, W), jnp.float32),
            jax.ShapeDtypeStruct((N + pad, H, W), jnp.int32),
        ),
        grid=((N + pad) // F,),
        in_specs=[
            pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fgp)
    return (lbl[:N], rank[:N]) if pad else (lbl, rank)


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
    F = _frames_per_step(H, W)
    pad = (-N) % F
    lblp = _pad_frames(lbl.astype(jnp.float32), pad, sentinel)
    rank = pl.pallas_call(
        _make_rank_kernel(F, H, W, sweeps, sentinel),
        out_shape=jax.ShapeDtypeStruct((N + pad, H, W), jnp.float32),
        grid=((N + pad) // F,),
        in_specs=[
            pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lblp)
    return rank[:N] if pad else rank
