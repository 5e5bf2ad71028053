"""Opt-in electronic image stabilization for jittery footage.

The reference pipeline has no answer to camera shake: its RPCA background
model (image_filtering.py:220-301 in /root/reference) assumes the scene is
static, so integer-pixel jitter turns every structure edge into sparse
"motion" and both detection and tracking degrade (the committed ACCURACY
corpus scene `jitter2` drops to detection F1 0.5 at reference semantics).

`stabilize_window` aligns each frame of a window to a reference pose by
exhaustive integer-shift search, entirely on device and inside the same
compiled localization program:

  1. reference image R — in the pipeline this is the gray crop of the SAME
     frame the ROI mask is built from (runner.py), so stabilized
     coordinates, the mask, and track centroids across every window all
     share one pose: the ROI band is only ~7 px tall, and aligning windows
     to their own mean pose instead was measured to miss band-edge entries
     by the 1-2 px pose difference.  Standalone callers may omit ref and
     get the window's rounded temporal mean (under jitter the static
     structure dominates the mean, so it sits at the average camera pose);
  2. for every candidate shift (dy, dx) in [-J, J]^2, score frame F by
     SAD(F[y+dy, x+dx], R) — the candidates are STATIC slices of an
     edge-padded copy, so XLA sees (2J+1)^2 dense elementwise reductions,
     no gathers and no dynamic shapes;
  3. each frame becomes the argmin candidate, materialized by a masked
     sum over the same static slices (again gather-free: TPU gathers cost
     ~10 ms per 8M elements on this hardware, a masked sum of (2J+1)^2
     slices is pure VPU work).

Integer-only alignment: the search is exact for integer shake and within
half a pixel of optimal for sub-pixel shake, which is already below the
pipeline's own sensitivity (the bilateral blur + 15-level threshold absorb
sub-pixel edge residue — measured: jitter1 scores F1 1.0 even WITHOUT
stabilization).  Set stabilize_max_shift to the full PEAK-TO-PEAK shake
amplitude when in doubt: the search must cover the worst frame's offset
from the reference frame's own pose.

All arithmetic is integer (rounded-mean reference, i32 SAD sums), so the
scores — and the argmin, which breaks ties toward the smaller candidate
index — are bit-identical under any XLA reduction order or sharding:
mesh-mode runs stay event-for-event equal to unsharded ones.

This is an extension the reference does not have; it defaults OFF
(config.stabilize_max_shift = 0) and is a compile-time no-op there, so
reference bit-parity is untouched unless a user opts in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def stabilize_window(
    gray: jnp.ndarray, max_shift: int, ref: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align (..., T, H, W) uint8 frames to a reference pose.

    ref: (H, W) reference image (uint8/int32) — in-pipeline, the gray crop
    of the ROI-mask sample frame.  None uses each window's rounded temporal
    mean.  Returns (aligned_u8, shifts_i32) where shifts[..., t] = (dy, dx)
    is the chosen displacement: aligned[t, y, x] =
    edgepad(gray)[t, y + dy + J, x + dx + J].  max_shift (J) is static;
    J = 0 returns the input unchanged.
    """
    if max_shift <= 0:
        shape = gray.shape[:-2] + (2,)
        return gray, jnp.zeros(shape, jnp.int32)
    J = int(max_shift)
    H, W = gray.shape[-2], gray.shape[-1]
    if ref is None:
        T = gray.shape[-3]
        ref = (
            (gray.astype(jnp.int32).sum(axis=-3, keepdims=True) * 2 + T)
            // (2 * T)
        )  # round-half-up integer mean, (..., 1, H, W)
    else:
        ref = jnp.asarray(ref).astype(jnp.int32)  # (H, W), broadcasts

    pad = [(0, 0)] * (gray.ndim - 2) + [(J, J), (J, J)]
    padded = jnp.pad(gray, pad, mode="edge")

    # SAD of every candidate slice vs the reference.  i32 accumulation:
    # the per-frame bound is H*W*255 (< 2^31 up to ~8.4 MPx frames).
    sads = []
    for a in range(2 * J + 1):
        for b in range(2 * J + 1):
            cand = padded[..., a : a + H, b : b + W].astype(jnp.int32)
            sads.append(jnp.abs(cand - ref).sum(axis=(-2, -1)))
    sad = jnp.stack(sads)                      # (C, ..., T)
    best = jnp.argmin(sad, axis=0)             # (..., T)

    out = jnp.zeros(gray.shape, jnp.uint8)
    for c in range(len(sads)):
        a, b = divmod(c, 2 * J + 1)
        cand = padded[..., a : a + H, b : b + W]
        mask = (best == c)[..., None, None]
        out = jnp.where(mask, cand, out)

    shifts = jnp.stack(
        [best // (2 * J + 1) - J, best % (2 * J + 1) - J], axis=-1
    ).astype(jnp.int32)
    return out, shifts
