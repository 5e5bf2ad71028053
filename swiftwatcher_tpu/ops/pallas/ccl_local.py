"""Pallas kernel: whole-frame in-VMEM CCL convergence.

The block-local / coarse-to-fine CCL literature (PAPERS.md: "Efficient
Parallel Connected Components Labeling with a Coarse-to-fine Strategy",
arXiv 1712.09789) resolves labels inside cache-resident blocks first and
merges block borders afterwards.  On a TPU v5e core the entire motion crop
(~500 x 250 f32 = 0.5 MB) fits in VMEM (~16 MB) many times over, so the
"block" is the WHOLE FRAME: one grid step floods a frame's labels to the
exact fixpoint without touching HBM between sweeps, and the border-merge
phase vanishes by construction.  (Frames too large for this budget fall
back to the two-phase loop in ops/ccl.py — see the gate there.)

Within the kernel, each super-sweep combines
  * the 3x3 min-pool (vertical + diagonal steps, the 8-connectivity core),
  * segmented min-scans along rows and columns, both directions —
    log-doubling shifts over (value, blocked) pairs, the classic
    work-efficient segmented scan: label information crosses an entire
    contiguous foreground run in ONE super-sweep rather than one pixel per
    sweep.
A component therefore converges in O(#direction changes of its geodesic)
super-sweeps instead of O(path length): a raster spiral with 60k pixels of
arm needs ~#arms sweeps (~125 on a 500 x 250 crop), where plain min-pool
flooding needs ~60k.

Replaces the stage the reference marks as its CPU bottleneck
(cv2.connectedComponents, image_filtering.py:325-329, __main__.py:78).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift(a: jnp.ndarray, k: int, axis: int, fill, forward: bool) -> jnp.ndarray:
    """out[p] = a[p - k] along `axis` when forward (fill at the low edge),
    a[p + k] when backward.  Static k: pure concat + slice, VPU-friendly."""
    H, W = a.shape
    if axis == 0:
        blk = jnp.full((k, W), fill, a.dtype)
        return (
            jnp.concatenate([blk, a[: H - k]], 0)
            if forward
            else jnp.concatenate([a[k:], blk], 0)
        )
    blk = jnp.full((H, k), fill, a.dtype)
    return (
        jnp.concatenate([blk, a[:, : W - k]], 1)
        if forward
        else jnp.concatenate([a[:, k:], blk], 1)
    )


def _seg_min_scan(v, bg, sentinel, axis: int, forward: bool):
    """Segmented running-min along `axis`: propagates within contiguous
    foreground runs, never across background.  State (v, b): after step k,
    v[p] = min over the run-limited window of length 2^k ending at p, and
    b[p] = 'window contains a gap'.  Standard log-doubling recurrence.

    `bg` is a 0/1 float mask (not bool: Mosaic cannot shift i1 vregs —
    'Invalid vector register cast'); OR becomes max."""
    L = v.shape[axis]
    b = bg
    k = 1
    while k < L:
        vs = _shift(v, k, axis, sentinel, forward)
        bs = _shift(b, k, axis, 1.0, forward)
        v = jnp.where(b > 0, v, jnp.minimum(v, vs))
        b = jnp.maximum(b, bs)
        k <<= 1
    return v


def _pool8(lbl, sentinel):
    H, W = lbl.shape
    row = jnp.full((1, W), sentinel, lbl.dtype)
    p = jnp.concatenate([row, lbl, row], axis=0)
    col = jnp.full((H + 2, 1), sentinel, lbl.dtype)
    p = jnp.concatenate([col, p, col], axis=1)
    m = None
    for dy in range(3):
        for dx in range(3):
            sl = p[dy : dy + H, dx : dx + W]
            m = sl if m is None else jnp.minimum(m, sl)
    return m


def _make_kernel(max_iters: int, sentinel: float):
    def kernel(lbl_ref, fg_ref, out_ref):
        fg = fg_ref[0] > 0
        bg = 1.0 - fg_ref[0].astype(jnp.float32)    # 0/1 float gap mask
        s = jnp.float32(sentinel)

        def sweep(lbl):
            lbl = jnp.where(fg, jnp.minimum(lbl, _pool8(lbl, s)), s)
            lbl = _seg_min_scan(lbl, bg, s, 1, True)
            lbl = _seg_min_scan(lbl, bg, s, 1, False)
            lbl = _seg_min_scan(lbl, bg, s, 0, True)
            lbl = _seg_min_scan(lbl, bg, s, 0, False)
            return lbl

        def body(state):
            lbl, _, it = state
            new = sweep(lbl)
            return new, jnp.any(new != lbl), it + 1

        def cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < max_iters)

        init = (lbl_ref[0], jnp.bool_(True), jnp.int32(0))
        lbl, _, _ = jax.lax.while_loop(cond, body, init)
        out_ref[0] = lbl

    return kernel


@functools.partial(jax.jit, static_argnames=("max_iters", "sentinel", "interpret"))
def converge_frames(
    lbl: jnp.ndarray,       # (N, H, W) f32 initial labels (sentinel at bg)
    fg: jnp.ndarray,        # (N, H, W) bool foreground
    max_iters: int,
    sentinel: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flood every frame's labels to the per-frame fixpoint, entirely in
    VMEM (each frame converges at its own pace — no lockstep over the
    batch, no HBM traffic between sweeps, no gathers)."""
    N, H, W = lbl.shape
    return pl.pallas_call(
        _make_kernel(max_iters, sentinel),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lbl, fg.astype(jnp.int32))
