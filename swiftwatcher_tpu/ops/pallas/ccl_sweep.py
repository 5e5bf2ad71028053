"""Pallas kernel: K label-propagation sweeps per HBM round trip.

The CCL inner loop is 3x3 min-pool label flooding (ops/ccl.py).  In XLA,
each sweep re-reads the label image from HBM (and the 9-shifted-slice min
reads it ~9x); this kernel keeps a frame's labels in VMEM and runs K
sweeps back to back — one HBM read and one write per K sweeps — plus a
per-frame changed flag so the outer while_loop can stop without an extra
full-array comparison pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad1_const(a: jnp.ndarray, value) -> jnp.ndarray:
    H, W = a.shape
    row = jnp.full((1, W), value, a.dtype)
    a = jnp.concatenate([row, a, row], axis=0)
    col = jnp.full((H + 2, 1), value, a.dtype)
    return jnp.concatenate([col, a, col], axis=1)


def _make_kernel(H: int, W: int, sweeps: int, sentinel: float):
    def kernel(lbl_ref, fg_ref, out_ref):
        lbl = lbl_ref[0]
        fg = fg_ref[0] > 0
        s = jnp.float32(sentinel)
        for _ in range(sweeps):
            p = _pad1_const(lbl, s)
            m = None
            for dy in range(3):
                for dx in range(3):
                    sl = p[dy : dy + H, dx : dx + W]
                    m = sl if m is None else jnp.minimum(m, sl)
            lbl = jnp.where(fg, jnp.minimum(lbl, m), s)
        out_ref[0] = lbl

    return kernel


@functools.partial(jax.jit, static_argnames=("sweeps", "sentinel", "interpret"))
def sweep_chunk(
    lbl: jnp.ndarray,
    fg: jnp.ndarray,
    sweeps: int,
    sentinel: float,
    interpret: bool = False,
):
    """(N, H, W) f32 labels + bool fg -> labels after `sweeps` min-pools.
    (Convergence is checked by the caller; a fused compare costs one cheap
    VPU pass.)"""
    N, H, W = lbl.shape
    return pl.pallas_call(
        _make_kernel(H, W, sweeps, sentinel),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lbl, fg.astype(jnp.int32))
