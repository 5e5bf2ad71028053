"""Pallas kernel: the front half of an IALM iteration in one HBM pass.

Per iteration the XLA path runs three separate passes over the (B, T, P)
state: the E-update chain (reads X, A, Y), the M chain (reads X, E, Y), and
the Gram matmul (reads M).  This kernel computes all three from one read of
(X, A, Y) per tile:

    Eraw = X - A + inv_mu * Y
    E    = max(Eraw - lmbda*inv_mu, 0) + min(Eraw + lmbda*inv_mu, 0)
    M    = X - E + inv_mu * Y
    G   += M M^T        (accumulated across the P-tile grid axis)

Elementwise math is bit-identical f32; the in-kernel Gram dot runs in the
MXU's fast mode, which is fine — G only seeds the eigenbasis that the
one-sided polish round repairs (see ops/rpca.py).

P must be a multiple of the tile width; the caller zero-pads (zero pixel
columns are exactly neutral for IALM — proven in tests/test_rpca.py).
The per-window inv_mu scalars ride in as a scalar-prefetch argument.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1536  # lanes per tile (12 x 128); ~16 VMEM buffers of (21, TILE) f32


def _make_kernel(lmbda: float):
    def kernel(inv_mu_ref, x_ref, a_ref, y_ref, e_ref, m_ref, g_ref):
        b = pl.program_id(0)
        inv_mu = inv_mu_ref[b]
        x = x_ref[0]
        a = a_ref[0]
        y = y_ref[0]
        eraw = x - a + inv_mu * y
        shrink = jnp.float32(lmbda) * inv_mu
        e = jnp.maximum(eraw - shrink, 0.0) + jnp.minimum(eraw + shrink, 0.0)
        m = x - e + inv_mu * y
        e_ref[0] = e
        m_ref[0] = m

        @pl.when(pl.program_id(1) == 0)
        def _():
            g_ref[0] = jnp.zeros_like(g_ref[0])

        g_ref[0] += jnp.dot(m, m.T, preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("lmbda", "interpret"))
def ialm_front(
    X: jnp.ndarray,
    A: jnp.ndarray,
    Y: jnp.ndarray,
    inv_mu: jnp.ndarray,
    lmbda: float,
    interpret: bool = False,
):
    """(B, T, P) state + (B,) inv_mu -> (E, M, G) in one fused pass.

    Requires P % TILE == 0 (caller pads)."""
    B, T, P = X.shape
    assert P % TILE == 0
    n_tiles = P // TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, T, TILE), lambda b, t, s: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, TILE), lambda b, t, s: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, TILE), lambda b, t, s: (b, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, TILE), lambda b, t, s: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, TILE), lambda b, t, s: (b, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, T), lambda b, t, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    E, M, G = pl.pallas_call(
        _make_kernel(lmbda),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, P), jnp.float32),
            jax.ShapeDtypeStruct((B, T, P), jnp.float32),
            jax.ShapeDtypeStruct((B, T, T), jnp.float32),
        ),
        interpret=interpret,
    )(inv_mu.astype(jnp.float32), X, A, Y)
    return E, M, G
