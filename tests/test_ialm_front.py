"""Fused IALM front kernel (interpret mode) vs the plain XLA chain."""

import numpy as np

import jax.numpy as jnp

from swiftwatcher_tpu.ops.pallas.ialm_front import TILE, ialm_front


def test_ialm_front_matches_xla(rng):
    B, T, P = 3, 21, 2 * TILE
    X = rng.standard_normal((B, T, P)).astype(np.float32) * 100
    A = rng.standard_normal((B, T, P)).astype(np.float32) * 50
    Y = rng.standard_normal((B, T, P)).astype(np.float32)
    inv_mu = rng.uniform(0.1, 100.0, size=(B,)).astype(np.float32)
    lmbda = 0.01

    E, M, G = ialm_front(X, A, Y, inv_mu, lmbda, interpret=True)

    # Reference = the jitted XLA chain this kernel replaces (FMA contraction
    # may differ from plain numpy by an ulp, so compare against XLA itself).
    import jax

    @jax.jit
    def xla_chain(x, a, y, im):
        im = im[:, None, None]
        eraw = x - a + im * y
        e = jnp.maximum(eraw - lmbda * im, 0.0) + jnp.minimum(eraw + lmbda * im, 0.0)
        m = x - e + im * y
        g = jnp.einsum("btp,bsp->bts", m, m)
        return e, m, g

    E0, M0, G0 = xla_chain(X, A, Y, jnp.asarray(inv_mu))
    np.testing.assert_allclose(np.asarray(E), np.asarray(E0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M0), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G0), rtol=1e-4)  # tile-order accumulation; production G is bf16 anyway


def test_ialm_front_zero_padding_neutral(rng):
    B, T = 2, 21
    X = rng.standard_normal((B, T, TILE)).astype(np.float32) * 100
    Xp = np.concatenate([X, np.zeros((B, T, TILE), np.float32)], axis=-1)
    Z = np.zeros_like(Xp)
    inv_mu = np.full((B,), 5.0, np.float32)
    E, M, G = ialm_front(Xp, Z, Z, inv_mu, 0.01, interpret=True)
    assert np.asarray(E)[:, :, TILE:].max() == 0
    assert np.asarray(M)[:, :, TILE:].max() == 0
