"""RPCA background subtraction via Inexact Augmented Lagrange Multipliers.

TPU-native reformulation of the reference's per-window RPCA
(image_filtering.py:220-301).  The reference runs a full LAPACK SVD of the
(pixels x T) matrix every iteration on the host; here the entire solver is a
single `lax.while_loop` compiled by XLA, and the SVD of the tall-skinny
iterate M (P x T, T = 21) is computed through its row space only:

    R = qr(M).R;  [[0, R^T], [R, 0]] = Q diag(+/-S) Q^T   (2T x 2T eigh)
    A = U f(S) V^T = M V diag(f(S)/S) V^T

which turns the hot kernel into a tall-skinny QR, two MXU-friendly
(P x T) x (T x T) matmuls, and a tiny refined eigendecomposition — no
LAPACK, no Gram squaring of the condition number (see `_row_space_svd`).

Parity notes (quirks of the reference that are deliberately replicated):
  * image_filtering.py:285: `svp = (S > 1/mu).shape[0]` evaluates to T (the
    *length* of the boolean array, not the count), so every iteration keeps
    all T singular values and `S - 1/mu` may go negative.  The row-space
    reconstruction above is exact for this full-spectrum case.
  * image_filtering.py:269-271: "norm_two" is the 2-norm of the *raveled*
    matrix, i.e. the Frobenius norm, not the spectral norm.
  * image_filtering.py:243-245: the returned motion image is the *negated*
    sparse part clipped to [0, 255] (keeps only motion darker than the
    background), truncated to uint8.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG

# TPU MXU float32 matmuls default to a faster bf16 multi-pass mode; the IALM
# residual check (tol=1e-3 relative) needs true f32 accumulation or the
# solver stalls at the precision floor and runs to max_iter.
_HIGHEST = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HIGHEST, preferred_element_type=a.dtype)


def _refined_eigh(G: jnp.ndarray, steps: int = 2):
    """eigh with first-order Newton refinement.

    XLA's eigh is a fixed-sweep Jacobi solver whose reconstruction error
    (~1e-8 in f64) is far above machine precision; two refinement steps
    (V <- orth(V (I + F)), F_ij = (V^T G V)_ij / (d_j - d_i), clamped for
    clustered eigenvalues) bring it to ~1e-13, which the IALM iteration needs
    for parity with the reference's LAPACK SVD.  Costs a few TxT matmuls.
    """
    evals, V = jnp.linalg.eigh(G)
    n = G.shape[0]
    eye = jnp.eye(n, dtype=G.dtype)
    for _ in range(steps):
        R = _mm(V.T, _mm(G, V))
        d = jnp.diagonal(R)
        diff = d[None, :] - d[:, None]
        scale = jnp.max(jnp.abs(d)) + jnp.asarray(jnp.finfo(G.dtype).tiny, G.dtype)
        # Skip (harmless) rotations within near-degenerate clusters.
        safe = jnp.where(jnp.abs(diff) > 1e-12 * scale, diff, jnp.inf)
        F = jnp.clip(R / safe, -0.5, 0.5)
        F = F - jnp.diag(jnp.diagonal(F))
        V, _ = jnp.linalg.qr(_mm(V, eye + F))
        evals = d
    return evals, V


def _row_space_svd(M: jnp.ndarray):
    """(S, V) of tall-skinny M without Gram squaring.

    Forming M^T M squares the condition number, which destroys the small
    singular values in float32 once cond(M) exceeds ~1/sqrt(eps) — and the
    IALM iterate's condition grows to ~1e5 near convergence.  Instead:
      1. R = qr(M).R         (backward-stable Householder QR, cond preserved)
      2. eigh of the Jordan-Wielandt embedding [[0, R^T], [R, 0]]
         whose eigenpairs are (+/-sigma, (v; +/-u)/sqrt(2)).
    The 2T x 2T eigh goes through `_refined_eigh` because XLA's eigh is a
    fixed-sweep Jacobi solver that needs Newton polishing for full accuracy.
    """
    dtype = M.dtype
    T = M.shape[1]
    R = jnp.linalg.qr(M, mode="r")
    J = jnp.zeros((2 * T, 2 * T), dtype)
    J = J.at[:T, T:].set(R.T)
    J = J.at[T:, :T].set(R)
    w, Q = _refined_eigh(J)
    # Ascending eigenvalues: the top T are +sigma_i; v_i is the first block.
    S = w[T:]
    V = Q[:T, T:] * jnp.asarray(jnp.sqrt(2.0), dtype)
    return S, V


def _shrunk_lowrank(M: jnp.ndarray, shrink: jnp.ndarray) -> jnp.ndarray:
    """A = U diag(S - shrink) V^T for M = U S V^T, as M V diag(f(S)/S) V^T.

    All T singular components are kept (the reference's svp quirk), so the
    row-space reconstruction is exact up to floating point.
    """
    dtype = M.dtype
    S, V = _row_space_svd(M)
    # f(S)/S with a floor relative to the dominant singular value: components
    # with S ~ 0 contribute noise of bounded magnitude |S - shrink| in an
    # arbitrary direction in the reference (LAPACK U columns for null
    # singular values); the relative floor keeps the same bounded magnitude
    # without Inf/NaN amplification.
    floor = jnp.finfo(dtype).eps * jnp.max(S) + jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    ratio = (S - shrink) / jnp.maximum(S, floor)
    return _mm(_mm(M, V) * ratio[None, :], V.T)


def _host_svd_lowrank(M: jnp.ndarray, shrink: jnp.ndarray) -> jnp.ndarray:
    """Validation-mode A = U diag(S - shrink) V^T via a host LAPACK SVD.

    XLA's iterative SVD/eigh lose relative accuracy on small singular values
    (they are fixed-sweep solvers); this pure_callback path reproduces the
    reference's LAPACK arithmetic bit-for-bit for strict parity tests.  Not a
    production path.
    """
    import numpy as np

    def _svd_shrink(m, s):
        u, sv, vt = np.linalg.svd(np.asarray(m), full_matrices=False)
        return ((u * (sv - s)) @ vt).astype(m.dtype)

    return jax.pure_callback(
        _svd_shrink,
        jax.ShapeDtypeStruct(M.shape, M.dtype),
        M,
        shrink,
        vmap_method="sequential",
    )


@functools.partial(
    jax.jit, static_argnames=("lmbda", "tol", "max_iter", "rho", "mu_cap", "method")
)
def ialm_rpca(
    X: jnp.ndarray,
    lmbda: float = 0.01,
    tol: float = 0.001,
    max_iter: int = 100,
    rho: float = 1.5,
    mu_cap: float = 1e7,
    method: str = "device",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decompose X (P x T, float) into low-rank A + sparse E.

    Returns (A, E, num_iterations).  Arithmetic mirrors
    image_filtering.py:256-301 step for step (see module docstring for the
    replicated quirks).

    method: 'device' (TPU-native QR + Jordan-Wielandt SVD, production) or 'host_svd'
    (host LAPACK callback, strict-parity validation only).
    """
    dtype = X.dtype
    frob = jnp.linalg.norm(X)                       # ||X||_F
    norm_inf = jnp.max(jnp.abs(X)) / lmbda
    dual_norm = jnp.maximum(frob, norm_inf)
    Y0 = X / dual_norm
    mu0 = 1.25 / frob
    dnorm = frob

    def cond(state):
        _, _, _, _, itr, err = state
        return jnp.logical_and(err >= tol, itr < max_iter)

    def body(state):
        A, E, Y, mu, itr, _ = state
        inv_mu = 1.0 / mu
        Eraw = X - A + inv_mu * Y
        Eupd = jnp.maximum(Eraw - lmbda * inv_mu, 0.0) + jnp.minimum(
            Eraw + lmbda * inv_mu, 0.0
        )
        M = X - Eupd + inv_mu * Y
        if method == "host_svd":
            Aupd = _host_svd_lowrank(M, inv_mu)
        else:
            Aupd = _shrunk_lowrank(M, inv_mu)
        Z = X - Aupd - Eupd
        Ynew = Y + mu * Z
        mu_new = jnp.minimum(mu * rho, mu * mu_cap)
        err = jnp.linalg.norm(Z) / dnorm
        return (Aupd, Eupd, Ynew, mu_new, itr + 1, err)

    zeros = jnp.zeros_like(X)
    init = (zeros, zeros, Y0, mu0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, dtype))
    A, E, _, _, itr, _ = jax.lax.while_loop(cond, body, init)
    return A, E, itr


def rpca_motion_window(
    gray_window: jnp.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-motion image for a window of grayscale frames.

    Args:
      gray_window: (T, H, W) uint8 grayscale frames.

    Returns:
      (motion, iters): motion is (T, H, W) uint8 = clip(-E, 0, 255)
      (image_filtering.py:243-245), iters is the IALM iteration count.
    """
    T, H, W = gray_window.shape
    dtype = jnp.dtype(cfg.rpca_dtype)
    # Columns of X are frames (image_filtering.py:233-237).
    X = gray_window.reshape(T, H * W).T.astype(dtype)
    _, E, iters = ialm_rpca(
        X,
        lmbda=cfg.rpca_lambda,
        tol=cfg.rpca_tol,
        max_iter=cfg.rpca_max_iter,
        rho=cfg.rpca_rho,
        mu_cap=cfg.rpca_mu_cap,
    )
    motion = jnp.clip(-E, 0.0, 255.0).astype(jnp.uint8)
    return motion.T.reshape(T, H, W), iters
