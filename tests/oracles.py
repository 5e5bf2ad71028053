"""NumPy/cv2/scipy parity oracles for tests.

These re-state the *behavior* of the reference pipeline (with its quirks, as
documented in SURVEY.md §2.1) in plain NumPy so device kernels can be checked
against float64 host arithmetic.  They are test-only code.
"""

import numpy as np


def ialm_rpca_f64(X, lmbda=0.01, tol=0.001, max_iter=100):
    """Float64 IALM with the reference's exact update order and quirks:
    'norm_two' is the Frobenius norm of the raveled matrix, and every
    iteration keeps ALL singular values shrunk by 1/mu (the svp length-bug,
    image_filtering.py:285-290).  Returns (A, E, iters)."""
    X = np.asarray(X, np.float64)
    frob = np.linalg.norm(X.ravel(), 2)
    dual = max(frob, np.max(np.abs(X)) / lmbda)
    Y = X / dual
    A = np.zeros_like(X)
    E = np.zeros_like(X)
    dnorm = np.linalg.norm(X, "fro")
    mu = 1.25 / frob
    rho = 1.5
    itr = 0
    while True:
        # op-for-op the reference's arithmetic ((1/mu)*Y, U @ diag @ V) so
        # outputs are BITWISE equal to image_filtering.py:269-297
        # (tests/test_reference_differential.py asserts it)
        Eraw = X - A + (1 / mu) * Y
        E = np.maximum(Eraw - lmbda / mu, 0) + np.minimum(Eraw + lmbda / mu, 0)
        U, S, V = np.linalg.svd(X - E + (1 / mu) * Y, full_matrices=False)
        # all components kept (svp length-bug quirk)
        A = np.dot(np.dot(U, np.diag(S - 1 / mu)), V)
        Z = X - A - E
        Y = Y + mu * Z
        mu = min(mu * rho, mu * 1e7)
        itr += 1
        if np.linalg.norm(Z, "fro") / dnorm < tol or itr >= max_iter:
            break
    return A, E, itr


def rpca_motion_window_f64(gray_window, **kw):
    """Window-level sparse-motion oracle: stack frames as columns, run IALM,
    return clip(-E, 0, 255) as uint8 frames (image_filtering.py:220-253)."""
    T, H, W = gray_window.shape
    X = gray_window.reshape(T, H * W).T.astype(np.float64)
    _, E, iters = ialm_rpca_f64(X, **kw)
    motion = np.clip(-E, 0, 255).astype(np.uint8)
    return motion.T.reshape(T, H, W), iters


def make_synthetic_window(rng, T=21, H=48, W=64, n_dots=2, amp=120):
    """Static noisy background with small dark moving dots (swift-like)."""
    base = rng.integers(80, 200, size=(H, W), dtype=np.uint8).astype(np.int32)
    base = base // 2 + 80
    frames = np.zeros((T, H, W), np.int32)
    for t in range(T):
        f = base + rng.integers(-3, 4, size=(H, W))
        for d in range(n_dots):
            y = (5 + 2 * t + 7 * d) % (H - 3)
            x = (4 + 3 * t + 11 * d) % (W - 3)
            f[y : y + 2, x : x + 2] -= amp
        frames[t] = np.clip(f, 0, 255)
    return frames.astype(np.uint8)
