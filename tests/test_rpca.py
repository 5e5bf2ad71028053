"""IALM-RPCA parity: Gram-trick lax.while_loop solver vs float64 LAPACK-SVD
oracle with the reference's exact arithmetic."""

import numpy as np
import pytest

import jax

from swiftwatcher_tpu.ops.rpca import ialm_rpca, rpca_motion_window
from swiftwatcher_tpu.config import PipelineConfig

from oracles import ialm_rpca_f64, rpca_motion_window_f64, make_synthetic_window


def test_ialm_host_svd_matches_oracle_f64(rng):
    # Strict parity: host-LAPACK validation mode reproduces the reference's
    # float64 arithmetic (incl. the svp quirk) essentially bit-for-bit.
    if jax.default_backend() != "cpu":
        pytest.skip("host_svd uses pure_callback (unsupported on the axon TPU backend)")
    win = make_synthetic_window(rng, T=21, H=24, W=32)
    X = win.reshape(21, -1).T.astype(np.float64)
    A0, E0, it0 = ialm_rpca_f64(X)
    with jax.enable_x64(True):
        A1, E1, it1 = ialm_rpca(X, method="host_svd")
    assert int(it1) == it0
    np.testing.assert_allclose(np.asarray(E1), E0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(A1), A0, atol=1e-9)


def test_ialm_gram_close_to_oracle_f64(rng):
    # Production Gram-trick path: XLA's fixed-sweep eigh limits late-iteration
    # accuracy in the near-null subspace; require uint8-level agreement (the
    # pipeline consumes clip(-E, 0, 255) as uint8).
    win = make_synthetic_window(rng, T=21, H=24, W=32)
    X = win.reshape(21, -1).T.astype(np.float64)
    _, E0, it0 = ialm_rpca_f64(X)
    with jax.enable_x64(True):
        _, E1, it1 = ialm_rpca(X)
    assert abs(int(it1) - it0) <= 1
    m0 = np.clip(-E0, 0, 255).astype(np.uint8)
    m1 = np.clip(-np.asarray(E1), 0, 255).astype(np.uint8)
    diff = np.abs(m0.astype(int) - m1.astype(int))
    assert (diff <= 1).mean() > 0.999
    assert diff.max() <= 3


def test_motion_window_f32_close_to_oracle(rng):
    win = make_synthetic_window(rng, T=21, H=32, W=40)
    m0, it0 = rpca_motion_window_f64(win)
    cfg = PipelineConfig()
    m1, it1 = rpca_motion_window(win, cfg)
    m1 = np.asarray(m1)
    # f32 vs f64 drift: iteration counts may differ by at most 1; uint8 motion
    # must agree within 1 count on ~all pixels.
    assert abs(int(it1) - it0) <= 1
    diff = np.abs(m1.astype(int) - m0.astype(int))
    assert (diff <= 1).mean() > 0.999
    assert diff.max() <= 3


def test_motion_detects_dark_dots(rng):
    win = make_synthetic_window(rng, T=21, H=32, W=40, n_dots=1, amp=120)
    motion, _ = rpca_motion_window(win, PipelineConfig())
    motion = np.asarray(motion)
    # The moving dark dot must appear as a bright motion blob in mid frames.
    t = 10
    y = (5 + 2 * t) % 29
    x = (4 + 3 * t) % 37
    blob = motion[t, y : y + 2, x : x + 2]
    assert blob.min() > 50
    # Background stays quiet.
    assert np.median(motion[t]) < 5


def test_all_zero_window_yields_finite_zero_motion(rng):
    # Batch-padding windows from WindowPrefetcher are all-zero; the batched
    # solver floors its norms so they converge immediately to E=0 instead of
    # burning max_iter NaN passes (ADVICE r1).  Real windows in the same
    # batch must be unaffected.
    from swiftwatcher_tpu.ops.rpca import ialm_rpca_batched, rpca_motion_window_batched

    win = make_synthetic_window(rng, T=21, H=16, W=16)
    X = win.reshape(1, 21, -1).astype(np.float32)
    Xb = np.concatenate([X, np.zeros_like(X)], axis=0)

    A, E, iters = ialm_rpca_batched(Xb)
    assert np.isfinite(np.asarray(E)).all() and np.isfinite(np.asarray(A)).all()
    assert int(iters[1]) == 1                     # zero window: one frozen pass
    np.testing.assert_array_equal(np.asarray(E[1]), 0.0)

    _, E1, it1 = ialm_rpca_batched(X)
    assert int(iters[0]) == int(it1[0])           # real window unaffected
    # batched eigh isn't bit-reproducible across batch compositions; require
    # uint8-level agreement like the oracle tests (the pipeline consumes
    # clip(-E, 0, 255) as uint8)
    m_mix = np.clip(-np.asarray(E[0]), 0, 255).astype(int)
    m_solo = np.clip(-np.asarray(E1[0]), 0, 255).astype(int)
    diff = np.abs(m_mix - m_solo)
    assert (diff <= 1).mean() > 0.999 and diff.max() <= 3

    motion, _ = rpca_motion_window_batched(
        np.concatenate([win[None], np.zeros_like(win)[None]]), PipelineConfig()
    )
    np.testing.assert_array_equal(np.asarray(motion[1]), 0)


def test_zero_padded_rows_are_neutral(rng):
    # Zero pixel rows (alignment padding) must not change the solution for
    # real pixels — the basis for lane-aligned layouts in the fused kernels.
    win = make_synthetic_window(rng, T=21, H=16, W=16)
    X = win.reshape(21, -1).T.astype(np.float32)
    Xp = np.concatenate([X, np.zeros((37, 21), np.float32)], axis=0)
    _, E, it = ialm_rpca(X)
    _, Ep, itp = ialm_rpca(Xp)
    assert int(it) == int(itp)
    np.testing.assert_allclose(np.asarray(Ep[: X.shape[0]]), np.asarray(E), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(Ep[X.shape[0] :]), 0.0)
