"""Opt-in electronic image stabilization (ops/stabilize.py).

The reference has no camera-shake countermeasure (its RPCA background
model assumes a static scene, image_filtering.py:220-301); stabilization
is a documented extension that defaults OFF.  These tests cover: exact
recovery of planted integer shifts, the J=0 no-op, end-to-end recovery of
the jitter2 accuracy-corpus failure, and sharded/unsharded equality with
the feature enabled (the integer-SAD design makes shift choice bit-exact
under any partitioning).
"""

import dataclasses

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.ops.stabilize import stabilize_window


def _shaken_window(rng, T=9, H=48, W=64, J=2, offsets=None):
    """World-texture window: frame t = world at camera offset offsets[t].

    The world must be STRUCTURED (flat regions + edges), not i.i.d. noise:
    alignment signal comes from the same structure recurring in every
    frame; the temporal mean of pure per-pixel noise is flat and carries
    no pose information (measured: ~0.5% SAD margin on i.i.d. texture vs
    ~an order of magnitude on block texture)."""
    Hw, Ww = H + 2 * J, W + 2 * J
    coarse = rng.integers(0, 256, size=(Hw // 8 + 1, Ww // 8 + 1))
    world = np.kron(coarse, np.ones((8, 8), np.int64))[:Hw, :Ww]
    world = np.clip(world, 0, 255).astype(np.uint8)
    if offsets is None:
        offsets = [(0, 0)] * T
    frames = np.stack(
        [world[J + dy : J + dy + H, J + dx : J + dx + W] for dy, dx in offsets]
    )
    return world, frames, offsets


def test_recovers_planted_integer_shifts():
    rng = np.random.default_rng(0)
    J = 2
    # offsets sum to zero per axis so the mean camera pose is the origin
    offsets = [(0, 0), (1, -2), (-1, 2), (2, 1), (-2, -1),
               (1, 1), (-1, -1), (2, -2), (-2, 2)]
    world, frames, _ = _shaken_window(rng, T=len(offsets), J=J,
                                      offsets=offsets)
    aligned, shifts = stabilize_window(frames, J)
    # chosen shift must cancel the planted camera offset exactly
    np.testing.assert_array_equal(
        np.asarray(shifts), -np.array(offsets, np.int32)
    )
    # away from the edge-padded border every aligned frame IS the world
    # window at the mean pose
    base = world[J : J + frames.shape[1], J : J + frames.shape[2]]
    interior = np.s_[2 * J : -2 * J, 2 * J : -2 * J]
    for t in range(frames.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(aligned)[t][interior], base[interior]
        )


def test_batched_matches_per_window():
    rng = np.random.default_rng(1)
    J = 1
    wins = []
    for s in range(3):
        offs = [(int(a), int(b)) for a, b in
                rng.integers(-J, J + 1, size=(7, 2))]
        _, frames, _ = _shaken_window(rng, T=7, J=J, offsets=offs)
        wins.append(frames)
    batch = np.stack(wins)
    a_b, s_b = stabilize_window(batch, J)
    for i, frames in enumerate(wins):
        a1, s1 = stabilize_window(frames, J)
        np.testing.assert_array_equal(np.asarray(a_b)[i], np.asarray(a1))
        np.testing.assert_array_equal(np.asarray(s_b)[i], np.asarray(s1))


def test_zero_max_shift_is_identity():
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(5, 16, 20), dtype=np.uint8)
    aligned, shifts = stabilize_window(frames, 0)
    np.testing.assert_array_equal(np.asarray(aligned), frames)
    assert np.asarray(shifts).shape == (5, 2)
    assert not np.asarray(shifts).any()


def test_jitter2_scene_recovered_end_to_end():
    """The committed accuracy-corpus failure mode: jitter=2 drops detection
    to F1 0.5 at reference semantics; with stabilization on, the run must
    find every true entry (same seed/spec as ACCURACY scene `jitter2`)."""
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import make_hard_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_hard_video(seed=49, n_frames=84, H=240, W=320, fps=30.0,
                            n_entering=3, jitter=2)
    cfg = dataclasses.replace(DEFAULT_CONFIG, stabilize_max_shift=3)
    res = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                    cfg, tracker_impl="device")
    assert len(res.events) == len(video.entry_frames) == 3
    # and at the right times: every truth frame has an event within 1 frame
    got = sorted(int(e.frame_number) for e in res.events)
    for fn, truth in zip(got, video.entry_frames):
        assert abs(fn - truth) <= 1, (got, video.entry_frames)

    # the baseline (no stabilization) must still be degraded — otherwise
    # this scene no longer guards anything and the corpus needs a harder one
    base = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                     DEFAULT_CONFIG, tracker_impl="device")
    assert len(base.events) < 3


def test_sharded_equals_unsharded_with_stabilize():
    """Mesh-mode event parity holds with stabilization enabled (integer
    SAD => shift choice is reduction-order-invariant)."""
    import jax

    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import make_hard_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_hard_video(seed=49, n_frames=63, H=120, W=160, fps=30.0,
                            n_entering=2, jitter=2)
    cfg = dataclasses.replace(DEFAULT_CONFIG, stabilize_max_shift=2)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model")
    )
    ref = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                    cfg, tracker_impl="device")
    got = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                    cfg, tracker_impl="device", mesh=mesh)
    assert len(ref.events) == len(got.events)
    assert ref.total_predicted == got.total_predicted
    assert ref.total_rejected == got.total_rejected
    assert sorted(e.frame_number for e in ref.events) == sorted(
        e.frame_number for e in got.events
    )
