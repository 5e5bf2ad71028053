"""Multi-chip sharding on the 8-virtual-device CPU mesh.

Validates that the sharded window pipeline (windows dp x pixels sp with
psum'd Grams) matches the single-device program, and that the dp x tp
classifier train step runs and reduces loss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.parallel.mesh import (
    make_mesh,
    sharded_localize_windows,
    init_sharded_training,
)
from swiftwatcher_tpu.pipeline.window import localize_windows
from swiftwatcher_tpu.models.squeezenet import random_params
from swiftwatcher_tpu.models import train as train_mod

from oracles import make_synthetic_window


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU mesh); running on real hardware")
    return make_mesh(8, shape=(4, 2))


def test_sharded_localization_matches_single(rng, mesh, cpu_devices):
    wins = []
    for k in range(4):
        g = make_synthetic_window(rng, T=21, H=32, W=64, n_dots=1 + k % 2)
        wins.append(np.repeat(g[..., None], 3, axis=-1))
    crops = np.stack(wins)  # (4, 21, 32, 64, 3); W=64 divisible by model=2

    table_s, iters_s = sharded_localize_windows(jnp.asarray(crops), mesh, DEFAULT_CONFIG)
    table_1, iters_1 = localize_windows(crops, DEFAULT_CONFIG)

    # Iteration counts may differ by at most 1 (psum summation order changes
    # the residual in the last ulp); segment tables must agree exactly.
    assert np.abs(np.asarray(iters_s) - np.asarray(iters_1)).max() <= 1
    np.testing.assert_array_equal(np.asarray(table_s.valid), np.asarray(table_1.valid))
    np.testing.assert_array_equal(np.asarray(table_s.area), np.asarray(table_1.area))
    np.testing.assert_array_equal(np.asarray(table_s.sum_y), np.asarray(table_1.sum_y))
    np.testing.assert_array_equal(np.asarray(table_s.sum_x), np.asarray(table_1.sum_x))


def test_sharded_gray_odd_width_matches_single(rng, mesh, cpu_devices):
    """The flat-pixel-sharded gray variant (the runner's mesh mode) must be
    table-exact for a crop whose pixel count does NOT divide the 'model'
    axis (exercises the IALM-neutral zero padding)."""
    from swiftwatcher_tpu.parallel.mesh import sharded_localize_windows_gray
    from swiftwatcher_tpu.pipeline.window import localize_windows_gray

    wins = []
    for k in range(4):
        g = make_synthetic_window(rng, T=21, H=27, W=61, n_dots=1 + k % 2)
        wins.append(g)
    gray = np.stack(wins)  # (4, 21, 27, 61): P = 1647, odd vs model=2

    table_s, iters_s = jax.jit(
        lambda g: sharded_localize_windows_gray(g, mesh, DEFAULT_CONFIG)
    )(jnp.asarray(gray))
    table_1, iters_1 = localize_windows_gray(jnp.asarray(gray), DEFAULT_CONFIG)

    assert np.abs(np.asarray(iters_s) - np.asarray(iters_1)).max() <= 1
    for field in ("valid", "area", "sum_y", "sum_x"):
        np.testing.assert_array_equal(
            np.asarray(getattr(table_s, field)),
            np.asarray(getattr(table_1, field)),
            err_msg=field,
        )


def test_run_video_mesh_mode_matches_single(mesh, cpu_devices):
    """run_video(mesh=...) must reproduce the single-device run event for
    event on the synthetic clip (counts, frame numbers, centroids)."""
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_video(seed=2, n_frames=63, n_entering=2, n_crossing=1)
    import dataclasses as _dc

    # enum LAP on: mesh mode + device tracker + enumeration assignment
    cfg = _dc.replace(
        DEFAULT_CONFIG, batch_windows=4, track_enum_lap=4  # 4 % data(4) == 0
    )
    base = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        tracker_impl="device",
    )
    sharded = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        mesh=mesh, tracker_impl="device",
    )
    assert sharded.total_predicted == base.total_predicted
    assert sharded.total_rejected == base.total_rejected
    assert len(sharded.events) == len(base.events)
    for a, b in zip(sharded.events, base.events):
        assert a.frame_number == b.frame_number
        assert a.first_centroid == b.first_centroid
        assert a.last_centroid == b.last_centroid


def test_sharded_train_step_learns(rng, mesh):
    params = random_params(rng)
    trunk, head, opt_state, step, place = init_sharded_training(mesh, params, lr=1e-2)

    # Tiny synthetic feature batch: two separable classes in feature space.
    n, h, w, c = 8, 2, 2, 512
    feats = rng.standard_normal((n, h, w, c)).astype(np.float32)
    labels = (np.arange(n) % 2).astype(np.int32)
    feats[labels == 1, :, :, :64] += 3.0

    head, opt_state, feats_d, labels_d = place(head, opt_state, feats, labels)
    losses = []
    for _ in range(30):
        head, opt_state, loss = step(head, opt_state, feats_d, labels_d)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert losses[-1] < 0.2


def test_run_video_mesh_mode_on_parallel_gray_mp4(mesh, cpu_devices, tmp_path):
    """Mesh mode composed with the chunk-parallel GRAY-CROP decode backend
    (io/parallel_decode.py gray workers): the sharded run over an actual
    H.264 container must equal the single-device cv2-backend run event for
    event — guards the decode-fused sharded program against the gray
    window source."""
    import cv2
    import dataclasses as _dc

    from swiftwatcher_tpu.io.readers import VideoFileSource
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_video(seed=3, n_frames=63, n_entering=2, n_crossing=1)
    p = tmp_path / "mesh_gray.mp4"
    w = cv2.VideoWriter(
        str(p), cv2.VideoWriter_fourcc(*"mp4v"), video.fps,
        (video.frames.shape[2], video.frames.shape[1]),
    )
    assert w.isOpened()
    for f in video.frames:
        w.write(f)
    w.release()

    cfg = _dc.replace(DEFAULT_CONFIG, batch_windows=4)
    base = run_video(
        VideoFileSource(p, backend="cv2"), video.corners, cfg,
        tracker_impl="device",
    )
    src = VideoFileSource(p, backend="parallel", decode_workers=3)
    sharded = run_video(
        src, video.corners, cfg, mesh=mesh, tracker_impl="device"
    )
    src.close()
    # the gray-crop workers must actually have engaged (otherwise this
    # test silently exercises the full-frame path instead)
    assert src._gray_crop is not None
    assert sharded.total_predicted == base.total_predicted
    assert len(sharded.events) == len(base.events)
    for a, b in zip(sharded.events, base.events):
        assert a.frame_number == b.frame_number
        assert a.first_centroid == b.first_centroid
