"""The --classify fast path (VERDICT r2 #2).

Two accelerations, both required to be RESULT-IDENTICAL to the per-frame
reference flow (segment_classification.py:26-44 applies the CNN keep-mask
per frame before the tracker sees centroids):

  1. host tracker: all of a dispatch's segments classify in ONE batched
     device forward (SqueezeNetSegmentFilter.batch_call) instead of one
     dispatch per non-empty frame;
  2. device tracker: the keep-mask is ANDed into the compacted valid slots
     and the tracking scan runs on device — classify no longer forces the
     host tracker.
"""

import dataclasses

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


@pytest.fixture(scope="module")
def video():
    return make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1)


class EvenRejector:
    """Deterministic batchable filter: reject even-indexed segments.

    Mirrors the runner's expectations of SqueezeNetSegmentFilter without
    paying CNN forwards; __call__ and batch_call must agree by
    construction, so any divergence between the runner's paths is the
    runner's fault."""

    def __call__(self, table, index, frame, crop_region):
        b, t = index
        assert frame is not None          # host frames must be retained
        n = int(np.asarray(table.valid[b, t]).sum())
        return [i % 2 == 1 for i in range(n)]

    def batch_call(self, table, frames, crop_region):
        return {
            key: self(table, key, frames[key], crop_region) for key in frames
        }


class PerFrameOnly(EvenRejector):
    """Same predicate, but WITHOUT batch_call: forces the legacy per-frame
    host path (and the device tracker's fallback warning)."""

    batch_call = None

    def __getattribute__(self, name):
        if name == "batch_call":
            raise AttributeError(name)
        return super().__getattribute__(name)


def _events_key(res):
    return [
        (e.frame_number, e.first_centroid, e.last_centroid)
        for e in res.events
    ]


def test_batched_filter_matches_per_frame(video):
    per_frame = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=PerFrameOnly(),
    )
    batched = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=EvenRejector(),
    )
    assert _events_key(batched) == _events_key(per_frame)
    assert batched.total_predicted == per_frame.total_predicted
    assert batched.total_rejected == per_frame.total_rejected


def test_classify_composes_with_device_tracker(video):
    host = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=EvenRejector(), tracker_impl="host",
    )
    dev = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=EvenRejector(), tracker_impl="device",
    )
    assert _events_key(dev) == _events_key(host)
    assert dev.total_predicted == host.total_predicted
    assert dev.total_rejected == host.total_rejected


def test_classify_composes_with_mesh(video):
    """--classify x --mesh x device tracker (+ enum LAP): the sharded
    production stack must reproduce the unsharded keep-mask run event for
    event."""
    import jax

    from swiftwatcher_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU mesh); running on real hardware")
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, batch_windows=4, track_enum_lap=4
    )
    base = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="device",
    )
    sharded = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="device",
        mesh=make_mesh(8, shape=(4, 2)),
    )
    assert _events_key(sharded) == _events_key(base)
    assert sharded.total_predicted == base.total_predicted
    assert sharded.total_rejected == base.total_rejected


def test_device_tracker_keeps_all_equals_no_filter(video):
    class KeepAll(EvenRejector):
        def __call__(self, table, index, frame, crop_region):
            b, t = index
            n = int(np.asarray(table.valid[b, t]).sum())
            return [True] * n

    plain = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, tracker_impl="device",
    )
    kept = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=KeepAll(), tracker_impl="device",
    )
    assert _events_key(kept) == _events_key(plain)
    assert kept.total_predicted == plain.total_predicted


def test_device_tracker_reject_all_no_events(video):
    class RejectAll(EvenRejector):
        def __call__(self, table, index, frame, crop_region):
            b, t = index
            n = int(np.asarray(table.valid[b, t]).sum())
            return [False] * n

    res = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=RejectAll(), tracker_impl="device",
    )
    assert len(res.events) == 0
    assert res.total_predicted == 0


def test_per_frame_filter_still_falls_back_with_warning(video):
    with pytest.warns(RuntimeWarning, match="batchable"):
        res = run_video(
            ArraySource(video.frames, fps=video.fps), video.corners,
            DEFAULT_CONFIG, segment_filter=PerFrameOnly(),
            tracker_impl="device",
        )
    assert res.frames_processed == 63


def test_real_cnn_batched_equals_per_frame(video):
    """The shipped SqueezeNet filter through both paths: batch_call and
    per-frame __call__ must produce identical events (per-image inference
    is batch-size independent)."""
    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter

    filt = SqueezeNetSegmentFilter.from_default_weights(DEFAULT_CONFIG)

    class PerFrameCNN:
        def __call__(self, *a, **k):
            return filt(*a, **k)

    per_frame = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=PerFrameCNN(),
    )
    batched_dev = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=filt, tracker_impl="device",
    )
    assert _events_key(batched_dev) == _events_key(per_frame)
    assert batched_dev.total_predicted == per_frame.total_predicted
    assert batched_dev.total_rejected == per_frame.total_rejected


def test_classify_checkpoint_resume_device(tmp_path, video):
    """--classify x checkpoint x resume (VERDICT r3 #6): the classify fast
    path defers track_window to consume time and snapshots dev_state there
    (runner.py dispatch/consume) — a checkpoint written at a consume must
    pair the deferred post-classify state with THAT batch's cursor, not
    the one dispatched after it.  batch_windows=1 forces multiple batches
    through the software pipeline so checkpoints land between a dispatch
    and its deferred consume."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=1)
    full = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="device",
    )

    ck = tmp_path / "classify_dev.ckpt"
    partial = ArraySource(video.frames, fps=video.fps)
    partial.total_frames = 42  # stop mid-video, after 2 of 3 windows
    run_video(
        partial, video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="device",
        checkpoint_path=ck, checkpoint_interval_batches=1,
    )
    assert ck.exists()

    resumed = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="device",
        checkpoint_path=ck,
    )
    assert _events_key(resumed) == _events_key(full)
    assert resumed.total_predicted == full.total_predicted
    assert resumed.total_rejected == full.total_rejected


def test_classify_checkpoint_resume_host(tmp_path, video):
    """Same composition on the host tracker (batched classify path +
    pickled SegmentTracker checkpoints)."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=1)
    full = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="host",
    )

    ck = tmp_path / "classify_host.ckpt"
    partial = ArraySource(video.frames, fps=video.fps)
    partial.total_frames = 42
    run_video(
        partial, video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="host",
        checkpoint_path=ck, checkpoint_interval_batches=1,
    )
    resumed = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, cfg,
        segment_filter=EvenRejector(), tracker_impl="host",
        checkpoint_path=ck,
    )
    assert _events_key(resumed) == _events_key(full)
    assert resumed.total_predicted == full.total_predicted
    assert resumed.total_rejected == full.total_rejected


def test_fused_classify_equals_unfused(video):
    """VERDICT r4 #1: the single fused classify+track program must be
    result-identical to the two-program path (same CNN, same keep-mask
    semantics, same scan) — and must count kept segments identically in
    metrics.segments_total."""
    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter

    filt = SqueezeNetSegmentFilter.from_default_weights(DEFAULT_CONFIG)
    fused = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        dataclasses.replace(DEFAULT_CONFIG, classify_fused=True),
        segment_filter=filt, tracker_impl="device",
    )
    unfused = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        dataclasses.replace(DEFAULT_CONFIG, classify_fused=False),
        segment_filter=filt, tracker_impl="device",
    )
    assert _events_key(fused) == _events_key(unfused)
    assert fused.total_predicted == unfused.total_predicted
    assert fused.total_rejected == unfused.total_rejected
    assert fused.metrics.segments_total == unfused.metrics.segments_total


def test_fused_classify_oversize_fallback(video, monkeypatch):
    """A crop exceeding every canvas bucket makes pack_fused return None;
    the runner must fall back to the two-program path with identical
    results (mirrors classify_images' host-PIL fallback)."""
    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter

    filt = SqueezeNetSegmentFilter.from_default_weights(DEFAULT_CONFIG)
    baseline = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=filt, tracker_impl="device",
    )
    monkeypatch.setattr(
        SqueezeNetSegmentFilter, "_canvas_bucket", lambda self, images: 0
    )
    fallback = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, segment_filter=filt, tracker_impl="device",
    )
    assert _events_key(fallback) == _events_key(baseline)
    assert fallback.total_predicted == baseline.total_predicted
