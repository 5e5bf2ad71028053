"""Auxiliary subsystems: checkpoint/resume, metrics manifest, segment
export, research tools."""

import json

import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


@pytest.fixture(scope="module")
def video():
    return make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)


def test_checkpoint_resume_same_counts(tmp_path, video):
    ck = tmp_path / "state.ckpt"

    # Full run, checkpointing every batch.
    full = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        checkpoint_path=ck,
        checkpoint_interval_batches=1,
    )
    assert ck.exists()

    # "Crash" after the run wrote checkpoints mid-way: rewind the checkpoint
    # to a mid-run snapshot by re-running only the first part.
    ck2 = tmp_path / "state2.ckpt"
    partial_src = ArraySource(video.frames, fps=video.fps)
    partial_src.total_frames = 21  # stop after the first window batch
    run_video(
        partial_src, video.corners, DEFAULT_CONFIG,
        checkpoint_path=ck2, checkpoint_interval_batches=1,
    )
    assert ck2.exists()

    # Resume from the mid-run checkpoint and finish the video.
    resumed = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        checkpoint_path=ck2,
    )
    assert resumed.total_predicted == full.total_predicted
    assert resumed.total_rejected == full.total_rejected
    assert sorted(e.frame_number for e in resumed.events) == sorted(
        e.frame_number for e in full.events
    )


def test_metrics_manifest(tmp_path, video):
    result = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        export_dir=tmp_path / "out",
    )
    manifest = json.load(open(tmp_path / "out" / "run_manifest.json"))
    assert manifest["frames_processed"] == 63
    assert manifest["windows"] == 3
    assert manifest["events"] == len(result.events) > 0
    assert manifest["segments_total"] > 0
    assert manifest["frames_per_sec"] > 0


def test_segment_export_pngs(tmp_path, video):
    run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        export_segments_dir=tmp_path / "segments",
    )
    crops = list((tmp_path / "segments").glob("*.png"))
    overlays = list((tmp_path / "segments" / "overlay").glob("*.png"))
    assert len(crops) > 0
    assert len(overlays) == len(crops)
    # naming: "<src>"_<frame>_<label>_<nsegs>.png
    assert all(p.name.startswith('"synthetic"_') for p in crops)
    import cv2

    img = cv2.imread(str(crops[0]))
    assert img.shape[0] >= 24 and img.shape[1] >= 24


def test_config_overrides():
    from swiftwatcher_tpu.config import DEFAULT_CONFIG, config_with_overrides

    cfg = config_with_overrides(
        ["rpca_tol=0.002", "batch_windows=16", "use_pallas_rpca=false",
         "opening_size=5,5"]
    )
    assert cfg.rpca_tol == 0.002
    assert cfg.batch_windows == 16
    assert cfg.use_pallas_rpca is False
    assert cfg.opening_size == (5, 5)
    assert DEFAULT_CONFIG.rpca_tol == 0.001  # base untouched

    import pytest

    with pytest.raises(ValueError):
        config_with_overrides(["no_such_field=1"])


def test_research_csv_roundtrip(tmp_path):
    import pandas as pd

    from swiftwatcher_tpu.io.export import (
        dataframe_from_csv,
        dataframe_to_csv,
        frame_timestamp,
    )

    df = pd.DataFrame(
        {
            "timestamp": [frame_timestamp(10, 30.0), frame_timestamp(40, 30.0)],
            "framenumber": [10, 40],
            "centroid": [
                str([(12.5, 30.25), (13.0, 31.5)]),
                str([(7.0, 9.0)]),
            ],
        }
    ).set_index(["timestamp", "framenumber"])
    p = tmp_path / "events" / "gt.csv"
    dataframe_to_csv(df, p)
    back = dataframe_from_csv(p)
    assert back.index.names == ["timestamp", "framenumber"]
    assert back["centroid"].iloc[0] == [[12.5, 30.25], [13.0, 31.5]]
    assert back["centroid"].iloc[1] == [[7.0, 9.0]]


def test_looping_source_attribute_writes_and_seek(video):
    # Checkpoint resume does `source.next_frame_number = ...` (runner.py);
    # the looping source is a plain ArraySource subclass so reader-state
    # writes land directly (the earlier proxy shadowed them; ADVICE r1).
    from swiftwatcher_tpu.io.synthetic import LoopingArraySource

    src = LoopingArraySource(video.frames, total=126, fps=video.fps)
    src.next_frame_number = 42
    assert src.next_frame_number == 42
    assert src.total_frames == 126
    assert src.supports_seek
    f, num, _ = src.get_frame()
    assert num == 42
    np.testing.assert_array_equal(f, video.frames[42 % len(video.frames)])
    # loops past the base clip up to `total`
    src.next_frame_number = 125
    f, num, _ = src.get_frame()
    assert num == 125 and f is not None


def test_device_tracker_fallback_warns(tmp_path, video):
    # tracker_impl="device" with host-only features must fall back loudly.
    with pytest.warns(RuntimeWarning, match="falling back to the host"):
        run_video(
            ArraySource(video.frames, fps=video.fps),
            video.corners,
            DEFAULT_CONFIG,
            export_segments_dir=tmp_path / "segs",
            tracker_impl="device",
        )


def test_device_tracker_checkpoint_resume(tmp_path, video):
    # device-tracker runs checkpoint and resume to the same counts as an
    # uninterrupted run (TrackState + drained events serialized)
    full = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, tracker_impl="device",
    )

    ck = tmp_path / "dev.ckpt"
    partial_src = ArraySource(video.frames, fps=video.fps)
    partial_src.total_frames = 21
    run_video(
        partial_src, video.corners, DEFAULT_CONFIG,
        checkpoint_path=ck, checkpoint_interval_batches=1,
        tracker_impl="device",
    )
    assert ck.exists()

    # export_dir on the RESUMED run: restored event timestamps must be
    # real (re-anchored) pd.Timestamps, or the CSV export's groupby dies
    # sorting a mixed str/Timestamp index (regression: the device loader
    # used to leave them as raw JSON strings)
    resumed = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, checkpoint_path=ck, tracker_impl="device",
        export_dir=tmp_path / "resumed_out",
    )
    assert resumed.total_predicted == full.total_predicted
    assert resumed.total_rejected == full.total_rejected
    assert sorted(e.frame_number for e in resumed.events) == sorted(
        e.frame_number for e in full.events
    )
    assert list((tmp_path / "resumed_out").glob("*-swifts_*.csv"))

    # host/device checkpoint formats refuse cross-resume
    with pytest.raises(ValueError, match="device-tracker checkpoint"):
        run_video(
            ArraySource(video.frames, fps=video.fps), video.corners,
            DEFAULT_CONFIG, checkpoint_path=ck, tracker_impl="host",
        )


def test_export_respects_classifier_filter(tmp_path, video):
    """The reference filters segments BEFORE export (__main__.py:84-96):
    rejected segments produce no PNGs; survivors relabel 1..N and the
    filename count is the post-filter count."""
    import re

    # reject every even-indexed segment in each frame
    def reject_even(table, index, frame, crop_region):
        import numpy as np

        b, t = index
        n = int(np.asarray(table.valid[b, t]).sum())
        return [i % 2 == 1 for i in range(n)]

    base = tmp_path / "all"
    filt = tmp_path / "filtered"
    run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, export_segments_dir=base,
    )
    run_video(
        ArraySource(video.frames, fps=video.fps), video.corners,
        DEFAULT_CONFIG, export_segments_dir=filt, segment_filter=reject_even,
    )
    all_pngs = sorted(p.name for p in base.glob("*.png"))
    kept_pngs = sorted(p.name for p in filt.glob("*.png"))
    assert len(kept_pngs) < len(all_pngs)
    pat = re.compile(r'^".+"_(\d+)_(\d+)_(\d+)\.png$')
    for name in kept_pngs:
        m = pat.match(name)
        assert m, name
        label, count = int(m.group(2)), int(m.group(3))
        assert 1 <= label <= count      # contiguous post-filter labels
    # a frame with 2 segments keeps exactly 1 (the odd-indexed one)
    by_frame = {}
    for name in all_pngs:
        m = pat.match(name)
        by_frame.setdefault(int(m.group(1)), []).append(name)
    for name in kept_pngs:
        m = pat.match(name)
        fn, count = int(m.group(1)), int(m.group(3))
        assert count == len(by_frame[fn]) // 2


def test_checkpoint_timestamps_day_portable():
    """Serialized timestamps carry only time-of-day (re-anchored at load):
    a checkpoint written yesterday must not mix two calendar dates into the
    resumed run's export timeline.  Raw string markers round-trip verbatim
    and legacy plain-string checkpoints still parse."""
    import pandas as pd

    from swiftwatcher_tpu.io.export import frame_timestamp
    from swiftwatcher_tpu.io.readers import NULL_TIMESTAMP
    from swiftwatcher_tpu.utils.checkpoint import _ts_from_json, _ts_to_json

    ts = frame_timestamp(12345, 29.97)
    enc = _ts_to_json(ts)
    assert enc[0] == "tod" and "days" not in enc[1] or "0 days" in enc[1]
    back = _ts_from_json(enc)
    assert back == ts  # same day: identity
    # the JSON carries no calendar date
    assert str(ts.date()) not in enc[1]

    assert _ts_from_json(_ts_to_json(NULL_TIMESTAMP)) == NULL_TIMESTAMP
    assert _ts_from_json(None) is None
    legacy = _ts_from_json(str(ts))          # pre-tag format
    assert isinstance(legacy, pd.Timestamp)


def test_checkpoint_source_fingerprint(tmp_path, video):
    """Resuming against a different video raises instead of silently
    corrupting counts."""
    ck = tmp_path / "fp.ckpt"
    src = ArraySource(video.frames, fps=video.fps)
    src.total_frames = 21
    run_video(
        src, video.corners, DEFAULT_CONFIG,
        checkpoint_path=ck, checkpoint_interval_batches=1,
    )
    other = ArraySource(video.frames, fps=60.0)   # different fps = different video
    with pytest.raises(ValueError, match="refusing to resume"):
        run_video(other, video.corners, DEFAULT_CONFIG, checkpoint_path=ck)


def test_get_window_survives_early_read_error(video):
    """A read error before any successful read (routine after checkpoint
    resume, which does not restore last_read_frame) degrades to a zero
    frame instead of an AttributeError on None."""
    src = ArraySource(video.frames, fps=video.fps)
    src.frame_shape = video.frames[0].shape       # known from a prior run

    fails = {"n": 0}
    orig = src.read_frame

    def flaky(frame_number, increment=True):
        if fails["n"] == 0:
            fails["n"] += 1
            src.next_frame_number += increment
            return None                            # corrupt first frame
        return orig(frame_number, increment)

    src.read_frame = flaky
    frames, numbers, stamps = src.get_window(5)
    assert len(frames) == 5
    assert all(f is not None and f.shape == video.frames[0].shape for f in frames)
    assert not frames[0].any()                     # zero substitute
    assert src.read_errors == 1


def test_get_window_all_reads_fail_raises(video):
    """A fresh source whose FIRST window's reads all fail (no geometry ever
    established) raises a clear RuntimeError instead of returning None
    frames that TypeError later in the prefetcher's np.stack (ADVICE r2)."""
    import pytest

    src = ArraySource(video.frames, fps=video.fps)
    src.frame_shape = (0, 0, 0)                   # truly fresh source
    src.read_frame = lambda frame_number, increment=True: (
        setattr(src, "next_frame_number", src.next_frame_number + increment),
        None,
    )[1]
    with pytest.raises(RuntimeError, match="geometry"):
        src.get_window(5)


def test_generate_test_dir_concurrent_unique(tmp_path):
    """Concurrent --debug runs sharing an export parent claim distinct run
    directories (the reference's read-then-create is racy)."""
    from concurrent.futures import ThreadPoolExecutor

    from swiftwatcher_tpu.io.export import generate_test_dir

    with ThreadPoolExecutor(8) as ex:
        dirs = list(ex.map(lambda _: generate_test_dir(tmp_path), range(8)))
    assert len({str(d) for d in dirs}) == 8
    assert all(d.is_dir() for d in dirs)


def test_profile_trace_and_device_times(tmp_path, video):
    # --profile: a jax.profiler trace lands in profile_dir and the manifest
    # gains the per-stage device-time breakdown (SURVEY.md §5)
    prof = tmp_path / "profile"
    result = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        profile_dir=prof,
    )
    manifest = json.loads((prof / "run_manifest.json").read_text())
    assert "localize" in manifest["device_stage_seconds"]
    assert manifest["device_stage_seconds"]["localize"] > 0
    # the profiler wrote a trace (plugins/profile/<ts>/ layout)
    traced = list(prof.rglob("*.xplane.pb")) + list(prof.rglob("*.trace.json*"))
    assert traced, f"no trace artifacts under {prof}"
    assert result.frames_processed == 63


def test_export_single_class_events(tmp_path):
    """export_results with ALL events in one label class (zero rejected, or
    zero predicted) must not crash: pandas combine_first with an EMPTY
    grouped frame casts the timeline's None placeholders to the empty
    frame's int64 dtype (regression: real runs whose distractors all pass
    the angle test crashed at export)."""
    import pandas as pd

    from swiftwatcher_tpu.io.export import export_results, frame_timestamp

    def labels(label):
        idx = pd.MultiIndex.from_tuples(
            [(frame_timestamp(13, 30.0), 13), (frame_timestamp(32, 30.0), 32)],
            names=["timestamp", "framenumber"],
        )
        return pd.DataFrame(
            {"angle": [-78.4, -70.2], "label": [label, label], "events": [1, 1]},
            index=idx,
        )

    total = export_results(tmp_path / "all_pred", labels(1), 30.0, 0, 63)
    assert total == 2
    assert (tmp_path / "all_pred" / "2-swifts_full_sec.csv").is_file()
    total = export_results(tmp_path / "all_rej", labels(0), 30.0, 0, 63)
    assert total == 0
    assert (tmp_path / "all_rej" / "0-swifts_full_sec.csv").is_file()


def test_doc_artifact_consistency():
    """Docs <-> artifacts drift guard (VERDICT r4 weakness #6): every
    artifact filename mentioned in README/CLAUDE.md exists, and every
    headline number quoted in README re-derives from its named artifact
    (tools/doc_check.py)."""
    import tools.doc_check as doc_check

    assert doc_check.run() == []
