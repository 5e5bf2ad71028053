"""Differential test against the ACTUAL reference implementation.

Everything else in this suite compares the rebuild to
``tests/oracle_pipeline.py`` — a re-statement of reference semantics
written by reading the source.  These tests close the remaining trust gap:
they import the real reference package from /root/reference (via the exact
third-party shims in reference_shims.py), run its genuine
FrameQueue/SegmentTracker/event-classification code
(``swiftwatcher.__main__.swift_counting_algorithm``) on synthetic videos,
and assert that

  1. the oracle reproduces the reference's events, angles and labels
     exactly (validating the oracle itself), and
  2. the rebuild's pipeline produces the same counts and event frames as
     the reference code — directly, not just transitively.

The --classify differential runs the reference CNN in eval() mode: the
reference never calls model.eval() so torch dropout is nominally active at
its inference time; the rebuild (models/squeezenet.py:13-18, documented
deviation) implements the deterministic eval-mode forward.
"""

from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

from oracle_pipeline import reference_pipeline
from reference_shims import import_reference

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.readers import ArraySource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video


@pytest.fixture(scope="module")
def ref():
    return import_reference()


def _array_reader(ref, frames, fps):
    """In-memory stand-in for the reference's VideoReader: sequential
    read_frame with the genuine base-class error handling — past-the-end
    reads return None so FrameReader.get_frame's last-good substitution
    (io_video.py:50-53, the inclusive-end duplicate quirk) runs for real."""

    class ArrayReader(ref.io_video.FrameReader):
        def __init__(self):
            super().__init__()
            self.filepath = Path("synthetic.avi")
            self.fps = fps
            self.start_frame = 0
            self.end_frame = len(frames)  # CAP_PROP_FRAME_COUNT analogue
            self.next_frame_number = 0
            self.total_frames = self.end_frame - self.start_frame

        def read_frame(self, frame_number, increment=True):
            if 0 <= frame_number < len(frames):
                frame = frames[frame_number].copy()
            else:
                frame = None  # failed grab -> base class substitutes
            if increment:
                self.next_frame_number += 1
            return frame

    return ArrayReader()


def _run_reference(ref, video, classify, monkeypatch):
    # model.pt is addressed relative to the reference checkout
    # (__main__.py:72: SegmentClassifier("swiftwatcher/model.pt"))
    monkeypatch.chdir("/root/reference")
    # model.pt was torch.save()d from CUDA tensors; on this CPU-only rig the
    # reference's bare torch.load needs map_location (env shim, not semantics)
    import torch

    orig_load = torch.load
    monkeypatch.setattr(
        torch,
        "load",
        lambda *a, **kw: orig_load(*a, **{**kw, "map_location": "cpu"}),
    )
    if classify:
        orig_init = ref.segment_classification.SegmentClassifier.__init__

        def eval_init(self, model_path):
            orig_init(self, model_path)
            self.model.eval()  # deterministic forward (see module docstring)

        monkeypatch.setattr(
            ref.segment_classification.SegmentClassifier, "__init__", eval_init
        )
    reader = _array_reader(ref, video.frames, video.fps)
    args = SimpleNamespace(classify=classify, export=False)
    events = ref.main.swift_counting_algorithm(reader, video.corners, args)
    if not events:
        return None
    df_events = ref.event_classification.convert_events_to_dataframe(
        events, ["parent_frame_number", "parent_timestamp", "centroid"]
    )
    return ref.event_classification.classify_events(df_events)


@pytest.mark.parametrize("seed,n_frames", [(0, 63), (1, 50)])
def test_reference_code_vs_oracle(ref, seed, n_frames, monkeypatch):
    """The oracle's events/angles/labels ARE the reference's, exactly."""
    video = make_video(
        seed=seed, n_frames=n_frames, n_entering=2, n_crossing=1, n_vanishing=1
    )
    df_labels = _run_reference(ref, video, classify=False, monkeypatch=monkeypatch)
    events_o, labels_o = reference_pipeline(video.frames, video.corners, video.fps)

    assert df_labels is not None and len(df_labels) == len(labels_o)
    assert int(df_labels["label"].sum()) == sum(labels_o)

    ref_fns = sorted(df_labels.index.get_level_values("framenumber"))
    assert ref_fns == sorted(fn for _, _, fn in events_o)

    # angles bit-exactly equal: both sides compute atan2 over float64
    # centroid means of identical pixel sets
    import math

    oracle_angles = sorted(
        math.degrees(
            math.atan2(first[0] - last[0], -(first[1] - last[1]))
        )
        for first, last, _ in events_o
    )
    assert sorted(df_labels["angle"].tolist()) == oracle_angles


def test_reference_code_vs_rebuild_counts(ref, monkeypatch):
    """Rebuild pipeline vs the reference's real code, head to head."""
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    df_labels = _run_reference(ref, video, classify=False, monkeypatch=monkeypatch)

    result = run_video(
        ArraySource(video.frames, fps=video.fps), video.corners, DEFAULT_CONFIG
    )
    assert result.total_predicted == int(df_labels["label"].sum())
    assert result.total_rejected == int((df_labels["label"] == 0).sum())
    assert sorted(ev.frame_number for ev in result.events) == sorted(
        df_labels.index.get_level_values("framenumber")
    )


@pytest.mark.parametrize("kw", [
    dict(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1),
    dict(seed=4, n_frames=50, n_entering=1, n_crossing=2, n_vanishing=1,
         brightness_drift=0.35),
])
def test_reference_code_vs_rebuild_classify(ref, monkeypatch, kw):
    """--classify differential: reference CNN (eval mode) gating its real
    tracker vs the rebuild's batched device classifier path."""
    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter

    video = make_video(**kw)
    df_labels = _run_reference(ref, video, classify=True, monkeypatch=monkeypatch)

    result = run_video(
        ArraySource(video.frames, fps=video.fps),
        video.corners,
        DEFAULT_CONFIG,
        segment_filter=SqueezeNetSegmentFilter.from_default_weights(),
    )
    ref_pred = 0 if df_labels is None else int(df_labels["label"].sum())
    ref_rej = 0 if df_labels is None else int((df_labels["label"] == 0).sum())
    ref_fns = (
        []
        if df_labels is None
        else sorted(df_labels.index.get_level_values("framenumber"))
    )
    assert result.total_predicted == ref_pred
    assert result.total_rejected == ref_rej
    assert sorted(ev.frame_number for ev in result.events) == ref_fns


def test_tracker_fuzz_vs_reference(ref):
    """Randomized centroid streams through the reference's real
    SegmentTracker (cost matrix + scipy Hungarian + history linking +
    ROI event test) vs the rebuild's host tracker: identical events.

    Streams that crash the reference (None-status indexing,
    segment_tracking.py:139-140 — documented deviation 6 in PARITY.md)
    are skipped; everything the reference survives must match."""
    from swiftwatcher_tpu.pipeline.tracking import SegmentTracker as OurTracker

    class _RP:  # minimal regionprops bag: Segment copies public attrs
        def __init__(self, cy, cx):
            self.centroid = (cy, cx)

    rng = np.random.default_rng(11)
    H, W = 40, 60
    roi = np.zeros((H, W), np.uint8)
    roi[25:36, 10:50] = 255

    compared = 0
    for _ in range(25):
        # persistent walkers (sub-knee steps) + spawns/deaths + teleports
        walkers = []
        frames = []
        for t in range(30):
            if rng.random() < 0.45 and len(walkers) < 4:
                walkers.append(
                    [float(rng.uniform(2, H - 2)), float(rng.uniform(2, W - 2))]
                )
            for wpt in walkers:
                step = rng.uniform(2, 24) if rng.random() < 0.9 else 40.0
                ang = rng.uniform(0, 2 * np.pi)
                wpt[0] = float(np.clip(wpt[0] + step * np.sin(ang), 0, H - 1))
                wpt[1] = float(np.clip(wpt[1] + step * np.cos(ang), 0, W - 1))
            if walkers and rng.random() < 0.3:
                walkers.pop(int(rng.integers(len(walkers))))
            frames.append([(w0, w1) for w0, w1 in walkers])

        theirs = ref.segment_tracking.SegmentTracker(roi)
        theirs.cached_frame = ref.data_structures.Frame()
        ok = True
        try:
            for t, cents in enumerate(frames):
                fr = ref.data_structures.Frame(
                    frame=None, frame_number=t, timestamp=None
                )
                fr.frame_number = t
                fr.null = False
                fr.segments = [
                    ref.data_structures.Segment(_RP(cy, cx), t, None, None)
                    for cy, cx in cents
                ]
                theirs.set_current_frame(fr)
                cm = theirs.formulate_cost_matrix()
                theirs.store_assignments(
                    ref.segment_tracking.apply_hungarian_algorithm(cm)
                )
                theirs.link_matching_segments()
                theirs.check_for_events()
                theirs.cache_current_frame()
        except (TypeError, IndexError):
            ok = False  # reference crash path (deviation 6)
        if not ok:
            continue
        compared += 1

        ours = OurTracker(roi, DEFAULT_CONFIG)
        for t, cents in enumerate(frames):
            ours.step(cents, t, None)

        ref_events = sorted(
            (
                path[-1].parent_frame_number,
                path[0].centroid,
                path[-1].centroid,
            )
            for path in theirs.detected_events
        )
        our_events = sorted(
            (ev.frame_number, ev.first_centroid, ev.last_centroid)
            for ev in ours.events
        )
        assert our_events == ref_events

        # device tracker on the same reference-shaped corpus: the JV and
        # enumeration LAP paths must be BITWISE equal to each other.  (They
        # are not asserted against the reference here: this corpus draws
        # steps up to 24 px, f32-rounding distance from the 25-px cost knee,
        # where the device tracker's f32 costs can legitimately flip a
        # match the f64 host/reference keeps — PARITY.md deviation 10; the
        # e2e device-vs-host suites cover realistic streams.)
        import dataclasses

        import jax
        import jax.numpy as jnp

        from swiftwatcher_tpu.pipeline.tracking_jax import (
            empty_state,
            track_window,
        )

        K = DEFAULT_CONFIG.max_tracks
        T = len(frames)
        cys = np.zeros((T, K), np.float32)
        cxs = np.zeros((T, K), np.float32)
        valids = np.zeros((T, K), bool)
        for t, cents in enumerate(frames):
            for k, (cy, cx) in enumerate(cents[:K]):
                cys[t, k], cxs[t, k], valids[t, k] = cy, cx, True
        dev_args = (
            empty_state(K), jnp.asarray(roi), jnp.asarray(cys),
            jnp.asarray(cxs), jnp.asarray(valids),
            jnp.arange(T, dtype=jnp.int32),
        )
        out_jv = track_window(*dev_args, DEFAULT_CONFIG)
        out_enum = track_window(
            *dev_args, dataclasses.replace(DEFAULT_CONFIG, track_enum_lap=4)
        )
        for a, b in zip(jax.tree.leaves(out_jv), jax.tree.leaves(out_enum)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert compared >= 15  # the crash path must not dominate the sample


def test_ialm_oracle_bitexact_vs_reference_solver(ref):
    """oracles.ialm_rpca_f64 vs the reference's real
    inexact_augmented_lagrange_multiplier (image_filtering.py:256-301):
    same numpy ops in the same order must give BITWISE-equal A and E —
    including the svp length-bug and 'norm_two'-is-Frobenius quirks —
    and the uint8 motion windows from rpca() must match the oracle's."""
    from oracles import ialm_rpca_f64

    rng = np.random.default_rng(7)
    # low-rank + sparse f64 matrix, and a realistic uint8 gray window
    n, T = 300, 21
    base = np.outer(rng.normal(size=n), np.ones(T)) * 120 + 128
    sparse = (rng.random((n, T)) < 0.02) * rng.uniform(-80, 80, (n, T))
    cases = [
        np.clip(base + sparse + rng.normal(0, 2, (n, T)), 0, 255).round(),
        rng.integers(0, 255, size=(64, T)).astype(np.float64),
    ]
    for X in cases:
        A_ref, E_ref = ref.image_filtering.inexact_augmented_lagrange_multiplier(
            X.copy()
        )
        A_o, E_o, _ = ialm_rpca_f64(X)
        np.testing.assert_array_equal(A_o, A_ref)
        np.testing.assert_array_equal(E_o, E_ref)

    # whole-window path: rpca() reshapes, negates, clips to uint8
    frames = [
        np.clip(
            rng.normal(128, 8, (12, 25)) - 90 * (rng.random((12, 25)) < 0.01),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(T)
    ]
    motion_ref = ref.image_filtering.rpca([f.astype(np.float64) for f in frames])
    X = np.stack(frames).reshape(T, -1).T.astype(np.float64)
    _, E, _ = ialm_rpca_f64(X)
    motion_o = np.clip(-E, 0, 255).astype(np.uint8).T.reshape(T, 12, 25)
    for t in range(T):
        np.testing.assert_array_equal(motion_o[t], motion_ref[t])


def test_generate_regions_matches_reference_pixels(ref):
    """crop_region and ROI mask, pixel-for-pixel vs the reference's real
    generate_regions (image_filtering.py:20-122 — medianBlur x2, Otsu,
    Canny, 20-up dilation, second Otsu), across several scenes."""
    from swiftwatcher_tpu.geometry import (
        crop_region_from_corners,
        roi_crop_region_from_corners,
    )
    from swiftwatcher_tpu.ops.roi_mask import generate_roi_mask

    for seed in (0, 1, 2, 5):
        video = make_video(seed=seed, n_frames=3)
        ff = video.frames[0]
        crop_ref, mask_ref, _resize = ref.image_filtering.generate_regions(
            ff, video.corners
        )
        crop = crop_region_from_corners(video.corners, DEFAULT_CONFIG)
        roi = roi_crop_region_from_corners(video.corners, DEFAULT_CONFIG)
        mask = np.asarray(generate_roi_mask(ff, roi, crop, DEFAULT_CONFIG))
        assert [tuple(p) for p in crop_ref] == [tuple(p) for p in crop]
        np.testing.assert_array_equal(mask, np.asarray(mask_ref))


def test_event_classification_edges_vs_reference(ref):
    """Crafted angle sets through the reference's real classify_events vs
    pipeline/events.py: exact 15-degree multiples (the false-angle filter),
    float near-misses (45 deg is NOT exact in IEEE atan2/degrees), pd.cut
    band edges at mode+/-30, the hist[i_max-1] wrap, and single-event and
    all-filtered sets."""
    import pandas as pd

    from swiftwatcher_tpu.pipeline.events import classify_events as ours_classify
    from swiftwatcher_tpu.pipeline.tracking import Event

    class _Seg:
        def __init__(self, cy, cx, fn, ts):
            self.centroid = (cy, cx)
            self.parent_frame_number = fn
            self.parent_timestamp = ts

    def make_pair(angle_deg, fn):
        """first/last centroids whose first->last angle is
        degrees(atan2(sin a, cos a)) — the same float both sides."""
        rad = np.deg2rad(angle_deg)
        dy, dx = float(np.sin(rad)) * 20, float(np.cos(rad)) * 20
        first, last = (dy, -dx), (0.0, 0.0)
        ts = pd.Timestamp("00:00:00") + pd.Timedelta(fn / 30.0, "s")
        return first, last, fn, ts

    rng = np.random.default_rng(3)
    angle_sets = [
        [90.0, 0.0, 180.0, -90.0],                    # all exact multiples
        [45.0, -75.3, -88.0, -92.0, -119.9],          # 45 is a near-miss
        [-90.0 + d for d in (-30.5, -30.0, -29.9, 29.9, 30.0, 30.5)],
        [-60.1],                                       # single event
        list(rng.uniform(-180, 180, 40)),              # bulk random
        [-170.0 + 0.1 * i for i in range(10)],         # modal bin at edge
    ]
    for angles in angle_sets:
        pairs = [make_pair(a, 10 + i) for i, a in enumerate(angles)]

        ref_events = [
            [_Seg(*first, fn, ts), _Seg(*last, fn, ts)]
            for first, last, fn, ts in pairs
        ]
        df_ref = ref.event_classification.convert_events_to_dataframe(
            ref_events, ["parent_frame_number", "parent_timestamp", "centroid"]
        )
        df_ref = ref.event_classification.classify_events(df_ref)

        ours = ours_classify(
            [
                Event(
                    first_centroid=first,
                    last_centroid=last,
                    frame_number=fn,
                    timestamp=ts,
                )
                for first, last, fn, ts in pairs
            ]
        )
        assert len(ours) == len(df_ref), angles
        assert ours["angle"].tolist() == df_ref["angle"].tolist(), angles
        assert ours["label"].tolist() == df_ref["label"].tolist(), angles


def test_export_csvs_byte_equal_vs_reference(ref, tmp_path, monkeypatch):
    """io/export.py writes BYTE-identical CSVs to the reference's
    io_data.export_results given the same labeled-events dataframe — a
    reference user's downstream spreadsheets/scripts keep parsing."""
    from swiftwatcher_tpu.io.export import export_results as ours

    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    df_labels = _run_reference(ref, video, classify=False, monkeypatch=monkeypatch)
    assert df_labels is not None

    dir_ref = tmp_path / "ref"
    dir_our = tmp_path / "our"
    dir_ref.mkdir()
    total_ref = ref.io_data.export_results(
        dir_ref, df_labels.copy(deep=True), video.fps, 0, len(video.frames)
    )
    total_our = ours(dir_our, df_labels.copy(deep=True), video.fps, 0, len(video.frames))
    assert total_ref == total_our

    names_ref = sorted(p.name for p in dir_ref.glob("*.csv"))
    names_our = sorted(p.name for p in dir_our.glob("*.csv"))
    assert names_ref == names_our and len(names_ref) == 6
    for name in names_ref:
        assert (dir_our / name).read_bytes() == (dir_ref / name).read_bytes(), name


def test_h5_cache_interops_with_reference_reader(ref, tmp_path):
    """tools/make_h5_cache.py output is readable by the reference's own
    HDF5Reader (io_video.py:85-131) — a reference user's cached-experiment
    workflow keeps working — and both readers see identical pixels."""
    import cv2
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from make_h5_cache import make_cache

    from swiftwatcher_tpu.io.readers import open_source

    video = make_video(seed=2, n_frames=12)
    h, w = video.frames[0].shape[:2]
    avi = tmp_path / "clip.avi"
    wr = cv2.VideoWriter(
        str(avi), cv2.VideoWriter_fourcc(*"MJPG"), video.fps, (w, h)
    )
    assert wr.isOpened()
    for f in video.frames:
        wr.write(f)
    wr.release()

    h5 = tmp_path / "clip.h5"
    n = make_cache(avi, h5, status=False)
    assert n == len(video.frames)

    theirs = ref.io_video.HDF5Reader(h5)
    ours = open_source(h5)
    assert theirs.total_frames == ours.total_frames == len(video.frames)
    assert float(theirs.fps) == float(ours.fps) == video.fps
    for i in range(len(video.frames)):
        a = theirs.read_frame(i, increment=False)
        b = ours.read_frame(i, increment=False)
        np.testing.assert_array_equal(a, b)
