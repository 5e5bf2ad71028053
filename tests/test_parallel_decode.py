"""Chunk-parallel container decode (io/parallel_decode.py; VERDICT r2 #4).

Parity contract: for a seek-accurate container, the parallel backend must
be frame-for-frame byte-identical to the reference-exact sequential cv2
backend — including the inclusive-end duplicate-frame quirk and failed-read
substitution.  This rig exposes one core, so these tests verify parity and
plumbing; the speedup claim is architectural (workers decode disjoint
chunks inside ffmpeg, off the GIL)."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.parallel_decode import ParallelDecoder, probe_seek_accuracy
from swiftwatcher_tpu.io.readers import VideoFileSource
from swiftwatcher_tpu.io.synthetic import make_video


@pytest.fixture(scope="module")
def mp4(tmp_path_factory):
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1)
    p = tmp_path_factory.mktemp("pdec") / "clip.mp4"
    w = cv2.VideoWriter(
        str(p), cv2.VideoWriter_fourcc(*"mp4v"), video.fps,
        (video.frames.shape[2], video.frames.shape[1]),
    )
    assert w.isOpened()
    for f in video.frames:
        w.write(f)
    w.release()
    return p, video


def test_probe_seek_accuracy(mp4):
    p, _ = mp4
    assert probe_seek_accuracy(p)
    assert probe_seek_accuracy(p, 63)   # with the deep origin-consistency leg


class _DelegatingCap:
    """cv2.VideoCapture wrapper for fault-injection tests."""

    def __init__(self, path):
        self._c = _REAL_CAPTURE(str(path))

    def isOpened(self):
        return self._c.isOpened()

    def get(self, prop):
        return self._c.get(prop)

    def set(self, prop, val):
        return self._c.set(prop, val)

    def read(self):
        return self._c.read()

    def release(self):
        return self._c.release()


_REAL_CAPTURE = cv2.VideoCapture


def test_probe_rejects_origin_dependent_seek(mp4, monkeypatch):
    """A container whose DEEP seeks land origin-dependently (open GOP /
    irregular keyframes) must fail the probe even though head-of-file
    seeks are exact — the single-position probe used to pass these."""
    p, _ = mp4

    class SloppyDeepSeek(_DelegatingCap):
        def set(self, prop, val):
            if prop == cv2.CAP_PROP_POS_FRAMES and val > 20:
                val = val - (val % 2)     # deep seeks snap to even frames
            return self._c.set(prop, val)

    monkeypatch.setattr(cv2, "VideoCapture", SloppyDeepSeek)
    # head-only legs still pass (seeks <= 20 are exact) ...
    assert probe_seek_accuracy(p)
    # ... but the deep origin-consistency leg catches the snap
    assert not probe_seek_accuracy(p, 63)


def test_worker_realigns_after_failed_read(mp4, monkeypatch):
    """A failed cap.read() does not advance ffmpeg's cursor; the worker
    must re-seek before its next chunk or every later frame it publishes
    is silently shifted by the number of failures."""
    p, _ = mp4
    cap = _REAL_CAPTURE(str(p))
    seq = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        seq.append(f)
    cap.release()

    state = {"failed": False}

    class OneFailNoAdvance(_DelegatingCap):
        def read(self):
            pos = int(self._c.get(cv2.CAP_PROP_POS_FRAMES))
            if pos == 20 and not state["failed"]:
                state["failed"] = True
                return False, None        # cursor stays at 20
            return self._c.read()

    monkeypatch.setattr(cv2, "VideoCapture", OneFailNoAdvance)
    # one worker => chunks are claimed contiguously, so without the
    # re-seek the next chunk would skip its cap.set() and publish
    # frame 23's bytes as frame 24, 24 as 25, ...
    dec = ParallelDecoder(p, len(seq), n_workers=1, chunk=8)
    try:
        assert dec.get(20) is None        # the injected failure surfaces
        # the REST of the failed chunk (21-23) must be decode failures too:
        # reads after a non-advancing failure would return the previous
        # frame's bytes under the next frame's number (silent shift)
        for i in (21, 22, 23):
            assert dec.get(i) is None, f"frame {i} must fail with its chunk"
        for i in list(range(16, 20)) + list(range(24, len(seq))):
            got = dec.get(i)
            assert got is not None and np.array_equal(got, seq[i]), f"frame {i}"
    finally:
        dec.close()


def test_decoder_matches_sequential(mp4):
    p, _ = mp4
    cap = cv2.VideoCapture(str(p))
    seq = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        seq.append(f)
    cap.release()

    dec = ParallelDecoder(p, len(seq), n_workers=3, chunk=5, max_ahead=17)
    try:
        for i, ref in enumerate(seq):
            got = dec.get(i)
            assert got is not None and np.array_equal(got, ref), f"frame {i}"
        assert dec.get(len(seq)) is None     # past the end
    finally:
        dec.close()


def test_decoder_restart(mp4):
    p, _ = mp4
    dec = ParallelDecoder(p, 63, n_workers=2, chunk=4)
    try:
        a0 = dec.get(0)
        dec.restart(40)
        f40 = dec.get(40)
        cap = cv2.VideoCapture(str(p))
        cap.set(cv2.CAP_PROP_POS_FRAMES, 40)
        ok, ref = cap.read()
        cap.release()
        assert ok and np.array_equal(f40, ref)
        assert a0 is not None
    finally:
        dec.close()


def test_source_backend_parity(mp4):
    """get_frame walk over [0, end] INCLUSIVE through both backends:
    byte-identical frames, same read_errors (the end+1 read fails and
    substitutes the last good frame — the reference's duplicate-frame
    quirk)."""
    p, _ = mp4
    seq = VideoFileSource(p, backend="cv2")
    par = VideoFileSource(p, backend="parallel", decode_workers=3)
    assert par.backend == "parallel" and par.supports_seek
    assert par.total_frames == seq.total_frames
    try:
        for _ in range(seq.start_frame, seq.end_frame + 1):
            fs, ns, ts = seq.get_frame()
            fp, np_, tp = par.get_frame()
            assert ns == np_ and ts == tp
            assert np.array_equal(fs, fp)
        assert seq.read_errors == par.read_errors == 1  # inclusive-end dup
    finally:
        par.close()


def test_e2e_counts_backend_invariant(mp4):
    from swiftwatcher_tpu.pipeline.runner import run_video

    p, video = mp4
    base = run_video(
        VideoFileSource(p, backend="cv2"), video.corners, DEFAULT_CONFIG
    )
    src = VideoFileSource(p, backend="parallel", decode_workers=3)
    par = run_video(src, video.corners, DEFAULT_CONFIG)
    src.close()
    assert par.total_predicted == base.total_predicted
    assert par.total_rejected == base.total_rejected
    assert [e.frame_number for e in par.events] == [
        e.frame_number for e in base.events
    ]
    assert par.frames_processed == base.frames_processed


def test_checkpoint_resume_on_parallel_mp4(mp4, tmp_path):
    """supports_seek upgrade: checkpointed runs resume on seek-accurate
    containers (the sequential backend refuses — readers.py contract)."""
    from swiftwatcher_tpu.pipeline.runner import run_video

    p, video = mp4
    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=1)
    full = run_video(
        VideoFileSource(p, backend="parallel", decode_workers=2),
        video.corners, cfg,
    )
    ckpt = tmp_path / "state.ckpt"
    src = VideoFileSource(p, backend="parallel", decode_workers=2)
    src.end_frame = 42
    src.total_frames = 42
    run_video(src, video.corners, cfg, checkpoint_path=ckpt,
              checkpoint_interval_batches=1)
    src.close()
    resumed = run_video(
        VideoFileSource(p, backend="parallel", decode_workers=2),
        video.corners, cfg,
        checkpoint_path=ckpt, checkpoint_interval_batches=1,
    )
    assert resumed.total_predicted == full.total_predicted
    assert resumed.total_rejected == full.total_rejected
    assert len(resumed.events) == len(full.events)


def test_sequential_source_on_one_core(mp4, monkeypatch):
    """auto backend with one visible core never engages parallel workers;
    it stays strictly sequential — the parity-probed native libav decoder
    when available, else the reference-exact cv2 path."""
    p, _ = mp4
    monkeypatch.setenv("SWTPU_DECODE_WORKERS", "1")
    src = VideoFileSource(p, backend="auto")
    from swiftwatcher_tpu.io import native_av

    expected = "av" if native_av.probe_bgr_parity(p) is not None else "cv2"
    assert src.backend == expected
    # the av backend may upgrade supports_seek (probed keyframe-seek);
    # the cv2 fallback never does
    if expected == "cv2":
        assert not src.supports_seek
    src.close()


def test_parallel_gray_window_matches_cv2(mp4):
    """Parallel backend + gray-crop workers (enable_gray_crop_stream swaps
    cv2 full-frame workers for native slice-decode workers): source-level
    gray windows must equal the cv2 backend's get_window + host gray —
    numbers, timestamps, inclusive-end duplicate, null tail, read_errors."""
    from swiftwatcher_tpu.ops.color import bgr_to_gray_host

    p, video = mp4
    H, W = video.frames.shape[1:3]
    crop = ((6, 5), (W - 6, H - 5))
    (x1, y1), (x2, y2) = crop
    s_par = VideoFileSource(p, backend="parallel", decode_workers=3)
    s_cv = VideoFileSource(p, backend="cv2")
    try:
        if not s_par.enable_gray_crop_stream(crop):
            pytest.skip("native libav gray-crop probe failed on this host")
        assert s_par._gray_crop == crop
        n = video.frames.shape[0] + 3  # crosses inclusive-end AND nulls
        gp, npar, tp = s_par.get_gray_crop_window(n)
        fc, nc, tc = s_cv.get_window(n)
        gc = bgr_to_gray_host(np.stack([f[y1:y2, x1:x2] for f in fc]))
        assert npar == nc and tp == tc
        assert np.array_equal(gp, gc)
        assert s_par.read_errors == s_cv.read_errors == 1
        # full-frame reads after the gray workers engaged are a misuse
        with pytest.raises(AssertionError):
            s_par.read_frame(0)
    finally:
        s_par.close()
        s_cv.close()


def test_parallel_gray_nonsequential_restart(mp4):
    """fn != cursor in gray mode re-aims the workers (checkpoint resume):
    the jumped-to window must be byte-identical to a fresh sequential
    read at the same position."""
    from swiftwatcher_tpu.ops.color import bgr_to_gray_host

    p, video = mp4
    H, W = video.frames.shape[1:3]
    crop = ((4, 4), (W - 4, H - 4))
    (x1, y1), (x2, y2) = crop
    src = VideoFileSource(p, backend="parallel", decode_workers=2)
    try:
        if not src.enable_gray_crop_stream(crop):
            pytest.skip("native libav gray-crop probe failed on this host")
        src.get_gray_crop_window(7)          # consume a bit
        src.next_frame_number = 31           # resume-style jump
        g, nums, _ = src.get_gray_crop_window(8)
        assert nums == list(range(31, 39))
        s_cv = VideoFileSource(p, backend="cv2")
        try:
            s_cv.get_window(31)
            fc, nc, _ = s_cv.get_window(8)
        finally:
            s_cv.close()
        assert nc == nums
        want = bgr_to_gray_host(np.stack([f[y1:y2, x1:x2] for f in fc]))
        assert np.array_equal(g, want)
    finally:
        src.close()


def test_parallel_worker_factory_failure_degrades_to_substitution(mp4):
    """A worker whose reader fails to construct must keep serving its
    claimed chunks as decode failures (None frames), not strand the
    consumer in a timeout."""
    p, _ = mp4

    def broken_factory(path):
        raise RuntimeError("no reader for you")

    dec = ParallelDecoder(p, 20, n_workers=2, worker_factory=broken_factory)
    try:
        got = [dec.get(i, timeout=30.0) for i in range(20)]
        assert got == [None] * 20
    finally:
        dec.close()


def test_parallel_gray_random_jump_stress(mp4):
    """Threading stress for the gray-worker decoder: random resume-style
    jumps interleaved with window reads must always return the frames the
    cv2 sequential backend returns at the same positions (exercises
    claim/park/restart races across worker counts)."""
    from swiftwatcher_tpu.ops.color import bgr_to_gray_host

    p, video = mp4
    H, W = video.frames.shape[1:3]
    crop = ((8, 6), (W - 8, H - 6))
    (x1, y1), (x2, y2) = crop

    # cv2 sequential ground truth, decoded once
    s_cv = VideoFileSource(p, backend="cv2")
    try:
        fc, nc, _ = s_cv.get_window(video.frames.shape[0])
    finally:
        s_cv.close()
    truth = bgr_to_gray_host(np.stack([f[y1:y2, x1:x2] for f in fc]))

    rng = np.random.default_rng(7)
    for workers in (2, 5):
        src = VideoFileSource(p, backend="parallel", decode_workers=workers)
        try:
            if not src.enable_gray_crop_stream(crop):
                pytest.skip("native libav gray-crop probe failed")
            for _ in range(25):
                start = int(rng.integers(0, video.frames.shape[0] - 1))
                n = int(rng.integers(1, 9))
                src.next_frame_number = start
                g, nums, _ = src.get_gray_crop_window(n)
                for j, fn in enumerate(nums):
                    if 0 <= fn < truth.shape[0]:
                        assert np.array_equal(g[j], truth[fn]), (
                            workers, start, n, fn)
        finally:
            src.close()


def test_keyframe_aligned_chunking(mp4):
    """Keyframe-aligned chunks: boundary merge keeps chunks >= `chunk`
    frames, each starting ON a keyframe (worker seeks then decode zero
    discarded frames); stream parity and deep restart must hold.  Measured
    1-core A/B at GOP 12: 483 vs 375 fps — the waste grows with GOP/chunk,
    so real surveillance GOPs (~250) gain ~an order of magnitude."""
    from swiftwatcher_tpu.io import native_av

    p, _ = mp4
    rd = native_av.AVReader.open(p)
    if rd is None:
        pytest.skip("no native libav on this host")
    kfs = rd.keyframes()
    total = rd.n_frames
    rd.close()
    if kfs is None or len(kfs) < 3:
        pytest.skip("container exposes no keyframe index")
    kfs = [int(k) for k in kfs]
    assert kfs[0] == 0 and kfs == sorted(set(kfs))

    cap = cv2.VideoCapture(str(p))
    seq = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        seq.append(f)
    cap.release()

    dec = ParallelDecoder(p, total, n_workers=3, chunk=8, boundaries=kfs)
    try:
        # every chunk start is a keyframe and chunks are >= 8 frames
        starts = [int(b) for b in dec._bounds[:-1]]
        assert all(s in kfs or s == 0 for s in starts)
        assert all(b - a >= 8 for a, b in zip(starts, starts[1:]))
        for i, ref in enumerate(seq):
            got = dec.get(i)
            assert got is not None and np.array_equal(got, ref), f"frame {i}"
        # deep restart across a boundary (generation invalidation)
        dec.restart(40)
        got = dec.get(40)
        assert np.array_equal(got, seq[40])
    finally:
        dec.close()


def test_source_uses_keyframe_bounds(mp4):
    """The parallel backend feeds the container's keyframe index into the
    decoder (None only when the index is unavailable)."""
    p, _ = mp4
    src = VideoFileSource(p, backend="parallel", decode_workers=2)
    try:
        if src._kf_bounds is not None:
            assert src._kf_bounds[0] == 0
            assert list(src._pdec._bounds[:-1])[0] == 0
    finally:
        src.close()


def test_restart_into_long_chunk_does_not_strand_prefix():
    """restart() into the middle of a GOP-long keyframe chunk: the worker
    must decode the keyframe->target prefix but NOT store it — get() can
    never return frames behind the consumer window, so stored ones would sit
    in the buffer (full-BGR frames on the cv2 worker) for the stream's
    life."""
    import time

    class _CountingWorker:
        """Deterministic fake: frame n decodes to array([n])."""

        def __init__(self, path):
            self.pos = 0

        def seek(self, pos):
            self.pos = pos
            return True

        def read(self):
            f = np.array([self.pos], np.int64)
            self.pos += 1
            return f

    total = 200
    dec = ParallelDecoder(
        "fake", total, n_workers=2, chunk=8,
        worker_factory=_CountingWorker,
        boundaries=[0, 100],          # one 100-frame "GOP" chunk each
    )
    try:
        # consume a few frames from the head, then resume deep into chunk 0
        for i in range(3):
            assert int(dec.get(i)[0]) == i
        dec.restart(60)
        assert int(dec.get(60)[0]) == 60
        for i in range(61, 100):
            assert int(dec.get(i)[0]) == i
        # the 0..58 prefix was decoded through but never stored
        deadline = time.time() + 5
        while time.time() < deadline:
            with dec._lock:
                stale = [k for k in dec._frames if k < 59]
            if not stale:
                break
            time.sleep(0.05)
        assert not stale, f"stranded prefix frames: {sorted(stale)[:10]}..."
        # stream continues normally across the chunk boundary
        assert int(dec.get(100)[0]) == 100
    finally:
        dec.close()


def test_start_mid_chunk_does_not_strand_prefix():
    """Opening with start=N inside a keyframe chunk (checkpoint resume via
    the constructor) must not retain the keyframe->start prefix either."""
    class _CountingWorker:
        def __init__(self, path):
            self.pos = 0

        def seek(self, pos):
            self.pos = pos
            return True

        def read(self):
            f = np.array([self.pos], np.int64)
            self.pos += 1
            return f

    dec = ParallelDecoder(
        "fake", 200, n_workers=2, chunk=8, start=70,
        worker_factory=_CountingWorker, boundaries=[0, 100],
    )
    try:
        for i in range(70, 110):
            assert int(dec.get(i)[0]) == i
        with dec._lock:
            stale = [k for k in dec._frames if k < 69]
        assert not stale, f"stranded prefix frames: {sorted(stale)[:10]}..."
    finally:
        dec.close()
