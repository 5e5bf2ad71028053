"""Native libav container decode (native/avpump.cpp + io/native_av.py).

Parity contract: the av backend only ever engages after probe_bgr_parity
proves byte-exact BGR equality against cv2 on the target file, so these
tests assert the full contract on both of the reference's real container
codecs — H.264 (fabricated through the system libx264; cv2's bundled FFmpeg
ships no H.264 encoder) and MPEG-4 part 2 (cv2 VideoWriter) — including
stream-end agreement and the inclusive-end duplicate-frame quirk
(io_video.py:40,51-53).  This rig exposes one core; the frame-threading
speedup claim is architectural (libavcodec FF_THREAD_FRAME)."""

from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from swiftwatcher_tpu.io import native_av
from swiftwatcher_tpu.io.readers import VideoFileSource
from swiftwatcher_tpu.io.synthetic import make_video

if not native_av.is_available():
    pytest.skip("libav native decoder unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def clips(tmp_path_factory):
    """{codec: (path, frames)} for every codec this host can encode."""
    video = make_video(seed=3, n_frames=48, n_entering=2, n_crossing=1)
    d = tmp_path_factory.mktemp("avdec")
    out = {}
    p = d / "clip_mp4v.mp4"
    w = cv2.VideoWriter(
        str(p), cv2.VideoWriter_fourcc(*"mp4v"), video.fps,
        (video.frames.shape[2], video.frames.shape[1]),
    )
    assert w.isOpened()
    for f in video.frames:
        w.write(f)
    w.release()
    out["mp4v"] = (p, video.frames)
    p = d / "clip_h264.mp4"
    if native_av.write_test_video(p, video.frames, fps=video.fps, codec="libx264"):
        out["h264"] = (p, video.frames)
    return out


@pytest.fixture(params=["mp4v", "h264"])
def clip(request, clips):
    if request.param not in clips:
        pytest.skip(f"no encoder for {request.param} on this host")
    return clips[request.param]


def test_probe_engages_and_full_stream_parity(clip):
    path, _ = clip
    rd = native_av.probe_bgr_parity(path)
    assert rd is not None
    cap = cv2.VideoCapture(str(path))
    try:
        assert rd.n_frames == int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        assert rd.fps == pytest.approx(cap.get(cv2.CAP_PROP_FPS), rel=1e-9)
        n = 0
        while True:
            ok, ref = cap.read()
            mine = rd.read()
            if not ok:
                # the native stream must end exactly where cv2's does
                assert mine is None
                break
            assert mine is not None and np.array_equal(ref, mine)
            n += 1
        assert n == rd.n_frames
    finally:
        rd.close()
        cap.release()


def test_reader_windows_match_cv2_backend(clip):
    path, frames = clip
    s_av = VideoFileSource(path)
    s_cv = VideoFileSource(path, backend="cv2")
    try:
        assert s_av.backend == "av"
        assert s_av.total_frames == s_cv.total_frames == len(frames)
        # one past the end: crosses the inclusive-end duplicate read
        fa, na, ta = s_av.get_window(len(frames) + 1)
        fc, nc, tc = s_cv.get_window(len(frames) + 1)
        assert na == nc and ta == tc
        for a, c in zip(fa, fc):
            assert np.array_equal(a, c)
        assert s_av.read_errors == s_cv.read_errors == 1
        # duplicate tail: last two frames identical (last-good substitution)
        assert np.array_equal(fa[-1], fa[-2])
    finally:
        s_av.close()
        s_cv.close()


def test_forced_av_backend_rejects_unparseable(tmp_path):
    bogus = tmp_path / "noise.mp4"
    bogus.write_bytes(b"\x00" * 4096)
    with pytest.raises((ValueError, RuntimeError)):
        VideoFileSource(bogus, backend="av")


def test_native_seek_matches_sequential(clip):
    """Keyframe-seek + decode-forward must reproduce sequential decode
    byte-for-byte (that's what upgrades supports_seek -> checkpoint resume
    on any container, io/readers.py)."""
    path, frames = clip
    assert native_av.probe_native_seek(path)
    rd = native_av.AVReader.open(path)
    try:
        seq = []
        while True:
            f = rd.read()
            if f is None:
                break
            seq.append(f)
        for target in (0, 7, len(seq) - 1, 3, len(seq) // 2):
            assert rd.seek(target)
            got = rd.read()
            assert got is not None and np.array_equal(seq[target], got)
        # past-EOF seek reports end-of-stream, not garbage
        assert not rd.seek(len(seq) + 5)
    finally:
        rd.close()


def test_gray_crop_read_bit_exact(clip):
    """Direct gray-crop decode == gray(full BGR)[crop] on EVERY frame, on a
    deliberately awkward geometry (odd y1/y2: regression for the odd-height
    swscale slice falling off the unscaled fast path)."""
    from swiftwatcher_tpu.io import native as fp
    from swiftwatcher_tpu.ops.color import bgr_to_gray_host

    path, frames = clip
    H, W = frames.shape[1:3]
    crop = ((5, 7), (W - 5, H - 7))
    assert native_av.probe_gray_crop_parity(path, crop)
    rd_a = native_av.AVReader.open(path)
    rd_b = native_av.AVReader.open(path)
    try:
        n = 0
        while True:
            full = rd_a.read()
            fast = rd_b.read_gray_crop(crop)
            if full is None:
                assert fast is None
                break
            (x1, y1), (x2, y2) = crop
            if fp.is_available():
                want = fp.gray_crop_batch(full[None], crop)[0]
            else:
                want = bgr_to_gray_host(full[None, y1:y2, x1:x2])[0]
            assert np.array_equal(want, fast)
            n += 1
        assert n == len(frames)
    finally:
        rd_a.close()
        rd_b.close()


def test_gray_crop_window_matches_cv2_reader(clip):
    """Source-level gray windows (enable_gray_crop_stream +
    get_gray_crop_window) == cv2 backend's get_window + host gray — same
    numbers/timestamps, same inclusive-end duplicate, same null tail."""
    from swiftwatcher_tpu.ops.color import bgr_to_gray_host

    path, frames = clip
    H, W = frames.shape[1:3]
    crop = ((4, 3), (W - 4, H - 3))
    (x1, y1), (x2, y2) = crop
    s_av = VideoFileSource(path)
    s_cv = VideoFileSource(path, backend="cv2")
    try:
        assert s_av.enable_gray_crop_stream(crop)
        n = len(frames) + 3  # crosses inclusive-end AND null frames
        ga, na, ta = s_av.get_gray_crop_window(n)
        fc, nc, tc = s_cv.get_window(n)
        gc = bgr_to_gray_host(
            np.stack([f[y1:y2, x1:x2] for f in fc])
        )
        assert na == nc and ta == tc
        assert np.array_equal(ga, gc)
        assert s_av.read_errors == s_cv.read_errors == 1
    finally:
        s_av.close()
        s_cv.close()


def test_av_checkpoint_resume_equals_full(clips, tmp_path, monkeypatch):
    """Interrupted run resumed through the av backend's seek == full run
    (the capability parallel decode provides only on multicore seekable
    files, now available on any probed container)."""
    import jax

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    import dataclasses

    monkeypatch.setenv("SWTPU_DECODE_WORKERS", "1")  # force av over parallel
    video = make_video(seed=5, n_frames=63, n_entering=2, n_crossing=1)
    p = tmp_path / "resume.mp4"
    if not native_av.write_test_video(p, video.frames, fps=video.fps):
        pytest.skip("no libx264 on this host")
    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=1)
    src = VideoFileSource(p)
    assert src.backend == "av" and src.supports_seek
    full = run_video(src, video.corners, cfg, tracker_impl="device")
    src.close()
    # partial run (end truncated) writes a checkpoint mid-video ...
    ck = tmp_path / "ck.npz"
    src2 = VideoFileSource(p)
    src2.end_frame = 42
    src2.total_frames = 42
    run_video(src2, video.corners, cfg, tracker_impl="device",
              checkpoint_path=ck, checkpoint_interval_batches=1)
    src2.close()
    assert ck.exists()
    # ... and the resumed full-length run seeks to frame 42 through the av
    # backend's keyframe-seek, finishing with the full run's results
    src3 = VideoFileSource(p)
    resumed = run_video(src3, video.corners, cfg, tracker_impl="device",
                        checkpoint_path=ck, checkpoint_interval_batches=1)
    src3.close()
    assert resumed.total_predicted == full.total_predicted
    assert len(resumed.events) == len(full.events)


def test_h264_fixture_metadata_exact(clips):
    """The fabricated H.264 stream must be clean: container frame count ==
    decodable frames and exact fps (regressions here produced a 0-duration
    final sample -> 39/40 frames and avg_frame_rate 1000/39)."""
    if "h264" not in clips:
        pytest.skip("no libx264 on this host")
    path, frames = clips["h264"]
    rd = native_av.AVReader.open(path)
    try:
        assert rd.n_frames == len(frames)
        assert rd.fps == pytest.approx(30.0, rel=1e-9)  # make_video default
        n = 0
        while rd.read() is not None:
            n += 1
        assert n == len(frames)
    finally:
        rd.close()


@pytest.mark.parametrize("width", [852, 854, 856, 860, 864])
def test_nonaligned_widths_deterministic_and_cv2_exact(tmp_path, width):
    """Regression for the swscale width-alignment hazards (measured on the
    system build): unscaled yuv420p->bgr24 leaves the last 4-6 pixels of
    every row UNWRITTEN at w=852/854 (uninitialized-buffer garbage showed
    through as nondeterministic edge pixels) and writes up to 24 bytes PAST
    the buffer end at w=856/860 (heap overrun on exact-size numpy buffers).
    avpump now converts at pad16 width into a scratch (avpump.cpp
    pad16_width).  Each width class must be: (a) byte-exact vs cv2,
    (b) read-path deterministic (two readers + seek agree), (c) gray-crop
    exact on a right-edge crop."""
    import cv2 as _cv2

    rng = np.random.default_rng(width)
    H = 64
    frames = rng.integers(0, 255, (40, H, width, 3), np.uint8)
    frames[:, 20:40, 20:40] = 15
    p = tmp_path / f"w{width}.mp4"
    if not native_av.write_test_video(p, frames, fps=25.0):
        pytest.skip("no libx264 on this host")

    # (a) byte-exact vs cv2 on every frame
    rd = native_av.AVReader.open(p)
    cap = _cv2.VideoCapture(str(p))
    n = 0
    first = None
    while True:
        ours = rd.read()
        ok, ref = cap.read()
        assert (ours is None) == (not ok)
        if ours is None:
            break
        if first is None:
            first = ours.copy()
        assert np.array_equal(ours, ref), f"frame {n} differs from cv2"
        n += 1
    cap.release()

    # (b) determinism: fresh reader + seek both reproduce frame 0/20
    rd2 = native_av.AVReader.open(p)
    again = rd2.read()
    assert np.array_equal(first, again)
    if rd.seek(20) and rd2.seek(20):
        a, b = rd.read(), rd2.read()
        assert a is not None and np.array_equal(a, b)
    rd.close()
    rd2.close()

    # (c) gray-crop touching the right edge equals the host conversion
    crop = ((width - 48, 8), (width, 56))
    assert native_av.probe_gray_crop_parity(p, crop)


def test_vfr_fixture_roundtrip(tmp_path):
    """swt_av_write_test_pts (r5): a genuinely variable-frame-rate MP4 must
    (a) decode every frame in order through BOTH backends, (b) report an
    AVERAGE fps equal to n_frames / span (the only rate a VFR container
    has; the reference's CAP_PROP_FPS sees the same), and (c) round-trip
    the pixel content like the CFR writer does."""
    import cv2

    video = make_video(seed=9, n_frames=30, n_entering=1)
    rng = np.random.default_rng(5)
    durs = rng.uniform(1.0 / 40, 1.0 / 22, 30)
    pts = np.concatenate([[0.0], np.cumsum(durs[:-1])])
    p = tmp_path / "vfr.mp4"
    if not native_av.write_test_video_vfr(p, video.frames, pts):
        pytest.skip("no H.264 encoder on this host")

    rd = native_av.AVReader.open(p)
    assert rd is not None
    assert rd.n_frames == 30
    # average rate: container duration spans pts[-1] + last duration
    expect_fps = 30 / (pts[-1] + durs[-1])
    assert abs(rd.fps - expect_fps) / expect_fps < 0.02, (rd.fps, expect_fps)

    cap = cv2.VideoCapture(str(p))
    n_av = n_cv = 0
    while True:
        f_av = rd.read()
        ok, f_cv = cap.read()
        assert (f_av is None) == (not ok)
        if f_av is None:
            break
        # both FFmpeg builds must surface identical decoded pixels
        assert np.array_equal(f_av, f_cv)
        n_av += 1
        n_cv += 1
    cap.release()
    rd.close()
    assert n_av == 30


def test_vfr_writer_rejects_bad_pts(tmp_path):
    video = make_video(seed=9, n_frames=5, n_entering=0)
    with pytest.raises(ValueError):
        native_av.write_test_video_vfr(
            tmp_path / "bad.mp4", video.frames, [0.0, 0.1, 0.1, 0.2, 0.3]
        )
    with pytest.raises(ValueError):
        native_av.write_test_video_vfr(
            tmp_path / "bad2.mp4", video.frames, [0.0, 0.1, 0.2]
        )
