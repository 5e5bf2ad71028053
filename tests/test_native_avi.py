"""Native MJPEG/AVI container parser vs the cv2 decode path.

The native backend (native/framepump.cpp swt_avi_*) must reproduce
cv2.VideoCapture's sequential semantics on MJPG AVIs: same metadata, same
frame count, count-parity e2e, and the same error accounting on a
truncated file (VERDICT r1 item 5; reference semantics io_video.py:142-163).
"""

import cv2
import numpy as np
import pytest

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io import native
from swiftwatcher_tpu.io.readers import VideoFileSource
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.pipeline.runner import run_video

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native frame pump unavailable"
)


def _write_mjpg(path, frames, fps=30.0):
    h, w = frames.shape[1:3]
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    if not wr.isOpened():
        pytest.skip("cv2 build lacks an MJPG encoder")
    for f in frames:
        wr.write(f)
    wr.release()


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    video = make_video(seed=0, n_frames=63, n_entering=2, n_crossing=1, n_vanishing=1)
    path = tmp_path_factory.mktemp("avi") / "clip.avi"
    _write_mjpg(path, video.frames, video.fps)
    return path, video


def test_backend_selection_and_metadata(clip):
    path, video = clip
    src_n = VideoFileSource(path, backend="native")
    src_c = VideoFileSource(path, backend="cv2")
    assert src_n.backend == "native" and src_c.backend == "cv2"
    assert src_n.total_frames == src_c.total_frames == 63
    assert src_n.fps == pytest.approx(src_c.fps) == 30.0
    # auto prefers native on MJPG AVIs
    assert VideoFileSource(path).backend == "native"


def test_frames_match_cv2_decode(clip):
    path, _ = clip
    src_n = VideoFileSource(path, backend="native")
    src_c = VideoFileSource(path, backend="cv2")
    for i in range(63):
        fn, _, _ = src_n.get_frame()
        fc, _, _ = src_c.get_frame()
        assert fn.shape == fc.shape
        d = np.abs(fn.astype(int) - fc.astype(int))
        # decoder-FAMILY difference, not a defect: cv2.VideoCapture routes
        # MJPEG through FFmpeg (simpleidct + its chroma upsampler) while the
        # native pump uses libjpeg (islow) — ~1% of pixels near chroma edges
        # differ by up to ~16 counts, which is recompression-level noise;
        # the binding contract is e2e COUNT parity (next test)
        assert d.max() <= 32 and (d <= 2).mean() > 0.98, f"frame {i}"
    assert src_n.read_errors == src_c.read_errors == 0


def test_e2e_count_parity(clip):
    path, video = clip
    r_n = run_video(VideoFileSource(path, backend="native"), video.corners, DEFAULT_CONFIG)
    r_c = run_video(VideoFileSource(path, backend="cv2"), video.corners, DEFAULT_CONFIG)
    assert r_n.total_predicted == r_c.total_predicted
    assert r_n.total_rejected == r_c.total_rejected
    assert r_n.frames_processed == r_c.frames_processed


def test_truncated_file_read_errors_parity(clip, tmp_path):
    path, video = clip
    data = path.read_bytes()
    cut = tmp_path / "cut.avi"
    cut.write_bytes(data[: int(len(data) * 0.6)])  # chop off the tail

    def drain(src):
        frames = 0
        while src.next_frame_number <= src.end_frame:
            f, num, _ = src.get_frame()
            if num < 0:
                break
            frames += 1
        return frames, src.read_errors

    fn_, en = drain(VideoFileSource(cut, backend="native"))
    fc_, ec = drain(VideoFileSource(cut, backend="cv2"))
    # both backends must substitute the last good frame for every
    # unreadable index and account identically
    assert fn_ == fc_
    assert en == ec > 0


def test_non_mjpg_falls_back_to_cv2(tmp_path):
    video = make_video(seed=1, n_frames=10, n_entering=0, n_crossing=0)
    path = tmp_path / "clip_ffv1.avi"
    h, w = video.frames.shape[1:3]
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"FFV1"), 30.0, (w, h))
    if not wr.isOpened():
        pytest.skip("cv2 build lacks an FFV1 encoder")
    for f in video.frames:
        wr.write(f)
    wr.release()
    src = VideoFileSource(path)
    # never the MJPG parser; the generic backends (parity-probed libav, or
    # reference-exact cv2) own every non-MJPG container
    assert src.backend in ("av", "cv2")
    f, num, _ = src.get_frame()
    assert num == 0 and f is not None and f.shape == (h, w, 3)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF",
        b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 16,          # not AVI
        b"RIFF\xff\xff\xff\xffAVI " + b"\x00" * 8,            # absurd size
        b"RIFF\x20\x00\x00\x00AVI LIST\xff\xff\xff\xffhdrl",  # huge list
        b"not a riff file at all, just text " * 4,
    ],
)
def test_malformed_containers_fail_open_cleanly(tmp_path, payload):
    p = tmp_path / "bad.avi"
    p.write_bytes(payload)
    assert native.AVIReader.open(p) is None


def test_random_bytes_never_crash_open(tmp_path, rng):
    for i in range(20):
        p = tmp_path / f"fuzz{i}.avi"
        body = rng.integers(0, 256, int(rng.integers(8, 4096)), dtype=np.uint8)
        payload = body.tobytes()
        if i % 3 == 0:  # valid magic, garbage body — exercises the walker
            payload = b"RIFF" + payload[:4] + b"AVI " + payload
        p.write_bytes(payload)
        r = native.AVIReader.open(p)
        if r is not None:  # if the fuzz happened to parse, reads must not crash
            r.read()
            r.close()


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return tag + len(payload).to_bytes(4, "little") + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def _write_audio_first_mjpg(path, frames, fps=30.0):
    """Hand-built AVI with an AUDIO strl BEFORE the video strl, so video
    data chunks are '01dc' — the layout muxers emit for camera files with
    sound.  (cv2.VideoWriter only writes video-only AVIs.)"""
    import struct

    h, w = frames.shape[1:3]
    jpegs = [
        cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, 95])[1].tobytes()
        for f in frames
    ]
    avih = struct.pack(
        "<10I", int(1e6 / fps), 0, 0, 0, len(jpegs), 0, 2, 0, w, h
    ) + b"\x00" * 16
    strh_auds = struct.pack("<4s4s6I", b"auds", b"\x00" * 4, 0, 0, 0, 1, 8000, 0) + b"\x00" * 28
    strf_auds = b"\x00" * 16
    strl_auds = _list(b"strl", _chunk(b"strh", strh_auds) + _chunk(b"strf", strf_auds))
    strh_vids = struct.pack(
        "<4s4s6I", b"vids", b"MJPG", 0, 0, 0, 100, int(fps * 100), 0
    ) + b"\x00" * 28
    strf_vids = struct.pack("<IiiHH4s", 40, w, h, 1, 24, b"MJPG") + b"\x00" * 20
    strl_vids = _list(b"strl", _chunk(b"strh", strh_vids) + _chunk(b"strf", strf_vids))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl_auds + strl_vids)
    movi = _list(b"movi", b"".join(_chunk(b"01dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    path.write_bytes(b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body)


def test_audio_first_stream_index(tmp_path):
    """Video at stream 01 (audio strl listed first) must still parse: the
    chunk id follows the vids strl's index, not a hardcoded '00'."""
    video = make_video(seed=5, n_frames=8, H=48, W=64, n_entering=0, n_crossing=0)
    p = tmp_path / "audio_first.avi"
    _write_audio_first_mjpg(p, video.frames, video.fps)
    r = native.AVIReader.open(p)
    assert r is not None, "audio-first MJPG AVI rejected by the native parser"
    assert r.n_frames == 8
    assert abs(r.fps - video.fps) < 1e-6
    got = 0
    while True:
        f = r.read()
        if f is None:
            break
        ref = cv2.imdecode(
            cv2.imencode(".jpg", video.frames[got], [cv2.IMWRITE_JPEG_QUALITY, 95])[1],
            cv2.IMREAD_COLOR,
        )
        assert f.shape == ref.shape
        got += 1
    r.close()
    assert got == 8
