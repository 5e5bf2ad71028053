"""ctypes bindings for the libav-backed container decoder (native/avpump.cpp).

Separate shared library from framepump's: it links the system FFmpeg
libraries (libavformat/libavcodec/libswscale), which a deploy host may not
have — keeping it in its own .so means framepump's jpeg/codec entry points
stay available even when libav is absent.  All failure modes degrade to the
cv2 backend via is_available()/AVReader.open() returning None.

Engagement is parity-gated by the caller (io/readers.py probes the first
frames for byte equality against cv2): decode itself is conformance-exact
for H.264/MPEG-4, but cv2 wheels bundle their own FFmpeg whose swscale
YUV->BGR rounding could in principle differ from the system build's.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "avpump.cpp"
_CACHE = Path(
    os.environ.get("SWTPU_NATIVE_CACHE", os.path.expanduser("~/.cache/swiftwatcher_tpu"))
)
_LIB_PATH = _CACHE / "libavpump.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    _CACHE.mkdir(parents=True, exist_ok=True)
    tmp = _LIB_PATH.parent / f"{_LIB_PATH.name}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(tmp),
        "-lavformat", "-lavcodec", "-lswscale", "-lavutil",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = _LIB_PATH.exists() and (
            _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
        )
        if not _LIB_PATH.exists() or stale:
            if not _SRC.exists() or not _build():
                # keep a functional stale build if the rebuild toolchain is
                # gone (same policy as io/native.py)
                if not (stale and _LIB_PATH.exists()):
                    return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            # dlopen fails when the host lacks the FFmpeg shared libraries
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.swt_av_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.swt_av_open.restype = ctypes.c_void_p
        lib.swt_av_read_bgr.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.swt_av_read_bgr.restype = ctypes.c_int
        lib.swt_av_close.argtypes = [ctypes.c_void_p]
        sk = getattr(lib, "swt_av_seek", None)
        if sk is not None:  # optional: stale cached builds may predate it
            sk.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            sk.restype = ctypes.c_int
        kf = getattr(lib, "swt_av_keyframes", None)
        if kf is not None:
            kf.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ]
            kf.restype = ctypes.c_int
        gc = getattr(lib, "swt_av_read_gray_crop", None)
        if gc is not None:
            gc.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, u8p,
            ]
            gc.restype = ctypes.c_int
        rn = getattr(lib, "swt_av_read_null", None)
        if rn is not None:  # optional: stale cached builds may predate it
            rn.argtypes = [ctypes.c_void_p]
            rn.restype = ctypes.c_int
        wt = getattr(lib, "swt_av_write_test", None)
        if wt is not None:  # optional: stale cached builds may predate it
            wt.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_char_p,
            ]
            wt.restype = ctypes.c_int
        wp = getattr(lib, "swt_av_write_test_pts", None)
        if wp is not None:  # optional: stale cached builds may predate it
            wp.argtypes = [
                ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_char_p,
            ]
            wp.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class AVReader:
    """Sequential libav decoder for general containers (H.264/MPEG-4 MP4...).

    Replaces cv2.VideoCapture's decode loop (io_video.py:142-163) with the
    system FFmpeg using in-process frame threading.  read() returns the next
    (H, W, 3) uint8 BGR frame, None at end-of-stream or on a decode error
    (stream advances either way, like a failed cv2 retrieve)."""

    def __init__(self, lib, handle, n_frames, fps, width, height):
        self._lib = lib
        self._handle = handle
        self.n_frames = n_frames
        self.fps = fps
        self.width = width
        self.height = height
        # serializes reads/seeks against close(): the prefetcher thread may
        # still be mid-read when the owner closes the source — freeing the
        # native handle under a running swt_av_* call is a segfault
        self._rw_lock = threading.Lock()

    @classmethod
    def open(cls, path, n_threads: int = 0) -> Optional["AVReader"]:
        lib = _load()
        if lib is None:
            return None
        n = ctypes.c_int(0)
        fps = ctypes.c_double(0.0)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        handle = lib.swt_av_open(
            str(path).encode(), ctypes.byref(n), ctypes.byref(fps),
            ctypes.byref(w), ctypes.byref(h), n_threads,
        )
        if not handle:
            return None
        return cls(lib, handle, n.value, fps.value, w.value, h.value)

    def read_null(self) -> bool:
        """Decode the next frame and discard it (no conversion, no copy).

        Profiling-only: a read_null loop's rate is the libavcodec decode
        floor for this stream on this host — what remains of the ingest
        budget after all conversion/copy tuning (tools/decode_floor.py).
        Returns False at end-of-stream/error.  Requires a lib built with
        swt_av_read_null (stale cached builds fall back to False)."""
        fn = getattr(self._lib, "swt_av_read_null", None)
        if fn is None:
            return False
        with self._rw_lock:
            if not self._handle:
                return False
            return fn(self._handle) == 0

    def read(self) -> Optional[np.ndarray]:
        out = np.empty(self.height * self.width * 3, np.uint8)
        h = ctypes.c_int(0)
        w = ctypes.c_int(0)
        with self._rw_lock:
            if not self._handle:
                return None
            rc = self._lib.swt_av_read_bgr(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                self.height, self.width, ctypes.byref(h), ctypes.byref(w),
            )
        if rc != 0:
            return None
        return out[: h.value * w.value * 3].reshape(h.value, w.value, 3)

    def keyframes(self) -> Optional[np.ndarray]:
        """Frame indices of the container's keyframes (int64, ascending),
        read from the container index with no decode — None when the
        library predates the symbol or the format exposes no usable index.
        Feeds keyframe-aligned chunking in io/parallel_decode.py so worker
        seeks land exactly on chunk starts."""
        if getattr(self._lib, "swt_av_keyframes", None) is None:
            return None
        cap = max(int(self.n_frames or 0), 1) + 1
        out = np.empty((cap,), np.int64)
        with self._rw_lock:
            if not self._handle:
                return None
            n = self._lib.swt_av_keyframes(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cap,
            )
        return out[:n].copy() if n > 0 else None

    def seek(self, frame_number: int) -> bool:
        """Position so the next read returns `frame_number` (keyframe seek +
        decode-forward, byte-identical to sequential decode).  False when
        the library predates seek, the stream's timestamps are unusable, or
        the target is at/past end of stream."""
        if getattr(self._lib, "swt_av_seek", None) is None:
            return False
        with self._rw_lock:
            if not self._handle:
                return False
            return self._lib.swt_av_seek(self._handle, int(frame_number)) == 0

    def read_gray_crop(self, crop_region) -> Optional[np.ndarray]:
        """Next frame as the (y2-y1, x2-x1) uint8 grayscale chimney crop,
        converting only the crop's rows (no full-frame BGR); None at end of
        stream or on decode error.  Callers must have verified bit-equality
        with the BGR path via probe_gray_crop_parity for this geometry."""
        if getattr(self._lib, "swt_av_read_gray_crop", None) is None:
            return None
        (x1, y1), (x2, y2) = crop_region
        out = np.empty((y2 - y1, x2 - x1), np.uint8)
        with self._rw_lock:
            if not self._handle:
                return None
            rc = self._lib.swt_av_read_gray_crop(
                self._handle, y1, y2, x1, x2,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        return out if rc == 0 else None

    def close(self) -> None:
        with self._rw_lock:
            if self._handle:
                self._lib.swt_av_close(self._handle)
                self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_test_video(path, frames: np.ndarray, fps: float = 25.0,
                     codec: str = "libx264") -> bool:
    """Encode (N, H, W, 3) uint8 BGR frames into an MP4 via a SYSTEM
    encoder.  Test-fixture generator: the cv2 wheel's bundled FFmpeg ships
    no H.264 encoder, so H.264 parity tests fabricate their streams here."""
    lib = _load()
    if lib is None or getattr(lib, "swt_av_write_test", None) is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    rc = lib.swt_av_write_test(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, float(fps), codec.encode(),
    )
    return rc == 0


def write_test_video_vfr(path, frames: np.ndarray, pts_seconds,
                         timebase_den: int = 90000,
                         codec: str = "libx264") -> bool:
    """Encode (N, H, W, 3) uint8 BGR frames into a genuinely VARIABLE
    frame-rate MP4: pts_seconds gives each frame's presentation time.

    Real chimney captures are VFR-prone (auto-exposure cameras stretch and
    drop frames); the reference timestamps frames as index / CAP_PROP_FPS
    (io_video.py:137-165), which for VFR streams is only the container's
    AVERAGE rate.  This fabricates such streams for the accuracy corpus
    and reader tests — no CFR re-timing tool exists on this rig."""
    lib = _load()
    if lib is None or getattr(lib, "swt_av_write_test_pts", None) is None:
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, _ = frames.shape
    pts = np.asarray(
        np.round(np.asarray(pts_seconds, np.float64) * timebase_den), np.int64
    )
    if len(pts) != n or (np.diff(pts) <= 0).any():
        raise ValueError("pts_seconds must give one strictly-ascending "
                         "stamp per frame")
    rc = lib.swt_av_write_test_pts(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, int(timebase_den),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        codec.encode(),
    )
    return rc == 0


def probe_native_seek(path, n_probe: int = 12, seek_at: int = 8) -> bool:
    """True when AVReader.seek reproduces sequential decode byte-for-byte
    on this file.  Same two probe families as parallel_decode's
    probe_seek_accuracy: head (seek-vs-sequential truth) and, via origin
    consistency, a deep leg at 50%/90% of the stream."""
    rd = AVReader.open(path)
    if rd is None:
        return False
    try:
        seq = [rd.read() for _ in range(n_probe)]
        if seq[0] is None or seek_at >= n_probe or seq[seek_at] is None:
            return False
        for pos in {seek_at, max(seek_at // 2, 1)}:
            if not rd.seek(pos):
                return False
            got = rd.read()
            if got is None or not np.array_equal(seq[pos], got):
                return False
        total = rd.n_frames
        if total and total > 4 * n_probe:
            back = 7
            for frac in (0.5, 0.9):
                tgt = min(int(total * frac), total - 1)
                if not rd.seek(tgt):
                    return False
                direct = rd.read()
                if direct is None or not rd.seek(tgt - back):
                    return False
                stepped = None
                for _ in range(back + 1):
                    stepped = rd.read()
                    if stepped is None:
                        return False
                if not np.array_equal(direct, stepped):
                    return False
        return True
    finally:
        rd.close()


def probe_gray_crop_parity(path, crop_region, n_probe: int = 2) -> bool:
    """True when read_gray_crop equals gray(read BGR)[crop] byte-for-byte on
    the first frames (swscale's slice conversion must match the full-frame
    converter on the crop's rows — true for its unscaled planar paths, but
    proven per file/geometry before the fast path engages)."""
    rd_a = AVReader.open(path)
    rd_b = AVReader.open(path)
    if rd_a is None or rd_b is None:
        for r in (rd_a, rd_b):
            if r is not None:
                r.close()
        return False
    try:
        from .native import gray_crop_batch, is_available as _fp_ok
        from ..ops.color import bgr_to_gray_host

        (x1, y1), (x2, y2) = crop_region
        for _ in range(n_probe):
            full = rd_a.read()
            fast = rd_b.read_gray_crop(crop_region)
            if full is None or fast is None:
                return False
            if _fp_ok():
                want = gray_crop_batch(full[None], crop_region)[0]
            else:
                want = bgr_to_gray_host(full[None, y1:y2, x1:x2])[0]
            if not np.array_equal(want, fast):
                return False
        return True
    finally:
        rd_a.close()
        rd_b.close()


def probe_bgr_parity(path, n_probe: int = 3) -> Optional["AVReader"]:
    """Open `path` natively and prove byte-exact BGR parity vs cv2 on the
    first `n_probe` frames.  Returns a FRESH AVReader positioned at frame 0
    when parity holds (and fps/frame-count metadata agrees), else None.

    The probe decodes through BOTH FFmpeg builds (system + cv2's bundled
    one); any divergence in decode or YUV->BGR rounding disables the native
    backend for this file, so engagement is always parity-safe — the same
    policy parallel_decode applies to seek accuracy."""
    rd = AVReader.open(path)
    if rd is None:
        return None
    try:
        import cv2

        cap = cv2.VideoCapture(str(path))
        if not cap.isOpened():
            cap.release()
            return None
        try:
            cv_fps = float(cap.get(cv2.CAP_PROP_FPS))
            cv_n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            if cv_n != rd.n_frames or abs(cv_fps - rd.fps) > 1e-6 * max(cv_fps, 1.0):
                return None
            for _ in range(n_probe):
                ok, ref = cap.read()
                mine = rd.read()
                if not ok:
                    # container shorter than the probe: require agreement
                    if mine is not None:
                        return None
                    break
                if mine is None or not np.array_equal(ref, mine):
                    return None
        finally:
            cap.release()
    finally:
        rd.close()
    return AVReader.open(path)
