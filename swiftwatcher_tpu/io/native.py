"""ctypes bindings for the native frame pump (native/framepump.cpp).

Compiles the shared library on first use (g++ is a build-time dependency;
the wheel can also ship a prebuilt .so).  All entry points degrade
gracefully: `is_available()` gates usage, and callers fall back to the
cv2/NumPy paths when the toolchain or libjpeg is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "framepump.cpp"
_CACHE = Path(
    os.environ.get("SWTPU_NATIVE_CACHE", os.path.expanduser("~/.cache/swiftwatcher_tpu"))
)
_LIB_PATH = _CACHE / "libframepump.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    _CACHE.mkdir(parents=True, exist_ok=True)
    # Compile to a per-process temp name and os.replace into place: a
    # concurrent process must never dlopen a half-written .so (it would
    # cache the failure via _tried and silently run the slow fallback).
    tmp = _LIB_PATH.parent / f"{_LIB_PATH.name}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(_SRC), "-o", str(tmp), "-ljpeg", "-lpthread",
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
                # A failed rebuild of a STALE library (e.g. no g++ on a
                # deploy host) should still use the existing, functional
                # build rather than dropping to the slow fallback.
                if not (stale and _LIB_PATH.exists()):
                    return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.swt_gray_crop_batch.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int,
        ]
        lib.swt_decode_jpeg_bgr.argtypes = [
            u8p, ctypes.c_size_t, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.swt_decode_jpeg_bgr.restype = ctypes.c_int
        lib.swt_decode_window_gray.argtypes = [
            u8p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p, u8p, ctypes.c_int,
        ]
        lib.swt_decode_window_gray.restype = ctypes.c_int
        lib.swt_avi_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.swt_avi_open.restype = ctypes.c_void_p
        lib.swt_avi_read_bgr.argtypes = [
            ctypes.c_void_p, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.swt_avi_read_bgr.restype = ctypes.c_int
        lib.swt_avi_close.argtypes = [ctypes.c_void_p]
        # Symbols added after the first release bind OPTIONALLY: a stale
        # cached .so on a host without g++ (the stale-rebuild fallback
        # above) must degrade to the numpy paths, not crash is_available()
        # with an AttributeError (ADVICE r2).
        enc4 = getattr(lib, "swt_encode_delta4", None)
        if enc4 is not None:
            enc4.argtypes = [
                u8p, ctypes.c_int64, ctypes.c_int64, u8p,
                ctypes.POINTER(ctypes.c_int32), u8p,
                ctypes.c_int64, ctypes.c_int,
            ]
            enc4.restype = ctypes.c_int64
        enc6 = getattr(lib, "swt_encode_delta6", None)
        if enc6 is not None:
            i64 = ctypes.c_int64
            enc6.argtypes = [
                u8p, i64, i64, ctypes.c_int, u8p, u8p, u8p, u8p, i64,
                ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_int32), u8p,
                i64, ctypes.POINTER(i64), ctypes.c_int,
            ]
            enc6.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def has_symbol(name: str) -> bool:
    """True when the loaded library exports `name` (stale cached builds may
    predate newer entry points; callers fall back to numpy)."""
    lib = _load()
    return lib is not None and getattr(lib, name, None) is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def gray_crop_batch(
    frames: np.ndarray, crop_region, n_threads: int = 4
) -> np.ndarray:
    """(N, H, W, 3) uint8 BGR -> (N, y2-y1, x2-x1) uint8 grayscale crops,
    bit-exact with cv2.cvtColor + slicing, off the GIL."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames)
    n, H, W, _ = frames.shape
    (x1, y1), (x2, y2) = crop_region
    out = np.empty((n, y2 - y1, x2 - x1), np.uint8)
    lib.swt_gray_crop_batch(
        _u8ptr(frames), n, H, W, y1, y2, x1, x2, _u8ptr(out), n_threads
    )
    return out


def decode_jpeg_bgr(data: bytes, max_h: int = 4320, max_w: int = 7680) -> Optional[np.ndarray]:
    """JPEG bytes -> (H, W, 3) uint8 BGR, or None on decode failure."""
    lib = _load()
    assert lib is not None
    buf = np.frombuffer(data, np.uint8)
    # C writes scanlines contiguously at the DECODED width's stride, so use a
    # flat buffer and reshape by the actual (h, w) afterwards.
    out = np.empty(max_h * max_w * 3, np.uint8)
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    rc = lib.swt_decode_jpeg_bgr(
        _u8ptr(buf), buf.size, _u8ptr(out), max_h, max_w,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    n = h.value * w.value * 3
    return out[:n].reshape(h.value, w.value, 3).copy()


class AVIReader:
    """Sequential MJPEG-in-AVI decoder over the native container parser.

    First-party replacement for cv2.VideoCapture on the reference's own
    capture format (io_video.py:142-163).  Use AVIReader.open(): it returns
    None for anything that is not an MJPG AVI (or when the native library
    is unavailable), and the caller falls back to cv2."""

    def __init__(self, lib, handle, n_frames, fps, width, height):
        self._lib = lib
        self._handle = handle
        self.n_frames = n_frames
        self.fps = fps
        self.width = width
        self.height = height
        # serializes read() against close(): freeing the native handle
        # under a prefetcher thread's running read is a segfault
        self._rw_lock = threading.Lock()

    @classmethod
    def open(cls, path) -> Optional["AVIReader"]:
        lib = _load()
        if lib is None:
            return None
        n = ctypes.c_int(0)
        fps = ctypes.c_double(0.0)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        handle = lib.swt_avi_open(
            str(path).encode(), ctypes.byref(n), ctypes.byref(fps),
            ctypes.byref(w), ctypes.byref(h),
        )
        if not handle:
            return None
        return cls(lib, handle, n.value, fps.value, w.value, h.value)

    def read(self) -> Optional[np.ndarray]:
        """Next frame as (H, W, 3) uint8 BGR; None on decode error (stream
        advances, like a failed cv2 retrieve) or at end of stream."""
        max_h = self.height or 4320
        max_w = self.width or 7680
        out = np.empty(max_h * max_w * 3, np.uint8)
        h = ctypes.c_int(0)
        w = ctypes.c_int(0)
        with self._rw_lock:
            if not self._handle:
                return None
            rc = self._lib.swt_avi_read_bgr(
                self._handle, _u8ptr(out), max_h, max_w,
                ctypes.byref(h), ctypes.byref(w),
            )
        if rc != 0:
            return None
        return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()

    def close(self) -> None:
        with self._rw_lock:
            if self._handle:
                self._lib.swt_avi_close(self._handle)
                self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encode_delta6(
    gray2d: np.ndarray,
    escape_cap: int,
    mode: int = -1,
    n_threads: int = 4,
):
    """Threaded C twin of io/wirecodec.py:encode_delta6 (bit-identical).

    gray2d: (N, P) uint8 contiguous flattened frames.  mode: -1 = pick the
    cheaper predictor, 0 = batch mean, 1 = previous frame.  Returns
    (mode, bg, lvl1, lvl2, esc_idx, esc_val) with lvl2 sliced to its exact
    (>=1 byte) size, or None on level-3 escape overflow."""
    lib = _load()
    assert lib is not None and has_symbol("swt_encode_delta6")
    N, P = gray2d.shape
    pp3 = (P + 2) // 3
    mode_out = np.zeros(1, np.uint8)
    bg = np.empty(P, np.uint8)
    lvl1 = np.empty((N, pp3), np.uint8)
    lvl2_cap = (N * P + 1) // 2 + 1      # worst case: every pixel escapes
    lvl2 = np.zeros(lvl2_cap, np.uint8)
    n1 = ctypes.c_int64(0)
    n3 = ctypes.c_int64(0)
    esc_idx = np.empty(escape_cap, np.int32)
    esc_val = np.empty(escape_cap, np.uint8)
    rc = lib.swt_encode_delta6(
        _u8ptr(gray2d), N, P, mode, _u8ptr(mode_out), _u8ptr(bg),
        _u8ptr(lvl1), _u8ptr(lvl2), lvl2_cap, ctypes.byref(n1),
        esc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(esc_val), escape_cap, ctypes.byref(n3), n_threads,
    )
    if rc != 0:
        return None
    s2 = max((n1.value + 1) // 2, 1)
    return mode_out[0], bg, lvl1, lvl2[:s2], esc_idx, esc_val


def encode_delta4(gray2d: np.ndarray, escape_cap: int, n_threads: int = 4):
    """Threaded C twin of io/wirecodec.py's numpy encoder (bit-identical).

    gray2d: (N, P) uint8 contiguous flattened frames.  Returns
    (packed, esc_idx, esc_val) or None on escape overflow."""
    lib = _load()
    assert lib is not None and has_symbol("swt_encode_delta4")
    N, P = gray2d.shape
    m = (N - 1) * P
    packed = np.empty((m + 1) // 2, np.uint8)
    esc_idx = np.empty(escape_cap, np.int32)
    esc_val = np.empty(escape_cap, np.uint8)
    rc = lib.swt_encode_delta4(
        _u8ptr(gray2d), N, P, _u8ptr(packed),
        esc_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8ptr(esc_val), escape_cap, n_threads,
    )
    if rc < 0:
        return None
    return packed, esc_idx, esc_val


def decode_window_gray(
    encoded_frames, H: int, W: int, crop_region, n_threads: int = 4
) -> tuple[np.ndarray, int]:
    """Decode a window of JPEG buffers straight to cropped grayscale.

    encoded_frames: sequence of bytes-like JPEG payloads of (H, W) frames.
    Returns ((N, ch, cw) uint8, ok (N,) bool); failed frames are zeroed and
    flagged so the caller can apply the reference's last-good-frame
    substitution (io_video.py:51-53)."""
    lib = _load()
    assert lib is not None
    # single join, no per-element bytes() copy (payloads are bytes already)
    bufs = np.frombuffer(
        b"".join(e if isinstance(e, bytes) else bytes(e) for e in encoded_frames),
        np.uint8,
    )
    offsets = np.zeros(len(encoded_frames) + 1, np.int64)
    np.cumsum([len(e) for e in encoded_frames], out=offsets[1:])
    (x1, y1), (x2, y2) = crop_region
    out = np.empty((len(encoded_frames), y2 - y1, x2 - x1), np.uint8)
    ok = np.zeros((len(encoded_frames),), np.uint8)
    lib.swt_decode_window_gray(
        _u8ptr(bufs), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(encoded_frames), H, W, y1, y2, x1, x2, _u8ptr(out), _u8ptr(ok),
        n_threads,
    )
    return out, ok.astype(bool)
