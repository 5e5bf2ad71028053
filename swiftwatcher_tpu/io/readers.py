"""Frame sources with the reference's exact I/O semantics.

Replicates FrameReader and subclasses (io_video.py:11-165):
  * bounds check is INCLUSIVE of end_frame (io_video.py:40), so the frame at
    index end_frame is requested even when the container holds end_frame
    frames — the resulting decode failure substitutes the last good frame and
    bumps read_errors (io_video.py:51-53), exactly one duplicated tail frame
  * out-of-range requests yield a zeroed "null" frame with frame_number -1
    and the string timestamp "00:00:00.000" (io_video.py:40-44); these flow
    through the whole pipeline but are excluded from progress counting
  * VideoFileSource is strictly sequential (retrieve-then-grab) and ignores
    --start (io_video.py:146,155-165); only HDF5Source honors it
  * timestamps assume constant fps (io_video.py:74-82)

`get_window` returns a stacked uint8 batch ready for device_put, instead of
the reference's Python list of frames.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .export import frame_timestamp

NULL_TIMESTAMP = "00:00:00.000"


class FrameSource:
    """Base frame source; subclasses implement read_frame()."""

    #: whether read_frame honors arbitrary frame_number (random access);
    #: sequential sources (cv2.VideoCapture) cannot resume from checkpoints
    supports_seek = True

    def __init__(self):
        self.fps = 0.0
        self.start_frame = 0
        self.end_frame = 0
        self.total_frames = 0
        self.next_frame_number = 0
        self.frame_shape = (0, 0, 0)
        self.last_read_frame: Optional[np.ndarray] = None
        self.frames_read = 0
        self.read_errors = 0
        self.filepath: Optional[Path] = None

    def read_frame(self, frame_number: int, increment: bool = True):
        raise NotImplementedError

    def get_frame(self, frame_number: Optional[int] = None):
        """(frame, frame_number, timestamp) with error fallback
        (io_video.py:33-59)."""
        if frame_number is None:
            frame_number = self.next_frame_number

        if not self.start_frame <= frame_number <= self.end_frame:
            frame = np.zeros(self.frame_shape, np.uint8)
            return frame, -1, NULL_TIMESTAMP

        frame = self.read_frame(frame_number)
        timestamp = frame_timestamp(frame_number, self.fps)
        if frame is None:
            frame = self.last_read_frame
            self.read_errors += 1
        else:
            self.frame_shape = frame.shape
            self.last_read_frame = frame
            self.frames_read += 1
        return frame, frame_number, timestamp

    def get_window(self, n: int) -> Tuple[List[np.ndarray], List[int], List[object]]:
        """n consecutive frames as a LIST (no copies) + numbers + timestamps
        (io_video.py:61-72).  Null frames are zero images.

        Returning references instead of a stacked array matters: stacking
        full 1080p frames costs ~130 MB of memcpy per window — an order of
        magnitude more than the crops the device actually consumes."""
        frames, numbers, stamps = [], [], []
        for _ in range(n):
            f, num, ts = self.get_frame()
            frames.append(f)
            numbers.append(num)
            stamps.append(ts)
        # Null frames before any successful read have shape (0,0,0), and a
        # read ERROR before any successful read yields None (get_frame's
        # substitute, self.last_read_frame, is still unset — routine after a
        # checkpoint resume, which does not restore last_read_frame).
        # Broadcast both to a known frame shape (first real frame in the
        # window, else the source's recorded shape) so one early corrupt
        # frame degrades to a zero frame instead of killing the run.
        def _real(f):
            return f is not None and f.size

        shape = next((f.shape for f in frames if _real(f)), None)
        if shape is None and self.frame_shape != (0, 0, 0):
            shape = self.frame_shape
        if shape is not None:
            frames = [f if _real(f) else np.zeros(shape, np.uint8) for f in frames]
        elif any(f is None for f in frames):
            # fresh source whose first reads ALL fail: there is no geometry
            # to substitute — fail loudly here rather than as a TypeError in
            # the prefetcher's np.stack (ADVICE r2)
            raise RuntimeError(
                "every read in the first window failed before any frame "
                "established the source's geometry "
                f"({self.filepath or type(self).__name__}); the file is "
                "unreadable or the decoder is misconfigured"
            )
        return frames, numbers, stamps


class ArraySource(FrameSource):
    """In-memory (N, H, W, 3) uint8 source (tests, benches, synthetic video).

    Mirrors HDF5Source's start/end semantics, including the inclusive
    end_frame quirk (a read at index N substitutes the last frame)."""

    def __init__(self, frames: np.ndarray, fps: float = 30.0, start: int = 0, end: int = 0):
        super().__init__()
        self._frames = np.asarray(frames, np.uint8)
        self.fps = float(fps)
        self.start_frame = start
        self.end_frame = end if end > 0 else len(self._frames)
        self.next_frame_number = self.start_frame
        self.total_frames = self.end_frame - self.start_frame
        self.filepath = Path("synthetic.mem")

    def read_frame(self, frame_number: int, increment: bool = True):
        frame = (
            self._frames[frame_number] if frame_number < len(self._frames) else None
        )
        if increment:
            self.next_frame_number += 1
        return frame


class HDF5Source(FrameSource):
    """HDF5 container of per-frame encoded images (io_video.py:85-131).

    Dataset "VideoFrames"; fps/frame count from CAP_PROP_* attrs on the file
    or dataset; frames decoded with cv2.imdecode."""

    def __init__(self, filepath, start: int = 0, end: int = 0):
        super().__init__()
        import h5py

        self.filepath = Path(filepath)
        self._file = h5py.File(str(filepath), "r")
        self._dset = self._file["VideoFrames"]
        attrs = self._file.attrs if len(self._file.attrs) > 0 else self._dset.attrs
        if attrs.get("CAP_PROP_FPS") is None or attrs.get("CAP_PROP_FRAME_COUNT") is None:
            raise RuntimeError(
                f"{filepath}: HDF5 file/dataset must carry CAP_PROP_FPS and "
                "CAP_PROP_FRAME_COUNT attrs (see tools/make_h5_cache.py)"
            )
        self.fps = float(attrs.get("CAP_PROP_FPS"))
        self.start_frame = start
        self.end_frame = end if end > 0 else int(attrs.get("CAP_PROP_FRAME_COUNT"))
        self.next_frame_number = self.start_frame
        self.total_frames = self.end_frame - self.start_frame

    def read_frame(self, frame_number: int, increment: bool = True):
        import cv2

        try:
            encoded = self._dset[frame_number]
            if np.asarray(encoded).size == 0:
                # an unwritten vlen slot reads back zero-length without
                # raising; cv2 5.0's imdecode would raise on it
                raise ValueError("empty encoded slot")
            frame = cv2.imdecode(encoded, cv2.IMREAD_COLOR)
        except (ValueError, IndexError, cv2.error):
            # old h5py raised ValueError (which the reference catches at
            # io_video.py:123); modern h5py raises IndexError; a corrupt or
            # empty buffer raises cv2.error — same decode-failure fallback
            # semantics for all three
            frame = None
        if increment:
            self.next_frame_number += 1
        return frame

    def peek_encoded(self, frame_number: int):
        """Encoded payload bytes without any reader bookkeeping (None on a
        missing/empty slot) — lets callers sniff the codec up front."""
        try:
            enc = bytes(np.asarray(self._dset[frame_number]))
            return enc or None
        except (ValueError, IndexError):
            return None

    def get_encoded_window(self, n: int):
        """Window of ENCODED frame buffers with FrameReader bookkeeping.

        Mirrors get_frame/get_window semantics one level earlier: the
        inclusive-end duplicate read reuses the last good ENCODED buffer
        (instead of the last decoded frame), nulls are None markers — so a
        downstream native decoder reproduces the reference's error-fallback
        behavior exactly.  Returns (buffers, numbers, timestamps) where a
        buffer is bytes-like or None (null frame)."""
        bufs, numbers, stamps = [], [], []
        for _ in range(n):
            fn = self.next_frame_number
            if not self.start_frame <= fn <= self.end_frame:
                bufs.append(None)
                numbers.append(-1)
                stamps.append(NULL_TIMESTAMP)
                continue
            try:
                enc = bytes(np.asarray(self._dset[fn]))
                if not enc:
                    # unwritten vlen slot: undecodable, must not poison
                    # _last_encoded or count as a successful read
                    raise ValueError("empty encoded slot")
                self._last_encoded = enc
                self.frames_read += 1
            except (ValueError, IndexError):
                enc = getattr(self, "_last_encoded", None)
                if enc is not None:
                    # substitution happens at the encoded level; count the
                    # error here (the substituted decode will succeed)
                    self.read_errors += 1
                # else: no last-good buffer exists — the None buffer fails
                # decode downstream, where the error is counted ONCE (a
                # bump here too would double-count the same failure)
            self.next_frame_number += 1
            bufs.append(enc)
            numbers.append(fn)
            stamps.append(frame_timestamp(fn, self.fps))
        return bufs, numbers, stamps


class VideoFileSource(FrameSource):
    """Container-backed source (io_video.py:134-165).

    Three backends, all behavior-identical to the reference's sequential
    retrieve-then-grab (a failed decode yields None; the base class then
    substitutes the last good frame and bumps read_errors, io_video.py:
    51-53; --start is ignored, io_video.py:146):

      native:   MJPG AVIs through the first-party parser + libjpeg
                (native/framepump.cpp swt_avi_*; no cv2 on that path).
      parallel: seekable containers (H.264/MPEG-4 MP4 etc.) decoded by
                chunk-claiming cv2 workers (io/parallel_decode.py) — the
                high-rate path for the reference's real input format; only
                engages after a probe proves the container's seek is
                frame-accurate, and it upgrades supports_seek (checkpoint
                resume works on such files).
      av:       general containers through the system FFmpeg libraries with
                in-process frame threading (native/avpump.cpp) — covers
                hosts where parallel cannot engage (one core, or seek not
                frame-accurate); only engages after a probe proves
                byte-exact BGR parity against cv2 on this file.
      cv2:      the reference-exact sequential fallback.
    """

    supports_seek = False

    def __init__(
        self,
        filepath,
        end: int = 0,
        backend: str = "auto",
        decode_workers: Optional[int] = None,
    ):
        super().__init__()
        self.filepath = Path(filepath)
        self.backend = "cv2"
        self._avi = None
        self._pdec = None
        self._avrd = None
        self._pos = 0            # frame number held in self._current (av)
        self._gray_crop = None   # crop region once the gray stream engages
        self._gray_current = None
        self._last_good_gray = None
        if backend in ("auto", "native"):
            from . import native

            self._avi = native.AVIReader.open(filepath)
        if self._avi is not None:
            self.backend = "native"
            self.fps = float(self._avi.fps)
            self.start_frame = 0
            self.end_frame = end if end > 0 else self._avi.n_frames
            self._current = self._avi.read()  # prime frame 0
        else:
            if backend == "native":
                raise ValueError(f"{filepath}: not an MJPG AVI (or no native lib)")
            import cv2

            self._cap = cv2.VideoCapture(str(filepath))
            if not self._cap.isOpened():
                # an unopened capture reports fps=0 / count=0 and every
                # frame read fails; surface the bad path NOW instead of
                # "succeeding" with zero frames (and frame_timestamp
                # dividing by fps=0 later)
                raise RuntimeError(
                    f"{filepath}: cv2.VideoCapture could not open the file "
                    "(missing, unreadable, or unsupported container)"
                )
            self.fps = float(self._cap.get(cv2.CAP_PROP_FPS))
            self.start_frame = 0
            self._frame_hw = (
                int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            )
            container_frames = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self.end_frame = end if end > 0 else container_frames
            if decode_workers is None:
                decode_workers = int(
                    os.environ.get("SWTPU_DECODE_WORKERS", os.cpu_count() or 1)
                )
            want_parallel = backend == "parallel" or (
                backend == "auto" and decode_workers > 1
            )
            if want_parallel and container_frames > 0:
                from .parallel_decode import ParallelDecoder, probe_seek_accuracy

                if probe_seek_accuracy(filepath, container_frames):
                    self._cap.release()
                    self._cap = None
                    # keyframe-aligned chunks (from the container index, no
                    # decode cost) stop workers from re-decoding up to a
                    # whole GOP per chunk seek; None -> fixed chunking
                    self._kf_bounds = None
                    from . import native_av

                    _kfrd = native_av.AVReader.open(filepath)
                    if _kfrd is not None:
                        kfs = _kfrd.keyframes()
                        _kfrd.close()
                        if kfs is not None and len(kfs) > 1:
                            self._kf_bounds = [int(k) for k in kfs]
                    self._pdec = ParallelDecoder(
                        filepath, container_frames, n_workers=decode_workers,
                        boundaries=self._kf_bounds,
                    )
                    self._n_workers = decode_workers
                    self.backend = "parallel"
                    self.supports_seek = True
                    self._p_cached = None
                    self._p_cached_fn = -1
                elif backend == "parallel":
                    raise ValueError(
                        f"{filepath}: seek is not frame-accurate on this "
                        "container; parallel decode would corrupt frames"
                    )
            if self.backend == "cv2" and backend in ("auto", "av"):
                from . import native_av

                self._avrd = native_av.probe_bgr_parity(filepath)
                if self._avrd is not None:
                    self._cap.release()
                    self._cap = None
                    self.backend = "av"
                    self._current = self._avrd.read()  # prime frame 0
                    # keyframe-seek + decode-forward is byte-identical to
                    # sequential decode when the probe passes -> checkpoint
                    # resume works on ANY container here, even one-core
                    # hosts where the parallel backend can't engage
                    if native_av.probe_native_seek(filepath):
                        self.supports_seek = True
                elif backend == "av":
                    raise ValueError(
                        f"{filepath}: native libav decode unavailable or "
                        "not byte-exact vs cv2 on this file"
                    )
            if self.backend == "cv2":
                self._cap.grab()  # prime so retrieve() works for frame 0
        self.next_frame_number = self.start_frame
        self.total_frames = self.end_frame - self.start_frame

    def read_frame(self, frame_number: int, increment: bool = True):
        if self.backend in ("native", "av"):
            # after the gray-crop stream engages, the av decoder's cursor
            # belongs to get_gray_crop_window — interleaved full-frame
            # reads would silently skip frames in both streams
            assert not (self.backend == "av" and self._gray_crop is not None), (
                "read_frame after enable_gray_crop_stream: use "
                "get_gray_crop_window"
            )
            if (
                self.backend == "av"
                and frame_number != self._pos
                and self.supports_seek
            ):
                # non-sequential access (checkpoint resume): re-aim via the
                # probed keyframe-seek; a seek at/past end of stream yields
                # None -> the base class's decode-failure substitution
                self._current = (
                    self._avrd.read() if self._avrd.seek(frame_number) else None
                )
                self._pos = frame_number
            frame = self._current
            if increment:
                rd = self._avi if self.backend == "native" else self._avrd
                self._current = rd.read()
                self._pos += 1
                self.next_frame_number += 1
            return frame
        if self.backend == "parallel":
            # once the gray-crop workers engage, the decoder's frames are
            # (ch, cw) gray crops — full-frame reads would hand crops to
            # callers expecting BGR frames
            assert self._gray_crop is None, (
                "read_frame after enable_gray_crop_stream: use "
                "get_gray_crop_window"
            )
            if frame_number == self._p_cached_fn:
                frame = self._p_cached
            else:
                if frame_number != self._p_cached_fn + 1:
                    # non-sequential access (checkpoint resume): re-aim
                    self._pdec.restart(frame_number)
                frame = self._pdec.get(frame_number)
                self._p_cached, self._p_cached_fn = frame, frame_number
            if increment:
                self.next_frame_number += 1
            return frame
        ok, frame = self._cap.retrieve()
        if not ok:
            frame = None
        if increment:
            self._cap.grab()
            self.next_frame_number += 1
        return frame

    def enable_gray_crop_stream(self, crop_region) -> bool:
        """Switch the av backend to DIRECT gray-crop decode: the native
        layer converts only the crop's rows to BGR and emits the shift-15
        grayscale crop, never materializing full BGR frames (avpump.cpp
        swt_av_read_gray_crop).  Probe-gated on byte equality with the
        full-frame path for this exact geometry; returns False (and changes
        nothing) when the backend, bounds, or parity don't allow it.  Call
        before any window is consumed; afterwards read windows exclusively
        through get_gray_crop_window.

        Also engages on the chunk-parallel backend by swapping its cv2
        full-frame workers for native gray-crop workers
        (parallel_decode.gray_crop_worker_factory): multicore hosts then
        get chunk-parallel decode that is ALSO per-core faster (measured
        522 vs 357 fps on 1080p H.264) and emits the pipeline's exact
        input form."""
        if self._gray_crop is not None:
            return self._gray_crop == crop_region
        if self.backend not in ("av", "parallel"):
            return False
        from . import native_av

        if self.backend == "av":
            H, W = (
                self._current.shape[:2]
                if self._current is not None
                else (self._avrd.height, self._avrd.width)
            )
        else:
            H, W = self._frame_hw
        (x1, y1), (x2, y2) = crop_region
        if not (0 <= y1 < y2 <= H and 0 <= x1 < x2 <= W):
            return False  # python-slice semantics needed for OOB crops
        if not native_av.probe_gray_crop_parity(self.filepath, crop_region):
            return False
        if self.backend == "parallel":
            # the gray workers re-aim chunks via the native keyframe seek,
            # which needs its own byte-exactness probe (the cv2 seek probe
            # that engaged this backend says nothing about libav's)
            if not native_av.probe_native_seek(self.filepath):
                return False
            from .parallel_decode import (
                ParallelDecoder,
                gray_crop_worker_factory,
            )

            old = self._pdec
            self._pdec = ParallelDecoder(
                self.filepath,
                old.total,
                n_workers=self._n_workers,
                start=self.next_frame_number,
                worker_factory=gray_crop_worker_factory(crop_region),
                boundaries=self._kf_bounds,
            )
            old.close()
            self._p_cached, self._p_cached_fn = None, -1
            self._pos = self.next_frame_number
            self._gray_crop = crop_region
            return True
        self._gray_crop = crop_region
        # frame 0 was primed as full BGR at open; express it as a gray crop
        # (bit-identical: same conversion the BGR path would apply)
        if self._current is not None:
            from . import native as _native_mod

            if _native_mod.is_available():
                self._gray_current = _native_mod.gray_crop_batch(
                    self._current[None], crop_region
                )[0]
            else:
                from ..ops.color import bgr_to_gray_host

                self._gray_current = bgr_to_gray_host(
                    self._current[None, y1:y2, x1:x2]
                )[0]
        else:
            self._gray_current = None
        return True

    def get_gray_crop_window(self, n: int):
        """get_window at the gray-crop level (enable_gray_crop_stream
        first): identical null-frame / decode-failure / inclusive-end
        semantics applied one stage later, like HDF5Source's
        get_encoded_window.  Returns ((n, ch, cw) uint8, numbers, stamps)."""
        crop = self._gray_crop
        (x1, y1), (x2, y2) = crop
        ch, cw = y2 - y1, x2 - x1
        crops, numbers, stamps = [], [], []
        for _ in range(n):
            fn = self.next_frame_number
            if not self.start_frame <= fn <= self.end_frame:
                crops.append(np.zeros((ch, cw), np.uint8))
                numbers.append(-1)
                stamps.append(NULL_TIMESTAMP)
                continue
            if self.backend == "parallel":
                if fn != self._pos:
                    # non-sequential (checkpoint resume): re-aim workers
                    self._pdec.restart(fn)
                g = self._pdec.get(fn)
                self._pos = fn + 1
            else:
                if fn != self._pos:
                    # non-sequential (checkpoint resume): re-aim the stream
                    ok = self.supports_seek and self._avrd.seek(fn)
                    self._gray_current = (
                        self._avrd.read_gray_crop(crop) if ok else None
                    )
                    self._pos = fn
                g = self._gray_current
                self._gray_current = self._avrd.read_gray_crop(crop)
                self._pos += 1
            self.next_frame_number += 1
            if g is None:
                # decode failure: substitute the last good crop and count
                # the error (io_video.py:51-53, at the gray level)
                self.read_errors += 1
                g = self._last_good_gray
            else:
                self.frames_read += 1
                self._last_good_gray = g
            if g is None:
                # failure before any successful read: zero frame, same as
                # get_window's geometry fallback
                g = np.zeros((ch, cw), np.uint8)
            crops.append(g)
            numbers.append(fn)
            stamps.append(frame_timestamp(fn, self.fps))
        return np.stack(crops), numbers, stamps

    def close(self):
        if self._pdec is not None:
            self._pdec.close()
        if self._avrd is not None:
            self._avrd.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def open_source(filepath, start: int = 0, end: int = 0) -> FrameSource:
    """Pick a source by suffix (__main__.py:23-26)."""
    p = Path(filepath)
    if p.suffix in (".h5", ".hdf5"):
        return HDF5Source(p, start, end)
    if p.suffix == ".npy":
        src = ArraySource(np.load(p), fps=30.0, start=start, end=end)
        src.filepath = p
        return src
    return VideoFileSource(p, end)
