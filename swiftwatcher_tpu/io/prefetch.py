"""Background window prefetching: decode/crop/grayscale/upload off the
critical path.

A worker thread reads windows from the FrameSource (honoring the
reference's per-window loop condition), slices the chimney crop, converts
to grayscale on host (bit-identical to the device op), and starts the
host->device transfer — so the main loop's device dispatches overlap both
the frame I/O and the (potentially slow) upload link.  This is the
double-buffered host->HBM streaming layer of SURVEY.md §7 step 8.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

import jax

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..ops.color import bgr_to_gray_host
from .readers import FrameSource
from .wirecodec import (
    encode_delta4,
    encode_delta6,
    device_put_packet,
    device_put_packet6,
)


def _d6_probe_once(probe: np.ndarray, _time) -> float:
    """One link-rate probe: upload + readback elapsed seconds."""
    t0 = _time.perf_counter()
    np.asarray(jax.device_put(probe))
    return _time.perf_counter() - t0


def _round_up(n: int, quantum: int) -> int:
    return -(-max(n, 1) // quantum) * quantum


class WindowPrefetcher:
    """Yields ready-to-dispatch window batches ahead of consumption."""

    def __init__(
        self,
        source: FrameSource,
        crop_region,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        keep_frames: bool = False,
        depth: Optional[int] = None,
        initial_planned: int = 0,
        frame_hw=None,
    ):
        self.source = source
        self.cfg = cfg
        self.keep_frames = keep_frames
        (self.x1, self.y1), (self.x2, self.y2) = crop_region
        self._planned = initial_planned
        self._exhausted = initial_planned >= source.total_frames
        from . import native as _native_mod

        self._native = _native_mod if _native_mod.is_available() else None
        # Opt-in native JPEG->gray-crop decode for HDF5 sources (skips the
        # cv2 decode + full-frame materialization entirely).
        self._encoded_mode = bool(
            cfg.native_decode
            and not keep_frames
            and self._native is not None
            and hasattr(source, "get_encoded_window")
        )
        self._frame_hw = frame_hw
        self._last_good_crop = None
        if self._encoded_mode:
            # The native pump decodes JPEG only; a cache of PNG (or other)
            # payloads must take the cv2 path — without this sniff every
            # frame would fail decode and the run would "succeed" with
            # zero counts.
            head = source.peek_encoded(source.start_frame)
            if head is None or not head.startswith(b"\xff\xd8"):
                self._encoded_mode = False
        if self._encoded_mode:
            if self._frame_hw is None:
                # caller didn't know the frame size; probe with one decode
                first = source.read_frame(source.start_frame, increment=False)
                if first is None:
                    self._encoded_mode = False
                else:
                    self._frame_hw = first.shape[:2]
            if self._frame_hw is not None:
                H, W = self._frame_hw
                if not (0 <= self.y1 < self.y2 <= H and 0 <= self.x1 < self.x2 <= W):
                    self._encoded_mode = False  # python-slice semantics needed
        # Direct gray-crop decode for the native libav container backend:
        # the decoder converts only the crop's rows and emits the grayscale
        # crop, skipping full-frame BGR entirely (probe-gated bit-exact,
        # io/readers.py:enable_gray_crop_stream).
        self._gray_mode = bool(
            cfg.av_gray_decode
            and not keep_frames
            and hasattr(source, "enable_gray_crop_stream")
            and source.enable_gray_crop_stream(crop_region)
        )
        # Wire codec state (io/wirecodec.py): "delta6"/"delta4" encode every
        # batch; "auto" probes the host link with small dummy transfers and
        # enables the codec (delta6, the denser v2 format) only on slow
        # links (< cfg.wire_auto_mbps).  The probe uses plain np.asarray
        # round trips — no compiled program, so first-compile latency can't
        # contaminate the rate estimate.
        self._codec = cfg.wire_codec if cfg.wire_codec in ("delta4", "delta6") else None
        if cfg.wire_codec == "auto":
            import time as _time

            probe = np.zeros(2 * 1024 * 1024, np.uint8)
            # Best of 3: one sample rides two ~35 ms dispatch latencies plus
            # one-shot jitter on a link that swings 4-36 MB/s over minutes —
            # an unlucky draw would pin the codec choice (and its compiled
            # program) for the whole run (ADVICE r2).  min(elapsed) rejects
            # the latency outliers; lossless either way.
            elapsed = min(
                _d6_probe_once(probe, _time) for _ in range(3)
            )
            # each probe is a full round trip (upload + readback), so count
            # both directions' bytes against the elapsed time
            rate = 2 * probe.nbytes / max(elapsed, 1e-9)
            if rate < cfg.wire_auto_mbps * 1e6:
                self._codec = "delta6"
        # delta6 level-2/3 streams vary per batch; pad to coarse monotonic
        # buckets so the set of compiled decode-program shapes stays tiny
        # (one in steady state).
        self._lvl2_bucket = 0
        self._esc3_bucket = 0
        self.wire_bytes = 0          # actual bytes enqueued to the device
        self._ex = ThreadPoolExecutor(max_workers=1)
        self._depth = depth or cfg.prefetch_depth
        self._futures = []
        for _ in range(self._depth):
            self._futures.append(self._ex.submit(self._produce))

    def _produce(self):
        """Read up to batch_windows windows (loop condition checked before
        each window, as the reference does at __main__.py:71), grayscale the
        crops, and start the device transfer."""
        if self._exhausted:
            return None
        cfg = self.cfg
        B = max(cfg.batch_windows, 1)
        wins = []
        while len(wins) < B and self._planned < self.source.total_frames:
            if self._encoded_mode:
                bufs, numbers, stamps = self.source.get_encoded_window(cfg.window_size)
                H, W = self._frame_hw
                gray, ok = self._native.decode_window_gray(
                    [b if b is not None else b"" for b in bufs],
                    H, W, ((self.x1, self.y1), (self.x2, self.y2)),
                )
                # reference error fallback (io_video.py:51-53): a frame that
                # fails to DECODE substitutes the last good frame and bumps
                # read_errors (null frames are legitimately zero)
                for i, n in enumerate(numbers):
                    if n < 0:
                        continue
                    if ok[i]:
                        self._last_good_crop = gray[i]
                    else:
                        self.source.read_errors += 1
                        if self._last_good_crop is not None:
                            gray[i] = self._last_good_crop
                wins.append((None, numbers, stamps, gray))
                self._planned += sum(1 for n in numbers if n >= 0)
                continue
            if self._gray_mode:
                gray, numbers, stamps = self.source.get_gray_crop_window(
                    cfg.window_size
                )
                wins.append((None, numbers, stamps, gray))
                self._planned += sum(1 for n in numbers if n >= 0)
                continue
            frames, numbers, stamps = self.source.get_window(cfg.window_size)
            # Crop with numpy slicing FIRST (python slice semantics match the
            # reference even for out-of-bounds regions), then grayscale the
            # small crop stack — the C++ pump off the GIL when available.
            crops = np.stack(
                [f[self.y1 : self.y2, self.x1 : self.x2, :] for f in frames]
            )
            if self._native is not None:
                ch, cw = crops.shape[1], crops.shape[2]
                gray = self._native.gray_crop_batch(crops, ((0, 0), (cw, ch)))
            else:
                gray = bgr_to_gray_host(crops)
            wins.append((frames if self.keep_frames else None, numbers, stamps, gray))
            self._planned += sum(1 for n in numbers if n >= 0)
        if not wins:
            self._exhausted = True
            return None
        n_real = len(wins)
        # Pad a partial final batch by REPEATING the last real window (its
        # outputs are discarded downstream either way): repeated frames have
        # all-zero wire residuals, so the delta4 codec stays engaged — zero
        # padding would make the boundary residual a near-full frame of
        # escapes, overflow the cap, and ship the last batch raw (paying a
        # first compile of the never-warmed raw program mid-run).
        gray = np.stack(
            [w[3] for w in wins] + [wins[-1][3]] * (B - n_real)
        )
        payload = None
        if self._codec == "delta6":
            T, h, w = gray.shape[1:]
            pkt = encode_delta6(
                gray.reshape(-1, h, w), cfg.wire_escape_cap
            )
            if pkt is not None:          # level-3 overflow -> raw fallback
                # Pad the variable-length streams to monotonic buckets: the
                # decode program recompiles only when a bucket grows, and
                # repeated-window batch padding keeps stream sizes stable.
                # Quanta scale down for small batches so padding can never
                # swamp a small crop's wire size.
                q2 = min(cfg.wire_lvl2_quantum, max(1024, gray.size // 64))
                q3 = min(cfg.wire_esc3_quantum, max(128, gray.size // 2048))
                self._lvl2_bucket = max(
                    self._lvl2_bucket, _round_up(pkt.lvl2.size, q2)
                )
                if pkt.lvl2.size < self._lvl2_bucket:
                    pkt.lvl2 = np.pad(
                        pkt.lvl2, (0, self._lvl2_bucket - pkt.lvl2.size)
                    )
                n3 = int(np.count_nonzero(pkt.esc_idx < gray.size))
                self._esc3_bucket = max(
                    self._esc3_bucket, _round_up(n3, q3)
                )
                if self._esc3_bucket < pkt.esc_idx.size:
                    pkt.esc_idx = pkt.esc_idx[: self._esc3_bucket].copy()
                    pkt.esc_val = pkt.esc_val[: self._esc3_bucket].copy()
                payload = device_put_packet6(pkt)  # async upload starts here
                self.wire_bytes += payload.nbytes
        elif self._codec == "delta4":
            T, h, w = gray.shape[1:]
            # Escape capacity scales with the batch (1/16 of the residual
            # count, floored) so the fixed side-stream overhead can't
            # dominate small batches; cfg.wire_escape_cap is the ceiling.
            cap = min(
                cfg.wire_escape_cap,
                max(1024, (gray.size - h * w) // 16),
            )
            pkt = encode_delta4(gray.reshape(-1, h, w), cap)
            if pkt is not None:          # escape overflow -> raw fallback
                payload = device_put_packet(pkt)  # async upload starts here
                self.wire_bytes += pkt.nbytes
        if payload is None:
            payload = jax.device_put(gray)  # upload starts here, off-thread
            self.wire_bytes += gray.nbytes
        if self._planned >= self.source.total_frames:
            self._exhausted = True
        cursor = (self.source.next_frame_number, self._planned)
        return payload, [(w[0], w[1], w[2]) for w in wins], cursor

    def next(self):
        """Pop the next ready batch (None when the video is done)."""
        fut = self._futures.pop(0)
        self._futures.append(self._ex.submit(self._produce))
        return fut.result()

    def close(self):
        # wait=True: an in-flight _produce may still be reading from the
        # source; returning before it finishes lets the caller close the
        # source (freeing a native decoder handle) under the worker's feet
        self._ex.shutdown(wait=True, cancel_futures=True)
