"""Synthetic surveillance-video generator with known swift counts.

The reference had no automated tests; its quality story was ground-truth
videos (SURVEY.md §4).  This generator is the rebuild's CI-runnable
equivalent: a static sky+chimney scene with small dark "swifts" flying in
and disappearing into the chimney mouth (countable events) plus distractor
birds that cross the frame without entering (rejectable events).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np


@dataclasses.dataclass
class SyntheticVideo:
    frames: np.ndarray                 # (N, H, W, 3) uint8 BGR
    corners: List[Tuple[int, int]]     # chimney top corners [(x1,y1),(x2,y2)]
    fps: float
    n_entering: int                    # swifts that dive into the chimney
    n_crossing: int                    # distractors that leave the frame
    n_vanishing: int                   # distractors that vanish inside the ROI


class LoopingArraySource:
    """Benchmark source: serves `total` frames by cycling a base clip.

    Keeps host memory bounded for long benchmark runs (e.g. 840 frames of
    1080p) while exercising the full reader semantics via ArraySource's
    interface contract."""

    def __init__(self, base_frames: np.ndarray, total: int, fps: float = 30.0):
        from .readers import ArraySource

        self._base = np.asarray(base_frames, np.uint8)
        self._inner = ArraySource(self._base, fps=fps)
        self._inner.end_frame = total
        self._inner.total_frames = total
        self._inner.read_frame = self._read_frame  # type: ignore[assignment]
        self._total = total

    def _read_frame(self, frame_number: int, increment: bool = True):
        frame = (
            self._base[frame_number % len(self._base)]
            if frame_number < self._total
            else None
        )
        if increment:
            self._inner.next_frame_number += 1
        return frame

    def __getattr__(self, name):
        return getattr(self._inner, name)

    def __setattr__(self, name, value):
        # Reader state writes (e.g. run_video's checkpoint-resume sets
        # source.next_frame_number) must reach the inner ArraySource — a
        # read-only __getattr__ proxy would silently shadow them on the
        # wrapper and the resume would not seek.
        if name.startswith("_") or "_inner" not in self.__dict__:
            object.__setattr__(self, name, value)
        else:
            setattr(self._inner, name, value)


def make_video(
    seed: int = 0,
    n_frames: int = 63,
    H: int = 240,
    W: int = 320,
    n_entering: int = 2,
    n_crossing: int = 1,
    n_vanishing: int = 0,
    fps: float = 30.0,
    noise: int = 3,
    dot: int = 4,
    amp: int = 120,
    brightness_drift: float = 0.0,
) -> SyntheticVideo:
    """Build a synthetic clip.

    Swift k enters the chimney mouth around frame (k+1) * n_frames //
    (n_entering + 1), approaching from above at a steep angle; crossers fly
    horizontally through the crop region (no event); vanishers fly nearly
    horizontally and disappear inside the ROI band (a rejectable event:
    wrong entry angle).
    """
    rng = np.random.default_rng(seed)
    top, left, right = int(H * 0.55), int(W * 0.42), int(W * 0.60)
    # corners are "clicked" slightly below the visible top, as a user would,
    # so the sky->chimney transition lies inside the ROI strip and the Canny
    # edge (not noise) defines the mask band
    corners = [(left, top + 6), (right, top + 6)]
    mouth_x = (left + right) // 2
    mouth_y = top

    sky = np.zeros((H, W, 3), np.int32)
    sky[..., 0] = 210 + rng.integers(-10, 10)   # B
    sky[..., 1] = 175
    sky[..., 2] = 150
    sky[top:, left:right] = (60, 52, 48)        # dark chimney stack
    # mild vertical gradient so the scene isn't rank-1
    grad = (np.linspace(0, 14, H).astype(np.int32))[:, None, None]
    base = sky + grad

    frames = np.zeros((n_frames, H, W, 3), np.int32)

    # Actors get disjoint time blocks so blobs never merge — merged blobs
    # confuse ANY tracker (incl. the reference) and break ground truth.
    kinds = (
        [("enter", k) for k in range(n_entering)]
        + [("vanish", k) for k in range(n_vanishing)]
        + [("cross", k) for k in range(n_crossing)]
    )
    paths = []  # list of (t0, t1, y(t), x(t))
    if kinds:
        block = max((n_frames - 4) // len(kinds), 8)
        for i, (kind, k) in enumerate(kinds):
            t0 = 2 + i * block
            length = min(12, block - 3, n_frames - t0 - 2)
            if length < 3:
                continue
            if kind == "enter":
                # steep, consistent dives into the mouth (real swifts enter
                # near-vertically; the classifier's mode band is +/-30 deg).
                # Per-frame speed stays under the tracker's 25 px distance
                # knee (segment_tracking.py:196) — faster birds are
                # untrackable by design, in the reference too.
                drop = min(int(H * 0.24), 18 * (length - 1))
                sx = mouth_x - 8 - 5 * k
                xs = np.linspace(sx, mouth_x + 2 + 2 * k, length)
                ys = np.linspace(mouth_y - drop, mouth_y - dot, length)
            elif kind == "vanish":
                # nearly horizontal, ending inside the ROI band (slope avoids
                # exact 15-degree angle multiples); speed under the 25 px knee
                run = min(int(W * 0.14), 18 * (length - 1))
                xs = np.linspace(mouth_x - run, mouth_x + 2 * k, length)
                ys = np.linspace(mouth_y - 9.0, mouth_y - 6.0, length)
            else:
                # crosses the whole crop and exits the far side (no event)
                xs = np.linspace(left - int(W * 0.16), right + int(W * 0.16), length)
                ys = np.full(length, float(mouth_y - 14 - 6 * k)) + np.linspace(
                    0, 5, length
                )
            paths.append((t0, t0 + length, ys, xs))

    for t in range(n_frames):
        f = base + rng.integers(-noise, noise + 1, size=(H, W, 3))
        if brightness_drift:
            f = f + int(brightness_drift * t)  # slow global exposure drift
        for (t0, t1, ys, xs) in paths:
            if t0 <= t < t1:
                y, x = int(ys[t - t0]), int(xs[t - t0])
                if 0 <= y < H - dot and 0 <= x < W - dot:
                    f[y : y + dot, x : x + dot] -= amp
        frames[t] = np.clip(f, 0, 255)

    return SyntheticVideo(
        frames=frames.astype(np.uint8),
        corners=corners,
        fps=fps,
        n_entering=n_entering,
        n_crossing=n_crossing,
        n_vanishing=n_vanishing,
    )
