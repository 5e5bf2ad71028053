"""Per-video orchestration: the reference's swift_counting_algorithm
(__main__.py:56-100) rebuilt around the compiled window program.

Host duties only: pull a 21-frame window from the source, slice the crop,
hand the uint8 batch to the jitted localization program, convert the
returned segment tables into tracker steps, and export CSVs at the end.
All per-pixel work happens inside `localize_window` on device.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np
import pandas as pd

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..geometry import crop_region_from_corners, roi_crop_region_from_corners
from ..ops.roi_mask import generate_roi_mask
from ..io.readers import FrameSource
from ..io.export import export_results, generate_test_dir
from .window import localize_window
from .tracking import SegmentTracker, Event
from .events import classify_events


@dataclasses.dataclass
class VideoResult:
    events: List[Event]
    df_labels: Optional[pd.DataFrame]
    total_predicted: int
    total_rejected: int
    frames_processed: int
    ialm_iters: List[int]
    export_dir: Optional[Path] = None


def extract_frame_segments(table, t: int):
    """Segment centroids for frame t from a RegionTable, in ascending label
    order, as float64 (row, col) — regionprops parity (SURVEY.md §2.1)."""
    valid = np.asarray(table.valid[t])
    idx = np.nonzero(valid)[0]
    sum_y = np.asarray(table.sum_y[t]).astype(np.float64)
    sum_x = np.asarray(table.sum_x[t]).astype(np.float64)
    area = np.asarray(table.area[t]).astype(np.float64)
    return [(sum_y[k] / area[k], sum_x[k] / area[k]) for k in idx]


def run_video(
    source: FrameSource,
    corners,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    export_dir: Optional[Path] = None,
    debug: bool = False,
    segment_filter: Optional[Callable] = None,
    status_cb: Optional[Callable[[int, int], None]] = None,
) -> VideoResult:
    """Count swifts in one video.

    segment_filter: optional per-frame callable (centroids, frame_number) ->
    keep mask, the hook where the SqueezeNet classifier plugs in
    (__main__.py:84-85).
    """
    # --- init: regions + ROI mask from the first frame (once per video) ---
    ff = source.read_frame(0, increment=False)
    crop_region = crop_region_from_corners(corners, cfg)
    roi_region = roi_crop_region_from_corners(corners, cfg)
    roi_mask = np.asarray(generate_roi_mask(ff, roi_region, crop_region, cfg))

    tracker = SegmentTracker(roi_mask, cfg)
    (x1, y1), (x2, y2) = crop_region

    frames_processed = 0
    ialm_iters: List[int] = []
    while frames_processed < source.total_frames:
        frames, numbers, stamps = source.get_window(cfg.window_size)
        crop = np.ascontiguousarray(frames[:, y1:y2, x1:x2, :])
        table, _, iters = localize_window(crop, cfg)
        table = dataclasses.replace(
            table,
            **{
                f.name: np.asarray(getattr(table, f.name))
                for f in dataclasses.fields(table)
            },
        )
        ialm_iters.append(int(iters))

        for t in range(cfg.window_size):
            centroids = extract_frame_segments(table, t)
            if segment_filter is not None:
                keep = segment_filter(table, t, frames[t], crop_region)
                centroids = [c for c, k in zip(centroids, keep) if k]
            tracker.step(centroids, numbers[t], stamps[t])
            if numbers[t] >= 0:
                frames_processed += 1

        if status_cb is not None:
            status_cb(frames_processed, source.total_frames)

    events = tracker.events
    df_labels = classify_events(events, cfg) if events else None

    total_pred = total_rej = 0
    out_dir = None
    if df_labels is not None and export_dir is not None:
        out_dir = Path(export_dir)
        if debug:
            out_dir = generate_test_dir(out_dir)
        total_pred = export_results(
            out_dir, df_labels, source.fps, source.start_frame, source.end_frame
        )
    if df_labels is not None:
        total_pred = int((df_labels["label"] > 0).sum())
        total_rej = int((df_labels["label"] == 0).sum())

    return VideoResult(
        events=events,
        df_labels=df_labels,
        total_predicted=total_pred,
        total_rejected=total_rej,
        frames_processed=frames_processed,
        ialm_iters=ialm_iters,
        export_dir=out_dir,
    )
