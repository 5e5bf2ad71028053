"""--export: per-segment overlay and crop PNGs.

Replicates Frame.export_segments (data_structures.py:65-113): for every
segment of every processed frame, write
  * an overlay PNG of the chimney crop with the segment's bbox filled red at
    alpha 0.6, under <export_dir>/overlay/
  * the segment's (>=24x24-expanded) crop from the FULL-resolution frame,
    under <export_dir>/
named '"<src>"_<frame>_<label>_<nsegs>.png'.  The reference's export path is
<video file path>/segments — the video FILE path treated as a directory
(__main__.py:95-96) — which we reproduce.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..models.classifier import expand_bbox


def export_frame_segments(
    frame_bgr: np.ndarray,
    table,
    index,
    frame_number: int,
    crop_region,
    export_dir: Path,
    src_name: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep=None,
) -> int:
    """Write overlay + crop PNGs for one frame's segments; returns count.

    keep: optional classifier keep-mask over the frame's valid segments in
    ascending label order.  The reference runs the CNN filter BEFORE export
    (__main__.py:84-96), dropping rejected segments and relabeling the
    survivors 1..N (segment_classification.py:40-44) — so with --classify,
    rejected segments must produce no PNGs and names use the contiguous
    post-filter labels and count."""
    import cv2

    export_dir = Path(export_dir)
    # the reference mkdirs per exported frame regardless of segment count
    # (data_structures.py:65-67)
    (export_dir / "overlay").mkdir(parents=True, exist_ok=True)

    if isinstance(index, tuple):
        get = lambda a: np.asarray(a[index[0], index[1]])
    else:
        get = lambda a: np.asarray(a[index])
    valid = get(table.valid)
    ks = np.nonzero(valid)[0]
    if keep is not None:
        ks = [k for k, kp in zip(ks, keep) if kp]
    if len(ks) == 0:
        return 0

    (x1, y1), (x2, y2) = crop_region
    crop_img = frame_bgr[y1:y2, x1:x2]
    min_y, min_x = get(table.min_y), get(table.min_x)
    max_y, max_x = get(table.max_y), get(table.max_x)

    n = len(ks)
    for i, k in enumerate(ks):
        # post-filter segments are relabeled 1..N; unfiltered slots already
        # carry contiguous 1..N labels (slot index == CCL label)
        label = i + 1 if keep is not None else int(k)
        name = '"{}"_{}_{}_{}.png'.format(src_name, frame_number, label, n)
        bbox = (int(min_y[k]), int(min_x[k]), int(max_y[k]), int(max_x[k]))

        # overlay: alpha-blended filled rectangle (data_structures.py:83-92)
        overlay = crop_img.copy()
        output = crop_img.copy()
        cv2.rectangle(overlay, (bbox[1], bbox[0]), (bbox[3], bbox[2]), (0, 0, 255), -1)
        cv2.addWeighted(overlay, 0.6, output, 0.4, 0, output)
        cv2.imwrite(str(export_dir / "overlay" / name), output)

        # segment crop from the full frame (data_structures.py:94-113)
        ey1, ex1, ey2, ex2 = expand_bbox(bbox, cfg.min_seg_size)
        seg = frame_bgr[ey1 + y1 : ey2 + y1, ex1 + x1 : ex2 + x1]
        if seg.size:
            cv2.imwrite(str(export_dir / name), seg)
    return n
