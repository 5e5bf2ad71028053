#!/usr/bin/env python
"""Dump every named intermediate stage of a window as PNGs.

The reference stores each processing stage per frame in
Frame.processed_frames (data_structures.py:44, 151-169) for visual
inspection; this tool is the rebuild's equivalent, using the debug variant
of the compiled window program.

Usage:
    python tools/dump_stages.py VIDEO --window 0 [--out DIR]
Stages written: grayscale, RPCA, bilateral, thresh_15, opened, cc_labeling.
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.geometry import crop_region_from_corners  # noqa: E402
from swiftwatcher_tpu.io.readers import open_source  # noqa: E402
from swiftwatcher_tpu import ui  # noqa: E402
from swiftwatcher_tpu.pipeline.window import localize_window_debug  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--window", type=int, default=0, help="window index (21 frames each)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import cv2

    cfg = DEFAULT_CONFIG
    src_path = Path(args.video)
    source = open_source(src_path)
    attrs = src_path.parent / src_path.stem / "attributes.json"
    corners = ui.get_corners_from_file(attrs) if attrs.is_file() else ui.select_chimney_corners(src_path)
    (x1, y1), (x2, y2) = crop_region_from_corners(corners, cfg)

    for _ in range(args.window + 1):
        frames, numbers, stamps = source.get_window(cfg.window_size)
    crop = np.stack([f[y1:y2, x1:x2, :] for f in frames])

    table, stages, iters = localize_window_debug(crop, cfg)
    out = Path(args.out) if args.out else src_path.parent / src_path.stem / "stages"
    out.mkdir(parents=True, exist_ok=True)
    for name, arr in stages.items():
        arr = np.asarray(arr)
        for t in range(arr.shape[0]):
            img = arr[t]
            if name == "cc_labeling":
                img = (img.astype(np.uint16) * 37 % 256).astype(np.uint8)  # visualize labels
            cv2.imwrite(str(out / f"{numbers[t]}_{name}.png"), img)
    print(f"wrote {len(stages)} stages x {cfg.window_size} frames to {out} "
          f"(IALM iterations: {int(iters)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
