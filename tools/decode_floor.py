#!/usr/bin/env python
"""Per-core ingest-decode budget: codec floor vs conversion overhead.

VERDICT r3 #8: the bench detail line reports ~270 fps/core host decode on
the bench scene via the native gray-crop path (io_video.py:155-165 is the
reference's equivalent ingest).  This tool answers ONE question — is that
rate libavcodec decode proper (then it is the floor; stop tuning) or
conversion/copy overhead (then shave it)?

Method: interleaved same-process passes over one H.264 encode of the bench
scene (the chip's clock has moods; a 1-core host's scheduler does too):

  null       decode only, frame discarded (swt_av_read_null) — the codec
             floor; no conversion tuning can beat this
  gray_crop  decode + chroma-aligned slice convert of the chimney crop
             (the product ingest path)
  full_bgr   decode + whole-frame BGR conversion (the fallback path)
  cv2        cv2.VideoCapture full decode (the reference-exact path)

Usage: python tools/decode_floor.py [--frames 315] [--passes 3] [--file X]
Prints one JSON line; exit 2 if the native lib lacks read_null.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=315)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--file", default=None,
                    help="existing video file (default: encode the bench "
                    "scene fresh)")
    args = ap.parse_args(argv)

    from swiftwatcher_tpu.config import DEFAULT_CONFIG as cfg
    from swiftwatcher_tpu.geometry import crop_region_from_corners
    from swiftwatcher_tpu.io import native_av
    from swiftwatcher_tpu.io.synthetic import make_video

    video = make_video(seed=0, n_frames=63, H=1080, W=1920,
                       n_entering=2, n_crossing=1, n_vanishing=1)
    crop = crop_region_from_corners(video.corners, cfg)

    with tempfile.TemporaryDirectory() as td:
        if args.file:
            p = args.file
        else:
            loops = max(args.frames // 63, 1)
            tiled = np.tile(video.frames, (loops, 1, 1, 1))
            p = os.path.join(td, "floor.mp4")
            if not native_av.write_test_video(p, tiled, fps=video.fps):
                print(json.dumps({"error": "no H.264 encoder"}))
                return 2

        rd = native_av.AVReader.open(p)
        if rd is None:
            print(json.dumps({"error": "native av lib unavailable"}))
            return 2
        has_null = rd.read_null()
        rd.close()
        if not has_null:
            print(json.dumps({"error": "lib lacks swt_av_read_null "
                              "(stale build?)"}))
            return 2

        def timed(read_fn_name):
            rd = native_av.AVReader.open(p)
            fn = {
                "null": rd.read_null,
                "gray_crop": lambda: rd.read_gray_crop(crop) is not None,
                "full_bgr": lambda: rd.read() is not None,
            }[read_fn_name]
            t0 = time.perf_counter()
            k = 0
            while fn():
                k += 1
            dt = time.perf_counter() - t0
            rd.close()
            return k / dt, k

        def timed_cv2():
            import cv2

            cap = cv2.VideoCapture(p)
            t0 = time.perf_counter()
            k = 0
            while cap.read()[0]:
                k += 1
            dt = time.perf_counter() - t0
            cap.release()
            return k / dt, k

        best = {}
        n_seen = None
        for _ in range(args.passes):          # interleaved for fairness
            for name in ("null", "gray_crop", "full_bgr"):
                fps, k = timed(name)
                n_seen = k
                best[name] = max(best.get(name, 0.0), fps)
            fps, _ = timed_cv2()
            best["cv2"] = max(best.get("cv2", 0.0), fps)

    conv_share = 1.0 - best["gray_crop"] / best["null"]
    out = {
        "frames": n_seen,
        "passes": args.passes,
        "fps": {k: round(v, 1) for k, v in best.items()},
        "gray_crop_conversion_share": round(conv_share, 3),
        "finding": (
            "gray-crop is within {:.0%} of the null-decode codec floor — "
            "the remaining ingest budget is libavcodec itself; no "
            "conversion tuning can recover it".format(max(conv_share, 0.0))
            if conv_share < 0.15
            else "conversion/copy costs {:.0%} on top of the codec floor "
            "— worth shaving".format(conv_share)
        ),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
