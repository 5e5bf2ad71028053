"""Build an HDF5 frame cache from any video file.

The reference's experiment workflow reads `frames.h5` caches (HDF5Reader,
io_video.py:85-131; research/video_list.csv tracks which videos have one)
but the script that CREATED them is not in its tree.  This tool closes the
loop: it re-encodes a video into the exact container HDF5Source expects —
dataset "VideoFrames" of per-frame JPEG buffers with CAP_PROP_FPS /
CAP_PROP_FRAME_COUNT attrs — so any footage gains:

  * codec-deterministic re-runs (JPEG bytes are frozen at cache time),
  * --start/--end random access (VideoFileSource is strictly sequential),
  * checkpoint/resume support (requires a seekable source),
  * the native C++ decode fast path (cfg.native_decode: JPEG -> cropped
    grayscale off the GIL, skipping full-frame materialization).

Usage: python tools/make_h5_cache.py VIDEO [-o OUT.h5] [--quality 95]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def make_cache(
    video_path: Path, out_path: Path, quality: int = 95, status=True
) -> int:
    import cv2
    import h5py
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from swiftwatcher_tpu.io.readers import open_source

    source = open_source(video_path)
    n = source.total_frames
    dt = h5py.vlen_dtype(np.uint8)
    with h5py.File(str(out_path), "w") as fh:
        dset = fh.create_dataset("VideoFrames", (n,), dtype=dt)
        fh.attrs["CAP_PROP_FPS"] = float(source.fps)
        fh.attrs["CAP_PROP_FRAME_COUNT"] = int(n)
        written = 0
        for i in range(n):
            frame = source.read_frame(i)
            if frame is None:
                continue  # decode error: slot stays empty -> HDF5Source's
                #            error fallback substitutes the last good frame
            ok, buf = cv2.imencode(
                ".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, quality]
            )
            if not ok:
                continue
            dset[i] = np.frombuffer(buf.tobytes(), np.uint8)
            written += 1
            if status and (i % 250 == 0 or i == n - 1):
                print(f"\r[-]     {i + 1}/{n} frames cached.", end="")
    if status:
        print()
    return written


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("video", type=Path)
    ap.add_argument("-o", "--out", type=Path, default=None)
    ap.add_argument("--quality", type=int, default=95)
    args = ap.parse_args(argv)
    out = args.out or args.video.with_suffix(".h5")
    n = make_cache(args.video, out, quality=args.quality)
    print(f"[-]     wrote {n} frames to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
