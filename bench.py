"""Headline benchmark: end-to-end 1080p frames/sec/chip.

Drives the REAL product path (`run_video`: host windowing/crop -> batched
compiled localization on device -> host tracking -> events) over synthetic
1080p surveillance footage with reference-like chimney geometry, and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is against BASELINE.json's north-star target of 2000 1080p
frames/sec/chip on TPU v5e.  A warmup video first pays all XLA compiles;
the timed run is steady-state.  Frames come from a memory-bounded looping
source (decode is out of scope — the reference reads pre-decoded HDF5 frames
in its benchmark configs too).

Usage: python bench.py [--frames N] [--warmup-frames N]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SWTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/swiftwatcher_tpu_xla")),
)

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.io.synthetic import LoopingArraySource, make_video
from swiftwatcher_tpu.pipeline.runner import run_video

BASELINE_FPS = 2000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=840)
    ap.add_argument("--warmup-frames", type=int, default=168)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch-windows", type=int, default=DEFAULT_CONFIG.batch_windows)
    args = ap.parse_args()

    import dataclasses

    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=args.batch_windows)

    # Reference-like 1080p scene: ~400 px chimney -> ~500 x 250 crop.
    video = make_video(
        seed=0,
        n_frames=63,
        H=args.height,
        W=args.width,
        n_entering=2,
        n_crossing=1,
        n_vanishing=1,
    )

    # Warmup: full pipeline once to pay compiles.
    warm = LoopingArraySource(video.frames, total=args.warmup_frames, fps=video.fps)
    run_video(warm, video.corners, cfg)

    source = LoopingArraySource(video.frames, total=args.frames, fps=video.fps)
    start = time.perf_counter()
    result = run_video(source, video.corners, cfg)
    elapsed = time.perf_counter() - start

    fps = result.frames_processed / elapsed
    print(
        json.dumps(
            {
                "metric": "1080p_frames_per_sec_per_chip_end_to_end",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
            }
        )
    )
    print(
        json.dumps(
            {
                "detail": {
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "frames": result.frames_processed,
                    "elapsed_s": round(elapsed, 3),
                    "events": len(result.events),
                    "predicted": result.total_predicted,
                    "batch_windows": cfg.batch_windows,
                }
            }
        ),
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
