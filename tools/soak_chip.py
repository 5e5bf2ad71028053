#!/usr/bin/env python
"""On-chip soak of the SHIPPED defaults over a long looping stream.

Round-4 assurance for the enum-LAP default flip (track_enum_lap=4): the
r3 soaks (33.6k / 100.8k frames) ran the JV path; this drives run_video on
the real chip with the current defaults (device tracker, enum LAP, wire
codec auto) for N loops of the bench scene and asserts exact count
scaling — every loop must contribute the same events (the scene's actors
are time-boxed, so counts scale linearly or the tracker is leaking/
dropping state across batches).

Usage: python tools/soak_chip.py [--loops 20] [--scene-frames 63]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--backend", default="default", choices=("default", "cpu"),
                    help="cpu forces the host backend (counts are "
                    "backend-invariant; use when the tunnel is dark)")
    args = ap.parse_args(argv)

    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import LoopingArraySource, make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    video = make_video(seed=0, n_frames=63, H=args.height, W=args.width,
                       n_entering=2, n_crossing=1, n_vanishing=1)

    # per-loop truth from a single-pass run (same config)
    base = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                     DEFAULT_CONFIG, tracker_impl="device")

    total = args.loops * video.frames.shape[0]
    src = LoopingArraySource(video.frames, total=total, fps=video.fps)
    t0 = time.perf_counter()
    res = run_video(src, video.corners, DEFAULT_CONFIG, tracker_impl="device")
    dt = time.perf_counter() - t0

    ok = (
        res.total_predicted == args.loops * base.total_predicted
        and res.total_rejected == args.loops * base.total_rejected
        and len(res.events) == args.loops * len(base.events)
        and res.frames_processed == total
    )
    print(json.dumps({
        "frames": res.frames_processed,
        "fps": round(res.frames_processed / dt, 1),
        "loops": args.loops,
        "events_per_loop": len(base.events),
        "predicted": res.total_predicted,
        "rejected": res.total_rejected,
        "counts_scale_exactly": ok,
        "config": {"track_enum_lap": DEFAULT_CONFIG.track_enum_lap,
                   "tracker": "device"},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
