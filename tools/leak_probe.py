"""Root-cause probe for the SOAK_r05 RSS growth (~57 MB/pass on axon).

Runs repeated run_video passes on the CPU backend over a small looping
scene and records, per pass: host RSS, jax live-array count + bytes,
gc object count, and top tracemalloc growth sites.  The soak curve was
monotonic ~57 MB per run_video CALL (not per frame), which smells like
per-call retention (a module-level cache, a jit of a fresh closure, or
an unreleased native handle), not a steady-state stream leak.

Usage: python tools/leak_probe.py [--passes 8] [--loops 4] [--tracemalloc]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import tracemalloc
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.io.synthetic import LoopingArraySource, make_video  # noqa: E402
from swiftwatcher_tpu.pipeline.runner import run_video  # noqa: E402


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def _live() -> tuple[int, float]:
    arrs = jax.live_arrays()
    return len(arrs), round(sum(a.nbytes for a in arrs) / 1e6, 1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--loops", type=int, default=4)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--tracemalloc", action="store_true")
    ap.add_argument("--tracker", default="device")
    args = ap.parse_args()

    video = make_video(seed=0, n_frames=63, H=args.height, W=args.width,
                       n_entering=2, n_crossing=1, n_vanishing=1)
    total = args.loops * video.frames.shape[0]

    if args.tracemalloc:
        tracemalloc.start(10)
    snap_prev = None
    for i in range(args.passes):
        src = LoopingArraySource(video.frames, total=total, fps=video.fps)
        run_video(src, video.corners, DEFAULT_CONFIG,
                  tracker_impl=args.tracker)
        gc.collect()
        n_live, mb_live = _live()
        row = dict(p=i, rss_mb=_rss_mb(), live_arrays=n_live,
                   live_mb=mb_live, gc_objects=len(gc.get_objects()))
        print(json.dumps(row), flush=True)
        if args.tracemalloc and i >= args.passes - 3:
            snap = tracemalloc.take_snapshot()
            if snap_prev is not None:
                top = snap.compare_to(snap_prev, "lineno")[:8]
                for st in top:
                    print("  TM", st, flush=True)
            snap_prev = snap


if __name__ == "__main__":
    main()
