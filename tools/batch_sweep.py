"""Interleaved on-chip batch_windows sweep for the resident benches.

Why: enum LAP (track_enum_lap=4, default since r4) cut the tracking scan
5.63x, which moves the resident_tracked batch-size optimum — bench.py's
B=32 tracked / B=64 resident split was chosen under the old cost balance.
The chip's clock mood swings ~2x over minutes, so ONLY same-process
interleaved reps are meaningful (CLAUDE.md measurement rule).

Usage:  python tools/batch_sweep.py [--reps 3] [--frames 13440]
Prints one JSON line per (bench, B) with per-rep fps and the median.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root module; reuses its timed loops)
from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=13440)
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    args = ap.parse_args()

    # Same outage hygiene as bench.main() (ADVICE r4): a dark tunnel must
    # produce a fail-fast error line, not an indefinite hang.
    bench._arm_watchdog()
    if not bench.data_plane_preflight():
        print(json.dumps({"error": "preflight: device_put+readback did not "
                          "complete — axon tunnel outage; no sweep taken"}),
              flush=True)
        sys.exit(3)

    # Same reference-like 1080p scene bench.main() measures on.
    video = bench.make_video(
        seed=0, n_frames=63, H=1080, W=1920,
        n_entering=2, n_crossing=1, n_vanishing=1,
    )
    cases = []
    for B in args.batches:
        cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=B)
        cases.append(("resident", B, lambda c=cfg: bench.resident_fps(c, video, frames=args.frames)))
        cases.append(("tracked", B, lambda c=cfg: bench.resident_tracked_fps(c, video, frames=args.frames)))

    # Warm every compile first (separately timed) so the interleaved reps
    # measure steady-state device time, not the remote compile service.
    for name, B, fn in cases:
        t0 = time.perf_counter()
        fps = fn()
        print(
            json.dumps({"warm": f"{name}@B{B}", "fps": round(fps, 1),
                        "compile_plus_run_s": round(time.perf_counter() - t0, 1)}),
            flush=True,
        )

    samples: dict[tuple[str, int], list[float]] = {(n, B): [] for n, B, _ in cases}
    for rep in range(args.reps):
        for name, B, fn in cases:  # interleaved: every config sees every mood
            samples[(name, B)].append(fn())
        print(json.dumps({"rep": rep, "done": True}), flush=True)

    for (name, B), vals in samples.items():
        print(
            json.dumps(
                {
                    "bench": name,
                    "batch_windows": B,
                    "fps_median": round(statistics.median(vals), 1),
                    "fps_samples": [round(v, 1) for v in vals],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
