#!/usr/bin/env python
"""On-chip soak of the SHIPPED defaults over a long looping stream.

Drives run_video on the real chip with the current defaults (device
tracker, enum LAP, wire codec auto) and asserts exact count scaling —
every loop must contribute the same events (the scene's actors are
time-boxed, so counts scale linearly or the tracker is leaking/dropping
state across batches).

r5 (VERDICT r4 #7): the soak now runs PASSES of run_video until a wall-
clock target is reached (--min-wall-secs), recording per-pass host RSS
(/proc/self/status VmRSS) and, where the backend exposes it, the device
memory stats — so leak evidence is a memory CURVE, not a single count
check.  Count scaling is asserted on every pass.

Usage: python tools/soak_chip.py [--loops 20] [--min-wall-secs 1800]
                                 [--out SOAK.json]
Prints one JSON line per pass + a summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def _device_mem() -> dict | None:
    """Device memory stats when the PJRT plugin exposes them (the axon
    plugin may not; absence is recorded as null, not an error)."""
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if not stats:
            return None
        keep = {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "largest_alloc_size"):
            if k in stats:
                keep[k] = int(stats[k])
        return keep or dict(stats)
    except Exception:
        return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=20,
                    help="scene repetitions per pass")
    ap.add_argument("--min-wall-secs", type=float, default=0.0,
                    help="keep running passes until this much wall time "
                    "has elapsed (0 = exactly one pass)")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--out", default=None,
                    help="write the summary JSON here as well")
    ap.add_argument("--backend", default="default", choices=("default", "cpu"),
                    help="cpu forces the host backend (counts are "
                    "backend-invariant; use when the tunnel is dark)")
    args = ap.parse_args(argv)

    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import bench
    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.io.synthetic import LoopingArraySource, make_video
    from swiftwatcher_tpu.pipeline.runner import run_video

    bench._arm_watchdog()
    if args.backend != "cpu" and not bench.data_plane_preflight():
        print(json.dumps({"error": "preflight: tunnel outage; no soak taken"}),
              flush=True)
        return 3

    video = make_video(seed=0, n_frames=63, H=args.height, W=args.width,
                       n_entering=2, n_crossing=1, n_vanishing=1)

    # per-loop truth from a single-pass run (same config)
    base = run_video(ArraySource(video.frames, fps=video.fps), video.corners,
                     DEFAULT_CONFIG, tracker_impl="device")

    total = args.loops * video.frames.shape[0]
    t_start = time.perf_counter()
    passes = []
    all_ok = True
    while True:
        src = LoopingArraySource(video.frames, total=total, fps=video.fps)
        rss0 = _rss_mb()
        t0 = time.perf_counter()
        res = run_video(src, video.corners, DEFAULT_CONFIG,
                        tracker_impl="device")
        dt = time.perf_counter() - t0
        ok = (
            res.total_predicted == args.loops * base.total_predicted
            and res.total_rejected == args.loops * base.total_rejected
            and len(res.events) == args.loops * len(base.events)
            and res.frames_processed == total
        )
        all_ok = all_ok and ok
        row = {
            "pass": len(passes),
            "frames": res.frames_processed,
            "fps": round(res.frames_processed / dt, 1),
            "counts_scale_exactly": ok,
            "rss_mb_before": rss0,
            "rss_mb_after": _rss_mb(),
            "device_mem": _device_mem(),
            "wall_s": round(time.perf_counter() - t_start, 1),
        }
        passes.append(row)
        print(json.dumps(row), flush=True)
        if time.perf_counter() - t_start >= args.min_wall_secs:
            break

    rss_curve = [p["rss_mb_after"] for p in passes]
    summary = {
        "frames_total": sum(p["frames"] for p in passes),
        "passes": len(passes),
        "loops_per_pass": args.loops,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "fps_median": round(float(np.median([p["fps"] for p in passes])), 1),
        "events_per_loop": len(base.events),
        "counts_scale_exactly": all_ok,
        "rss_mb_curve": rss_curve,
        "rss_mb_growth": round(rss_curve[-1] - rss_curve[0], 1)
        if len(rss_curve) > 1 else 0.0,
        "device_mem_last": passes[-1]["device_mem"],
        "config": {"track_enum_lap": DEFAULT_CONFIG.track_enum_lap,
                   "tracker": "device"},
        "per_pass": passes,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
