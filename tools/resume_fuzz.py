"""Randomized checkpoint/resume fuzz: interrupted-and-resumed == full run.

The suite pins a handful of resume-equality scenes (device + host tracker,
classify on/off).  This campaign randomizes the axis that actually breaks
checkpointing — WHERE the interruption lands relative to window and batch
boundaries — across N scenes:

  - random scene (geometry family, actors, noise, drift)
  - random tracker impl, random batch_windows in {1, 2}
  - every third scene runs with a segment filter (parity EvenRejector —
    deterministic, device/host identical; the CNN's device-vs-host
    equality is covered by parity_fuzz --classify-every)
  - a FULL uninterrupted run, then an interrupted run truncated at a
    random frame (checkpoint_interval_batches=1 so the last consume's
    checkpoint pairs that batch's cursor with its state), then a resume
    from the checkpoint over the full source

and asserts the resumed run's events (frame numbers, totals) equal the
full run's.  Reference anchor: the reference has no checkpointing at all
(SURVEY.md aux subsystems); this guards OUR extension's exactness.

Usage:
    python tools/resume_fuzz.py --scenes 40 --out RESUME_FUZZ_r05.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

import jax

jax.config.update("jax_platforms", "cpu")  # before any computation (CLAUDE.md)

import numpy as np  # noqa: E402

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.io.readers import ArraySource  # noqa: E402
from swiftwatcher_tpu.io.synthetic import make_video  # noqa: E402
from swiftwatcher_tpu.pipeline.runner import run_video  # noqa: E402

from parity_fuzz import scene_params, _counts  # noqa: E402


class EvenRejector:
    """Deterministic segment filter: keep segments whose area is even.
    Exercises the filter plumbing (incl. checkpointed keep-state) without
    CNN weights; identical on device and host paths by construction."""

    def __call__(self, table, bt, frame, crop_region):
        b, t = bt
        valid = np.asarray(table.valid[b, t])
        areas = np.asarray(table.area[b, t])
        return [bool(areas[k] % 2 == 0) for k in np.nonzero(valid)[0]]


def run_campaign(scenes: int, campaign_seed: int = 20260820,
                 out: str | None = None) -> dict:
    rng = np.random.default_rng(campaign_seed)
    results = []
    mismatches = 0
    t_start = time.perf_counter()

    def summarize():
        return dict(
            scenes=len(results),
            scenes_requested=scenes,
            mismatches=mismatches,
            campaign_seed=campaign_seed,
            elapsed_s=round(time.perf_counter() - t_start, 1),
            note=(
                "Checkpoint/resume fuzz: full run vs (interrupted at a "
                "random frame with checkpoint_interval_batches=1, then "
                "resumed over the full source); equality on "
                "predicted/rejected totals AND sorted event frame numbers."
                "  Trackers alternate, batch_windows rotates {1,2}, every "
                "3rd scene runs a deterministic segment filter."
            ),
            results=results,
        )

    import tempfile

    for i in range(scenes):
        params = scene_params(rng, i)
        tracker = "device" if i % 2 == 0 else "host"
        bw = 1 + (i // 2) % 2
        filt = EvenRejector() if i % 3 == 0 else None
        # host tracker + filter needs the per-frame path; device tracker
        # accepts only batchable filters -> keep filter scenes on host
        if filt is not None:
            tracker = "host"
        cut = int(rng.integers(1, params["n_frames"]))
        cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=bw)
        video = make_video(**params)
        kw = dict(segment_filter=filt) if filt is not None else {}

        full = run_video(ArraySource(video.frames, fps=video.fps),
                         video.corners, cfg, tracker_impl=tracker, **kw)
        with tempfile.TemporaryDirectory() as td:
            ck = Path(td) / "fuzz.ckpt"
            partial = ArraySource(video.frames, fps=video.fps)
            partial.total_frames = cut
            run_video(partial, video.corners, cfg, tracker_impl=tracker,
                      checkpoint_path=ck, checkpoint_interval_batches=1,
                      **kw)
            wrote_ck = ck.exists()
            resumed = run_video(
                ArraySource(video.frames, fps=video.fps), video.corners,
                cfg, tracker_impl=tracker, checkpoint_path=ck, **kw,
            )
        f, r = _counts(full), _counts(resumed)
        ok = f == r
        mismatches += 0 if ok else 1
        row = dict(scene=i, tracker=tracker, batch_windows=bw,
                   filtered=filt is not None, cut_frame=cut,
                   checkpoint_written=wrote_ck, ok=ok, params=params,
                   full=f, resumed=r)
        print(json.dumps(row), flush=True)
        results.append(row)
        if out:  # rewrite after every scene (crash-safe)
            Path(out).write_text(json.dumps(summarize(), indent=1))

    summary = summarize()
    print(json.dumps({"summary": {k: v for k, v in summary.items()
                                  if k != "results"}}), flush=True)
    if out:
        Path(out).write_text(json.dumps(summary, indent=1))
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--campaign-seed", type=int, default=20260820)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    summary = run_campaign(args.scenes, args.campaign_seed, args.out)
    sys.exit(1 if summary["mismatches"] else 0)


if __name__ == "__main__":
    main()
