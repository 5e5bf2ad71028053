"""Randomized many-scene parity fuzz: rebuild vs the full reference oracle.

The suite's e2e parity tests cover a handful of pinned scenes; this campaign
widens that to N randomized synthetic scenes (geometry, actor mix, noise,
brightness drift, tracker impl all varied) and asserts EVENT-FOR-EVENT
equality — predicted/rejected totals and event frame numbers — between
`run_video` and `tests/oracle_pipeline.reference_pipeline` (the line-by-line
reference-semantics oracle, itself differentially validated against the
actual reference code in tests/test_reference_differential.py).

Emits one JSON line per scene and a summary artifact (PARITY_FUZZ_rNN.json)
with every scene's parameters, so failures are reproducible by seed.

CPU-only by design (no chip contention): run with
    python tools/parity_fuzz.py --scenes 40 --out PARITY_FUZZ_r04.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # before any computation (CLAUDE.md)

import numpy as np  # noqa: E402

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.io.readers import ArraySource  # noqa: E402
from swiftwatcher_tpu.io.synthetic import make_video  # noqa: E402
from swiftwatcher_tpu.pipeline.runner import run_video  # noqa: E402

from oracle_pipeline import reference_pipeline  # noqa: E402


def scene_params(rng: np.random.Generator, idx: int) -> dict:
    # Three pinned geometries (not fully random: each H/W is a fresh set of
    # compiled programs; three families keep the campaign CPU-affordable).
    H, W = [(240, 320), (200, 420), (288, 352)][idx % 3]
    return dict(
        seed=int(rng.integers(0, 2**31 - 1)),
        n_frames=int(rng.choice([45, 63, 84])),
        H=H,
        W=W,
        n_entering=int(rng.integers(0, 4)),
        n_crossing=int(rng.integers(0, 3)),
        n_vanishing=int(rng.integers(0, 3)),
        noise=int(rng.integers(2, 6)),
        dot=int(rng.choice([3, 4, 5])),
        brightness_drift=float(rng.choice([0.0, 0.0, 0.15])),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=40)
    ap.add_argument("--campaign-seed", type=int, default=20260820)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(args.campaign_seed)
    results = []
    mismatches = 0
    t_start = time.perf_counter()

    for i in range(args.scenes):
        params = scene_params(rng, i)
        tracker = "device" if i % 2 == 0 else "host"
        video = make_video(**params)
        res = run_video(
            ArraySource(video.frames, fps=video.fps),
            video.corners,
            DEFAULT_CONFIG,
            tracker_impl=tracker,
        )
        events_o, labels_o = reference_pipeline(
            video.frames, video.corners, video.fps
        )
        ours = dict(
            predicted=res.total_predicted,
            rejected=res.total_rejected,
            fns=sorted(ev.frame_number for ev in res.events),
        )
        oracle = dict(
            predicted=int(sum(labels_o)),
            rejected=int(len(labels_o) - sum(labels_o)),
            fns=sorted(fn for _, _, fn in events_o),
        )
        ok = ours == oracle
        mismatches += 0 if ok else 1
        row = dict(scene=i, tracker=tracker, ok=ok, params=params,
                   ours=ours, oracle=oracle)
        print(json.dumps(row), flush=True)
        results.append(row)

    summary = dict(
        scenes=args.scenes,
        mismatches=mismatches,
        campaign_seed=args.campaign_seed,
        elapsed_s=round(time.perf_counter() - t_start, 1),
        note=(
            "Randomized e2e parity fuzz: run_video (alternating device/host "
            "tracker) vs tests/oracle_pipeline.reference_pipeline; equality "
            "on predicted/rejected totals AND sorted event frame numbers. "
            "The oracle is itself differentially validated against the real "
            "reference code (tests/test_reference_differential.py)."
        ),
        results=results,
    )
    print(json.dumps({"summary": {k: v for k, v in summary.items()
                                  if k != "results"}}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=1))
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
