"""Counts-equality campaign for the rpca_fixed_iters perf knob.

tools/rpca_fixed_ab.py measured the fixed-trip IALM 1.353x faster on chip
(RPCA_FIXED_AB_r05.json) but NOT bitwise-equal: dynamic stopping spreads
13-15 iterations on the bench scene, so windows that converge early get
extra post-convergence iterations under the knob.  The knob stays opt-in
BECAUSE of that (the reference's own stopping criterion is the semantics —
image_filtering.py:256-301); this campaign quantifies the knob's EVENT-level
safety: across the parity-fuzz scene generator, does rpca_fixed_iters=15
ever change predicted/rejected totals or any event frame number vs the
shipped dynamic default?

Post-convergence IALM drift is at the tol scale (1e-3 relative Frobenius
residual on these scenes) and the motion mask passes through u8
quantization + the TOZERO threshold + size filters before events, so the
expectation is zero count divergence; this artifact replaces that
expectation with data.

CPU-only (no chip contention):
    python tools/rpca_fixed_counts.py --scenes 40 --out RPCA_FIXED_COUNTS_r05.json
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
sys.path.insert(0, str(ROOT / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # before any computation (CLAUDE.md)

import numpy as np  # noqa: E402

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.io.readers import ArraySource  # noqa: E402
from swiftwatcher_tpu.io.synthetic import make_video  # noqa: E402
from swiftwatcher_tpu.pipeline.runner import run_video  # noqa: E402

from parity_fuzz import scene_params, _counts  # noqa: E402


def run_campaign(scenes: int, fixed_iters: int = 15,
                 campaign_seed: int = 20260820,
                 out: str | None = None) -> dict:
    """Same scene generator and seed stream as the parity-fuzz campaign so
    scene parameters line up row-for-row with PARITY_FUZZ_r05.json."""
    rng = np.random.default_rng(campaign_seed)
    cfg_fix = dataclasses.replace(DEFAULT_CONFIG, rpca_fixed_iters=fixed_iters)
    results = []
    mismatches = 0
    t_start = time.perf_counter()

    def summarize():
        return dict(
            scenes=len(results),
            scenes_requested=scenes,
            mismatches=mismatches,
            fixed_iters=fixed_iters,
            campaign_seed=campaign_seed,
            elapsed_s=round(time.perf_counter() - t_start, 1),
            note=(
                "run_video with shipped dynamic IALM vs rpca_fixed_iters="
                f"{fixed_iters}, alternating device/host tracker; equality "
                "on predicted/rejected totals AND sorted event frame "
                "numbers.  Scene stream identical to PARITY_FUZZ_r05.json "
                "(same generator + campaign seed).  Motivation + on-chip "
                "speedup: RPCA_FIXED_AB_r05.json."
            ),
            results=results,
        )

    for i in range(scenes):
        params = scene_params(rng, i)
        tracker = "device" if i % 2 == 0 else "host"
        video = make_video(**params)
        res_dyn = run_video(
            ArraySource(video.frames, fps=video.fps), video.corners,
            DEFAULT_CONFIG, tracker_impl=tracker,
        )
        res_fix = run_video(
            ArraySource(video.frames, fps=video.fps), video.corners,
            cfg_fix, tracker_impl=tracker,
        )
        dyn, fix = _counts(res_dyn), _counts(res_fix)
        ok = dyn == fix
        mismatches += 0 if ok else 1
        row = dict(scene=i, tracker=tracker, ok=ok, params=params,
                   dynamic=dyn, fixed=fix)
        print(json.dumps(row), flush=True)
        results.append(row)
        if out:  # rewrite after every scene (crash-safe; ADVICE r4)
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
    ap.add_argument("--fixed-iters", type=int, default=15)
    ap.add_argument("--campaign-seed", type=int, default=20260820)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    summary = run_campaign(args.scenes, args.fixed_iters,
                           args.campaign_seed, args.out)
    sys.exit(1 if summary["mismatches"] else 0)


if __name__ == "__main__":
    main()
