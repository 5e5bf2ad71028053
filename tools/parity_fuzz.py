"""Randomized many-scene parity fuzz: rebuild vs the full reference oracle.

The suite's e2e parity tests cover a handful of pinned scenes; this campaign
widens that to N randomized synthetic scenes (geometry, actor mix, noise,
brightness drift, tracker impl all varied) and asserts EVENT-FOR-EVENT
equality — predicted/rejected totals and event frame numbers — between
`run_video` and `tests/oracle_pipeline.reference_pipeline` (the line-by-line
reference-semantics oracle, itself differentially validated against the
actual reference code in tests/test_reference_differential.py).

Every --classify-every'th scene ADDITIONALLY runs both trackers with the
real shipped SqueezeNet segment filter and asserts device-vs-host mutual
equality (the oracle has no CNN, so classify parity is cross-impl; the
classifier itself is differentially tested against the reference model in
tests/test_reference_differential.py).

Emits one JSON line per scene and a summary artifact (PARITY_FUZZ_rNN.json)
with every scene's parameters, so failures are reproducible by seed.  The
artifact is REWRITTEN after every scene (ADVICE r4: a mid-campaign crash
must not lose the machine-readable record of finished scenes).

CPU-only by design (no chip contention): run with
    python tools/parity_fuzz.py --scenes 100 --out PARITY_FUZZ_r05.json
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


def _counts(res) -> dict:
    return dict(
        predicted=res.total_predicted,
        rejected=res.total_rejected,
        fns=sorted(ev.frame_number for ev in res.events),
    )


def run_campaign(scenes: int, campaign_seed: int = 20260820,
                 out: str | None = None, classify_every: int = 5,
                 pack_every: int = 0) -> dict:
    """Run the campaign; returns the summary dict (also written to `out`
    after EVERY scene so a crash loses at most the in-flight scene).

    pack_every > 0 additionally runs every pack_every'th scene with the
    ACCURACY_PACK_OVERRIDES applied to BOTH trackers and asserts
    device-vs-host mutual equality: the pack intentionally changes counts
    (so the reference oracle cannot score it), but the two tracker
    implementations must still agree event-for-event under it."""
    rng = np.random.default_rng(campaign_seed)
    results = []
    mismatches = 0
    t_start = time.perf_counter()

    cfg_pack = None
    if pack_every > 0:
        from swiftwatcher_tpu.config import (
            ACCURACY_PACK_OVERRIDES,
            config_with_overrides,
        )

        cfg_pack = config_with_overrides(list(ACCURACY_PACK_OVERRIDES))

    clf = None
    if classify_every > 0:
        from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter

        clf = SqueezeNetSegmentFilter.from_default_weights(DEFAULT_CONFIG)

    def summarize():
        return dict(
            scenes=len(results),
            scenes_requested=scenes,
            mismatches=mismatches,
            campaign_seed=campaign_seed,
            classify_every=classify_every,
            pack_every=pack_every,
            elapsed_s=round(time.perf_counter() - t_start, 1),
            note=(
                "Randomized e2e parity fuzz: run_video (alternating device/"
                "host tracker) vs tests/oracle_pipeline.reference_pipeline; "
                "equality on predicted/rejected totals AND sorted event "
                "frame numbers.  Every classify_every'th scene also runs "
                "both trackers with the shipped SqueezeNet filter and "
                "asserts device-vs-host mutual equality.  When pack_every "
                "> 0, every pack_every'th scene also runs both trackers "
                "with the ACCURACY_PACK_OVERRIDES applied and asserts "
                "device-vs-host mutual equality under the pack (the pack "
                "intentionally changes counts, so the oracle cannot score "
                "it).  The oracle is itself differentially validated "
                "against the real reference code "
                "(tests/test_reference_differential.py)."
            ),
            results=results,
        )

    for i in range(scenes):
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
        ours = _counts(res)
        oracle = dict(
            predicted=int(sum(labels_o)),
            rejected=int(len(labels_o) - sum(labels_o)),
            fns=sorted(fn for _, _, fn in events_o),
        )
        ok = ours == oracle
        row = dict(scene=i, tracker=tracker, ok=ok, params=params,
                   ours=ours, oracle=oracle)
        if cfg_pack is not None and i % pack_every == 0:
            pd_ = run_video(
                ArraySource(video.frames, fps=video.fps), video.corners,
                cfg_pack, tracker_impl="device",
            )
            ph = run_video(
                ArraySource(video.frames, fps=video.fps), video.corners,
                cfg_pack, tracker_impl="host",
            )
            row["pack_device"] = _counts(pd_)
            row["pack_host"] = _counts(ph)
            row["pack_ok"] = row["pack_device"] == row["pack_host"]
            ok = ok and row["pack_ok"]
            row["ok"] = ok
        if clf is not None and i % classify_every == 0:
            cd = run_video(
                ArraySource(video.frames, fps=video.fps), video.corners,
                DEFAULT_CONFIG, tracker_impl="device", segment_filter=clf,
            )
            ch = run_video(
                ArraySource(video.frames, fps=video.fps), video.corners,
                DEFAULT_CONFIG, tracker_impl="host", segment_filter=clf,
            )
            row["classify_device"] = _counts(cd)
            row["classify_host"] = _counts(ch)
            row["classify_ok"] = row["classify_device"] == row["classify_host"]
            ok = ok and row["classify_ok"]
            row["ok"] = ok
        mismatches += 0 if ok else 1
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
    ap.add_argument("--campaign-seed", type=int, default=20260820)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--classify-every", type=int, default=5,
                    help="every Nth scene also fuzzes the classify path "
                    "(device vs host tracker mutual equality); 0 disables")
    ap.add_argument("--pack-every", type=int, default=0,
                    help="every Nth scene also fuzzes device-vs-host "
                    "mutual equality with the accuracy pack applied; "
                    "0 disables")
    args = ap.parse_args()
    summary = run_campaign(args.scenes, args.campaign_seed, args.out,
                           args.classify_every, args.pack_every)
    sys.exit(1 if summary["mismatches"] else 0)


if __name__ == "__main__":
    main()
