#!/usr/bin/env python
"""Accuracy-corpus harness: committed per-round detection-quality evidence.

The reference's quality story is P/R/F1 on three annotated real videos
(report §4.2 Tables 3-6; research/video_list.csv:1-8).  No real footage
exists on this rig, so this tool scores the pipeline on a HARD synthetic
corpus — crowding, occlusion, sensor-noise and camera-jitter sweeps,
near-ROI flybys — with constructed ground truth, through the exact same
CSV surfaces and scoring (tools/evaluate.py) a user would apply to real
annotated videos.  Unlike the parity suite (which proves we equal the
reference bit-for-bit), this measures how GOOD the shared algorithm is
when scenes get adversarial, so detection quality is regression-tracked
per round alongside throughput:

    python tools/accuracy_corpus.py --round 4        # -> ACCURACY_r04.json
    python tools/accuracy_corpus.py --scenes clean crowded --json -

Scores are detection-only (predicted+rejected events, report Table 3) and
detection+classification (predicted only, Tables 4/6), at second
granularity (stricter than the report's whole-video tables: an event in
the wrong second scores FP + miss).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from evaluate import (  # noqa: E402
    GT_COLUMNS, Score, _count_series, _fmt_row, load_results, score_counts,
)
from swiftwatcher_tpu.io.export import frame_timestamp  # noqa: E402
from swiftwatcher_tpu.io.synthetic import make_hard_video  # noqa: E402

# Shared geometry so every scene reuses one compiled program set.
BASE = dict(n_frames=84, H=240, W=320, fps=30.0)

# The corpus.  Names are stable across rounds — ACCURACY_rN.json files are
# comparable scene-by-scene.
# Opt-in config variants, re-scored on the scenes they target so the
# artifact shows what each extension buys (and that it does not hurt the
# scenes it is not for).  Keys are stable across rounds like scene names.
VARIANTS = {
    "stabilize3": dict(
        overrides={"stabilize_max_shift": 3},
        scenes=("clean", "noise11", "jitter1", "jitter2"),
        why="electronic stabilization (ops/stabilize.py); targets jitter*",
    ),
    "wide_angle_band": dict(
        overrides={"angle_band_halfwidth": 60.0},
        scenes=("clean", "crowded", "crowded_flyby", "occluded_crowd",
                "flyby_trap"),
        why="entry-angle band 30->60 deg: crowded lanes converge at shallow "
            "angles the reference's +-30 band rejects; flyby_trap controls "
            "that the wider band still rejects the vanish distractor",
    ),
    "false_angle_disp_gate": dict(
        overrides={"false_angle_min_disp": 5.0},
        scenes=("clean", "crowded", "occluded_crowd", "flyby_trap",
                "jitter1"),
        why="only drop multiple-of-15-deg angles when the path moved <5 px: "
            "the reference's grid-artifact heuristic miscounts real dives "
            "at exactly -90/-135 deg (crowded lanes); jitter1/flyby_trap "
            "control that true artifacts/distractors still drop",
    ),
    "accuracy_pack": dict(
        overrides={"angle_band_halfwidth": 60.0,
                   "false_angle_min_disp": 5.0,
                   "stabilize_max_shift": 3},
        scenes=tuple(),  # filled below: ALL scenes — the everything-on row
        why="all opt-in accuracy extensions together (wide band + disp "
            "gate + stabilization): the 'beats the reference' headline and "
            "a check that the extensions do not interact destructively",
    ),
}

SCENES = {
    "clean":          dict(seed=40, n_entering=3, n_crossing=1),
    "crowded":        dict(seed=41, n_entering=5, simultaneous=True),
    "crowded_flyby":  dict(seed=42, n_entering=4, n_flyby=2, simultaneous=True),
    "occlusion":      dict(seed=43, n_entering=3, occluder=True),
    "occluded_crowd": dict(seed=44, n_entering=4, simultaneous=True, occluder=True),
    "noise5":         dict(seed=45, n_entering=3, noise=5, amp=90),
    "noise8":         dict(seed=46, n_entering=3, noise=8, amp=80),
    "noise11":        dict(seed=47, n_entering=3, noise=11, amp=70),
    "jitter1":        dict(seed=48, n_entering=3, jitter=1),
    "jitter2":        dict(seed=49, n_entering=3, jitter=2),
    "flyby_trap":     dict(seed=50, n_entering=2, n_flyby=3, n_vanishing=1),
    "drift":          dict(seed=51, n_entering=3, brightness_drift=0.4),
    # --- r5 footage-physics families (VERDICT r4 #5): what real capture
    # adds that crisp dot-sprites lack.  `recompress`/`vfr` route the scene
    # THROUGH an actual H.264 container (VideoFileSource decode), so
    # blocking artifacts / variable frame timing feed the real pipeline.
    "blur_shutter":   dict(seed=52, n_entering=3, motion_blur=0.5),
    "blur_fast":      dict(seed=53, n_entering=3, motion_blur=0.85, amp=130),
    "flicker_agc":    dict(seed=54, n_entering=3, flicker=0.05),
    "h264_crowded":   dict(seed=55, n_entering=4, simultaneous=True,
                           recompress=True),
    "h264_blur":      dict(seed=56, n_entering=3, motion_blur=0.5,
                           recompress=True),
    "vfr_capture":    dict(seed=57, n_entering=3, vfr=True),
}

VARIANTS["accuracy_pack"]["scenes"] = tuple(SCENES)


def groundtruth_csv(video, path: Path, fps: float = None) -> None:
    """One row per true chimney entry, in the results-CSV schema so
    evaluate.py's loader (io_data.py:152-164 semantics) reads it as-is.

    fps overrides the clip's nominal rate for container-routed scenes: the
    pipeline stamps events as frame / SOURCE fps (the reference's
    CAP_PROP_FPS behavior, io_video.py:137-165), which for a recompressed
    or VFR container is the container's (average) rate, not the
    generator's nominal one — ground truth must live on the same clock."""
    rows = [
        {
            "timestamp": frame_timestamp(fn, fps if fps else video.fps),
            "framenumber": fn,
            "predicted": 1,
        }
        for fn in video.entry_frames
    ]
    df = pd.DataFrame(rows, columns=["timestamp", "framenumber", "predicted"])
    df.to_csv(path, index=False)


def run_scene(name: str, spec: dict, workdir: Path, granularity: str,
              overrides: dict = None) -> dict:
    import dataclasses

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.io.readers import ArraySource
    from swiftwatcher_tpu.pipeline.runner import run_video

    cfg = (dataclasses.replace(DEFAULT_CONFIG, **overrides)
           if overrides else DEFAULT_CONFIG)
    # callers pass nested tempdir paths that may not exist yet (the seed
    # sweep uses <td>/base and <td>/pack); the H.264 route writes the
    # container here BEFORE run_video would create anything
    workdir.mkdir(parents=True, exist_ok=True)
    spec = dict(spec)
    recompress = spec.pop("recompress", False)
    vfr = spec.pop("vfr", False)
    video = make_hard_video(**BASE, **spec)
    gt_fps = video.fps
    if recompress or vfr:
        from swiftwatcher_tpu.io import native_av
        from swiftwatcher_tpu.io.readers import VideoFileSource

        p = workdir / f"{name}.mp4"
        if vfr:
            # variable frame durations around the nominal rate (AGC/auto-
            # exposure cameras stretch and drop frames); the pipeline sees
            # only the container's AVERAGE rate, as the reference would
            rng = np.random.default_rng(spec.get("seed", 0) + 777)
            durs = rng.uniform(
                1.0 / (video.fps * 1.25), 1.0 / (video.fps * 0.8),
                len(video.frames),
            )
            pts = np.concatenate([[0.0], np.cumsum(durs[:-1])])
            ok = native_av.write_test_video_vfr(p, video.frames, pts)
        else:
            ok = native_av.write_test_video(p, video.frames, fps=video.fps)
        if not ok:
            return None  # no H.264 encoder on this host: scene skipped
        source = VideoFileSource(p)
        gt_fps = source.fps
    else:
        source = ArraySource(video.frames, fps=video.fps)
    out = workdir / name
    result = run_video(
        source,
        video.corners,
        cfg,
        export_dir=out,
    )

    gt_path = workdir / f"{name}_gt.csv"
    groundtruth_csv(video, gt_path, fps=gt_fps)
    gt = pd.read_csv(gt_path)
    gt["timestamp"] = pd.to_datetime(gt["timestamp"]).dt.round(freq="us")
    gt = gt.set_index(["timestamp", "framenumber"])
    actual = _count_series(gt, GT_COLUMNS, granularity)

    scores = {}
    for kind, cols in (
        ("detection", ("predicted", "rejected")),
        ("detection+classification", ("predicted",)),
    ):
        try:
            res = load_results(out)
            pred = _count_series(res, cols, granularity)
        except FileNotFoundError:
            pred = pd.Series(dtype=float)  # no events at all -> all missed
        scores[kind] = score_counts(pred, actual)

    return {
        "video": video,
        "scores": scores,
        "events": len(result.events),
        "predicted": result.total_predicted,
        "rejected": result.total_rejected,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--round", type=int, default=None,
                    help="write ACCURACY_r{N:02d}.json at the repo root")
    ap.add_argument("--json", default=None,
                    help="explicit output path ('-' for stdout)")
    ap.add_argument("--scenes", nargs="*", default=None,
                    help="subset of scene names (default: all)")
    ap.add_argument("--granularity", default="second",
                    choices=("exact", "second", "minute", "video"))
    ap.add_argument("--backend", default="default",
                    choices=("default", "cpu"),
                    help="cpu forces the host backend (hermetic; counts "
                    "are backend-invariant per the parity suite) — useful "
                    "when the TPU is busy or the tunnel is dark")
    args = ap.parse_args(argv)

    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    names = args.scenes or list(SCENES)
    unknown = [n for n in names if n not in SCENES]
    if unknown:
        ap.error(f"unknown scenes {unknown}; have {list(SCENES)}")

    out = {
        "granularity": args.granularity,
        "corpus": "synthetic-hard-v1",
        "scenes": {},
    }
    rows = []
    with tempfile.TemporaryDirectory() as td:
        for name in names:
            r = run_scene(name, SCENES[name], Path(td), args.granularity)
            if r is None:  # container scene and no H.264 encoder here
                out["scenes"][name] = {"skipped": "no H.264 encoder"}
                print(f"[{name}] skipped: no H.264 encoder", file=sys.stderr)
                continue
            v = r["video"]
            out["scenes"][name] = {
                "gt_entries": len(v.entry_frames),
                "distractors": v.n_distractors,
                "events_detected": r["events"],
                "predicted": r["predicted"],
                "rejected": r["rejected"],
                **{
                    kind: dict(
                        tp=s.tp, fp=s.fp, missed=s.missed,
                        precision=round(s.precision, 4),
                        recall=round(s.recall, 4), f1=round(s.f1, 4),
                    )
                    for kind, s in r["scores"].items()
                },
            }
            rows.append((name, r["scores"]))
            print(f"[{name}] gt={len(v.entry_frames)} detected={r['events']} "
                  f"pred={r['predicted']} rej={r['rejected']}", file=sys.stderr)

    for kind in ("detection", "detection+classification"):
        print(f"\n== {kind} (granularity: {args.granularity}) ==")
        print(f"{'scene':<28} {'actual':>6} {'predicted':>9} {'TP':>6} "
              f"{'FP':>6} {'missed':>6}  {'precision':>9} {'recall':>7} {'F1':>7}")
        for name, scores in rows:
            print(_fmt_row(name, scores[kind]))
        agg = Score(
            tp=sum(s[kind].tp for _, s in rows),
            fp=sum(s[kind].fp for _, s in rows),
            missed=sum(s[kind].missed for _, s in rows),
        )
        out.setdefault("AVG", {})[kind] = {
            "precision": round(float(np.mean([s[kind].precision for _, s in rows])), 4),
            "recall": round(float(np.mean([s[kind].recall for _, s in rows])), 4),
            "f1": round(float(np.mean([s[kind].f1 for _, s in rows])), 4),
            "pooled_f1": round(agg.f1, 4),
        }
        print(f"{'AVG':<28} {'':>6} {'':>9} {'':>6} {'':>6} {'':>6}  "
              f"{out['AVG'][kind]['precision']:>9.4f} "
              f"{out['AVG'][kind]['recall']:>7.4f} "
              f"{out['AVG'][kind]['f1']:>7.4f}")

    # opt-in variants (skipped when --scenes filters out all their targets)
    for vname, v in VARIANTS.items():
        vscenes = [n for n in v["scenes"] if n in names]
        if not vscenes:
            continue
        vscenes = [n for n in vscenes if "skipped" not in out["scenes"][n]]
        if not vscenes:
            continue
        vout = {}
        with tempfile.TemporaryDirectory() as td:
            for name in vscenes:
                r = run_scene(name, SCENES[name], Path(td),
                              args.granularity, overrides=v["overrides"])
                vout[name] = {
                    kind: dict(
                        tp=s.tp, fp=s.fp, missed=s.missed,
                        precision=round(s.precision, 4),
                        recall=round(s.recall, 4), f1=round(s.f1, 4),
                    )
                    for kind, s in r["scores"].items()
                }
        entry = {
            "overrides": v["overrides"], "why": v["why"], "scenes": vout,
        }
        entry["AVG"] = {
            kind: {
                "f1": round(float(np.mean(
                    [vout[n][kind]["f1"] for n in vscenes])), 4),
                "base_f1": round(float(np.mean(
                    [out["scenes"][n][kind]["f1"] for n in vscenes])), 4),
            }
            for kind in ("detection", "detection+classification")
        }
        out.setdefault("opt_in", {})[vname] = entry
        print(f"\n== opt-in {vname} ({v['why']}) ==")
        for name in vscenes:
            base_f1 = out["scenes"][name]["detection"]["f1"]
            got_f1 = vout[name]["detection"]["f1"]
            print(f"{name:<28} detection F1 {base_f1:.4f} -> {got_f1:.4f}")
        for kind, a in entry["AVG"].items():
            print(f"{'AVG over variant scenes':<28} {kind} F1 "
                  f"{a['base_f1']:.4f} -> {a['f1']:.4f}")

    blob = json.dumps(out, indent=2)
    if args.json == "-":
        print(blob)
    elif args.json:
        Path(args.json).write_text(blob + "\n")
    if args.round is not None:
        path = Path(__file__).resolve().parent.parent / f"ACCURACY_r{args.round:02d}.json"
        path.write_text(blob + "\n")
        print(f"\nwrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
