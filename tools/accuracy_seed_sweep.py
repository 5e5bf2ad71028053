#!/usr/bin/env python
"""Seed-robustness sweep for the opt-in accuracy extensions.

The per-round corpus (tools/accuracy_corpus.py, ACCURACY_rNN.json) scores
each scene at ONE seed — enough to regression-track, but open to the
suspicion that the extensions are tuned to those particular draws.  This
sweep re-renders the adversarial scenes at several fresh seeds and scores
reference-default vs the accuracy_pack overrides on every draw, so the
claimed improvement is a distribution, not a point: means, per-seed win/
loss/tie counts, and the worst regression across all draws.

    python tools/accuracy_seed_sweep.py --round 4   # -> ACCURACY_SEEDS_r04.json
    python tools/accuracy_seed_sweep.py --seeds 3 --scenes crowded jitter2

Scenes and scoring are accuracy_corpus.py's exactly (second granularity);
seeds are BASE_SEED_OFFSET + i so no sweep seed collides with the pinned
corpus seeds (40-51).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from accuracy_corpus import SCENES, VARIANTS, run_scene  # noqa: E402

# Scenes where the pack claims a win or must not regress (controls).
DEFAULT_SCENES = ("clean", "crowded", "crowded_flyby", "occluded_crowd",
                  "jitter2", "flyby_trap")
BASE_SEED_OFFSET = 1000  # disjoint from the pinned corpus seeds (40-51)
KINDS = ("detection", "detection+classification")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="write ACCURACY_SEEDS_r{NN}.json at the repo root")
    ap.add_argument("--json", default=None)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--scenes", nargs="*", default=None)
    ap.add_argument("--granularity", default="second",
                    choices=("second", "minute", "frame"))
    ap.add_argument("--backend", default="default", choices=("default", "cpu"))
    args = ap.parse_args(argv)

    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    names = args.scenes or DEFAULT_SCENES
    overrides = VARIANTS["accuracy_pack"]["overrides"]
    out = {
        "granularity": args.granularity,
        "seeds_per_scene": args.seeds,
        "overrides": overrides,
        "scenes": {},
    }

    for name in names:
        spec = dict(SCENES[name])
        rows = []
        for i in range(args.seeds):
            # crc32, not hash(): PYTHONHASHSEED would make reruns diverge
            spec["seed"] = (BASE_SEED_OFFSET + 100 * i
                            + zlib.crc32(name.encode()) % 97)
            with tempfile.TemporaryDirectory() as td:
                base = run_scene(name, spec, Path(td) / "base",
                                 args.granularity)
                pack = run_scene(name, spec, Path(td) / "pack",
                                 args.granularity, overrides=overrides)
            if base is None or pack is None:
                # run_scene's only None path: the H.264 route found no
                # encoder on this host — scene unusable for every seed
                print(f"{name}: skipped (no H.264 encoder on this host)")
                rows = []
                break
            row = {"seed": spec["seed"]}
            for kind in KINDS:
                b, p = base["scores"][kind], pack["scores"][kind]
                row[kind] = {"base_f1": round(b.f1, 4),
                             "pack_f1": round(p.f1, 4)}
            rows.append(row)
            print(f"{name:<16} seed {spec['seed']:<6} det "
                  f"{rows[-1]['detection']['base_f1']:.4f} -> "
                  f"{rows[-1]['detection']['pack_f1']:.4f}   det+class "
                  f"{rows[-1][KINDS[1]]['base_f1']:.4f} -> "
                  f"{rows[-1][KINDS[1]]['pack_f1']:.4f}")
        if not rows:
            out["scenes"][name] = {"skipped": "no H.264 encoder on this host"}
            continue
        scene = {"seeds": rows}
        for kind in KINDS:
            b = np.array([r[kind]["base_f1"] for r in rows])
            p = np.array([r[kind]["pack_f1"] for r in rows])
            scene[kind] = {
                "base_mean_f1": round(float(b.mean()), 4),
                "pack_mean_f1": round(float(p.mean()), 4),
                "wins": int((p > b).sum()),
                "losses": int((p < b).sum()),
                "ties": int((p == b).sum()),
                "worst_delta": round(float((p - b).min()), 4),
            }
        out["scenes"][name] = scene

    for kind in KINDS:
        rows = [s[kind] for s in out["scenes"].values() if kind in s]
        out.setdefault("AVG", {})[kind] = {
            "base_mean_f1": round(float(np.mean(
                [r["base_mean_f1"] for r in rows])), 4),
            "pack_mean_f1": round(float(np.mean(
                [r["pack_mean_f1"] for r in rows])), 4),
            "total_wins": sum(r["wins"] for r in rows),
            "total_losses": sum(r["losses"] for r in rows),
            "total_ties": sum(r["ties"] for r in rows),
            "worst_delta": round(min(r["worst_delta"] for r in rows), 4),
        }
        a = out["AVG"][kind]
        print(f"AVG {kind:<28} base {a['base_mean_f1']:.4f} -> pack "
              f"{a['pack_mean_f1']:.4f}  (w/l/t {a['total_wins']}/"
              f"{a['total_losses']}/{a['total_ties']}, worst "
              f"{a['worst_delta']:+.4f})")

    blob = json.dumps(out, indent=2)
    if args.json == "-":
        print(blob)
    else:
        path = (Path(args.json) if args.json else
                Path(__file__).resolve().parent.parent /
                f"ACCURACY_SEEDS_r{args.round:02d}.json")
        path.write_text(blob + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
