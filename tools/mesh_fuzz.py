"""Randomized mesh-geometry sharding fuzz: run_video(mesh=...) vs unsharded.

The dryrun gate asserts sharded-vs-unsharded TABLE + EVENT equality at two
pinned geometries (toy and 250x499 production); this campaign widens that
to N randomized scenes x a sweep of mesh factorizations on the 8-virtual-
device CPU mesh, asserting EVENT-FOR-EVENT equality (predicted/rejected
totals, frame numbers, first/last centroids) between the sharded and
unsharded runner paths with the device tracker.

The claim under test (parallel/mesh.py): flat-pixel sharding with
IALM-neutral zero padding makes ANY crop geometry shard exactly, and the
batch 'data' axis divides windows without changing results.  Each
(geometry family x mesh shape) is one compiled program; scenes reuse the
cache, so the campaign stays CPU-affordable.

Usage:
    python tools/mesh_fuzz.py --scenes 30 --out MESH_FUZZ_r05.json
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

import jax

jax.config.update("jax_platforms", "cpu")  # before any computation (CLAUDE.md)
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

from swiftwatcher_tpu.config import DEFAULT_CONFIG  # noqa: E402
from swiftwatcher_tpu.io.readers import ArraySource  # noqa: E402
from swiftwatcher_tpu.io.synthetic import make_video  # noqa: E402
from swiftwatcher_tpu.parallel.mesh import make_mesh  # noqa: E402
from swiftwatcher_tpu.pipeline.runner import run_video  # noqa: E402

# (data, model) factorizations over <= 8 devices; model shards the flat
# pixel axis (odd/awkward widths exercise the padding), data shards
# windows (batch_windows below is divisible by every data here).
MESH_SHAPES = [(2, 1), (4, 1), (8, 1), (1, 2), (2, 2), (4, 2), (2, 4)]

# Two geometry families (each is a fresh compile set): one odd-width crop
# (worst case for flat-pixel padding), one chroma-even production-like.
GEOMS = [(240, 318), (250, 422)]


def scene_params(rng: np.random.Generator, idx: int) -> dict:
    H, W = GEOMS[idx % len(GEOMS)]
    return dict(
        seed=int(rng.integers(0, 2**31 - 1)),
        n_frames=int(rng.choice([45, 63])),
        H=H,
        W=W,
        n_entering=int(rng.integers(0, 4)),
        n_crossing=int(rng.integers(0, 3)),
        n_vanishing=int(rng.integers(0, 3)),
        noise=int(rng.integers(2, 6)),
        dot=int(rng.choice([3, 4, 5])),
        brightness_drift=float(rng.choice([0.0, 0.0, 0.15])),
    )


def _events(res) -> dict:
    return dict(
        predicted=res.total_predicted,
        rejected=res.total_rejected,
        events=[
            (ev.frame_number, tuple(ev.first_centroid), tuple(ev.last_centroid))
            for ev in res.events
        ],
    )


def run_campaign(scenes: int, campaign_seed: int = 20260820,
                 out: str | None = None) -> dict:
    rng = np.random.default_rng(campaign_seed)
    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=8)
    results = []
    mismatches = 0
    t_start = time.perf_counter()

    def summarize():
        return dict(
            scenes=len(results),
            scenes_requested=scenes,
            mismatches=mismatches,
            campaign_seed=campaign_seed,
            mesh_shapes=MESH_SHAPES,
            geometries=GEOMS,
            elapsed_s=round(time.perf_counter() - t_start, 1),
            note=(
                "run_video(mesh=(data,model)) vs unsharded, device tracker, "
                "batch_windows=8, 8-virtual-device CPU mesh; equality on "
                "predicted/rejected totals AND (frame_number, "
                "first_centroid, last_centroid) per event.  Mesh shape "
                "rotates per scene so every factorization sees multiple "
                "random scenes."
            ),
            results=results,
        )

    for i in range(scenes):
        params = scene_params(rng, i)
        data, model = MESH_SHAPES[i % len(MESH_SHAPES)]
        mesh = make_mesh(data * model, shape=(data, model))
        video = make_video(**params)
        base = run_video(
            ArraySource(video.frames, fps=video.fps), video.corners, cfg,
            tracker_impl="device",
        )
        shard = run_video(
            ArraySource(video.frames, fps=video.fps), video.corners, cfg,
            mesh=mesh, tracker_impl="device",
        )
        b, s = _events(base), _events(shard)
        ok = b == s
        mismatches += 0 if ok else 1
        row = dict(scene=i, mesh=[data, model], ok=ok, params=params,
                   base=b, sharded=s)
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
    ap.add_argument("--scenes", type=int, default=28)
    ap.add_argument("--campaign-seed", type=int, default=20260820)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    summary = run_campaign(args.scenes, args.campaign_seed, args.out)
    sys.exit(1 if summary["mismatches"] else 0)


if __name__ == "__main__":
    main()
