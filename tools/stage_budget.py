#!/usr/bin/env python
"""Fresh per-stage device budget of the resident localization pipeline.

Times PREFIXES of the compiled window program (rpca | +postfilter | +ccl |
+wrap/props | +tracker-scan) on the CURRENT backend, each as ONE fori_loop
dispatch with a carry data-dependence (bench.py's resident methodology, so
no per-batch tunnel round-trips pollute the numbers).  A stage's cost is
the difference between successive prefix times — honest about XLA fusing
across stage boundaries, which per-stage micro-timings are not.  Prefix
reps are INTERLEAVED: the chip's clock mood swings ~2x over minutes, so
only same-process interleaved comparisons are meaningful (CLAUDE.md).

Usage: python tools/stage_budget.py [--batch 32] [--frames 13440] [--reps 3]
Prints one JSON line: ms per 672 frames per stage + implied resident fps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "SWTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/swiftwatcher_tpu_xla")
    ),
)

import jax.numpy as jnp  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=13440)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default="default", choices=("default", "cpu"))
    args = ap.parse_args(argv)
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import bench
    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.geometry import (
        crop_region_from_corners,
        roi_crop_region_from_corners,
    )
    from swiftwatcher_tpu.io.synthetic import make_video
    from swiftwatcher_tpu.ops.ccl import label_components, wrap_labels_uint8
    from swiftwatcher_tpu.ops.filtering import apply_postfilter
    from swiftwatcher_tpu.ops.props import region_tables
    from swiftwatcher_tpu.ops.roi_mask import generate_roi_mask
    from swiftwatcher_tpu.ops.rpca import rpca_motion_window_batched
    from swiftwatcher_tpu.pipeline.tracking_jax import (
        compact_tables, empty_state, track_window,
    )

    cfg = dataclasses.replace(DEFAULT_CONFIG, batch_windows=args.batch)
    video = make_video(seed=0, n_frames=63, H=1080, W=1920,
                       n_entering=2, n_crossing=1, n_vanishing=1)
    batch = bench._window_batch(cfg, video, to_gray=True)
    B, T = cfg.batch_windows, cfg.window_size
    H, W = batch.shape[2], batch.shape[3]

    crop_region = crop_region_from_corners(video.corners, cfg)
    roi_region = roi_crop_region_from_corners(video.corners, cfg)
    roi = jax.device_put(
        np.asarray(generate_roi_mask(video.frames[0], roi_region, crop_region, cfg))
    )
    st0 = empty_state(cfg.max_tracks)

    def prefix_rpca(g):
        motion, iters = rpca_motion_window_batched(g, cfg)
        return jnp.sum(motion.astype(jnp.int32)) + jnp.sum(iters)

    def prefix_post(g):
        motion, iters = rpca_motion_window_batched(g, cfg)
        filt = apply_postfilter(motion.reshape(B * T, H, W), cfg)
        return jnp.sum(filt.astype(jnp.int32)) + jnp.sum(iters)

    def prefix_ccl(g):
        motion, iters = rpca_motion_window_batched(g, cfg)
        filt = apply_postfilter(motion.reshape(B * T, H, W), cfg)
        labels, _ = label_components(filt > 0, cfg.ccl_max_iters)
        return jnp.sum(labels) + jnp.sum(iters)

    def _tables(g):
        motion, iters = rpca_motion_window_batched(g, cfg)
        filt = apply_postfilter(motion.reshape(B * T, H, W), cfg)
        labels, _ = label_components(filt > 0, cfg.ccl_max_iters)
        table = region_tables(wrap_labels_uint8(labels, cfg.label_modulus))
        table = jax.tree.map(lambda a: a.reshape(B, T, *a.shape[1:]), table)
        return table, iters

    def prefix_props(g):
        table, iters = _tables(g)
        return (jnp.sum(table.area) + jnp.sum(table.sum_y)
                + jnp.sum(table.sum_x)
                + jnp.sum(table.valid.astype(jnp.int32)) + jnp.sum(iters))

    fns = jnp.arange(B * T, dtype=jnp.int32)
    active = jnp.ones((B * T,), bool)

    prefixes = [
        ("rpca", prefix_rpca),
        ("+postfilter", prefix_post),
        ("+ccl", prefix_ccl),
        ("+wrap_props", prefix_props),
    ]

    def make_run_k(fn):
        @jax.jit
        def run_k(b, k):
            def body(_, carry):
                bi = b + jnp.minimum(carry, 0).astype(b.dtype)
                return jnp.minimum(fn(bi), 1)
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return run_k

    @jax.jit
    def run_k_track(b, k):
        # mirrors bench.resident_tracked_fps: tracker state threads the
        # carry so the scan is a real sequential consumer
        def body(_, carry):
            st, acc = carry
            bi = b + jnp.minimum(acc, 0).astype(b.dtype)
            table, iters = _tables(bi)
            cy, cx, kvalid, _ = compact_tables(table, cfg.max_tracks)
            st, ev = track_window(
                st, roi,
                cy.reshape(B * T, -1), cx.reshape(B * T, -1),
                kvalid.reshape(B * T, -1), fns, cfg, active=active,
            )
            s = ev.count + jnp.sum(iters) + jnp.sum(table.area)
            return st, jnp.minimum(s, 1)

        _, out = jax.lax.fori_loop(0, k, body, (st0, jnp.int32(0)))
        return out

    runs = [(name, make_run_k(fn)) for name, fn in prefixes]
    runs.append(("+track_scan", run_k_track))
    for name, rk in runs:  # compile + warm
        int(rk(batch, jnp.int32(1)))
        print(f"[warm] {name}", file=sys.stderr)

    n_batches = max(args.frames // (B * T), 1)
    t_best = {name: float("inf") for name, _ in runs}
    for rep in range(args.reps):
        for name, rk in runs:  # interleaved
            t0 = time.perf_counter()
            out = int(rk(batch, jnp.int32(n_batches)))
            dt = time.perf_counter() - t0
            assert out >= 0
            t_best[name] = min(t_best[name], dt)
            print(f"[rep {rep}] {name}: {dt:.3f}s", file=sys.stderr)

    frames = n_batches * B * T
    per672 = {name: t_best[name] / frames * 672 * 1000 for name, _ in runs}
    stages = {"rpca": round(per672["rpca"], 1)}
    order = [n for n, _ in runs]
    for prev, cur in zip(order, order[1:]):
        stages[cur.lstrip("+")] = round(per672[cur] - per672[prev], 1)
    out = {
        "batch_windows": B,
        "frames_timed": frames,
        "stage_ms_per_672f": stages,
        "total_ms_per_672f": round(per672[order[-1]], 1),
        "implied_tracked_fps": round(frames / t_best[order[-1]], 1),
        "implied_resident_fps": round(frames / t_best["+wrap_props"], 1),
        "reps": args.reps,
        "note": "prefix differences; interleaved reps; best-of per prefix",
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
