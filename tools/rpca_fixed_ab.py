#!/usr/bin/env python
"""Same-process A/B: dynamic IALM while_loop vs fixed-trip fori_loop
(VERDICT r4 #4a — the one RPCA layout candidate not yet tried).

What it measures: rpca_motion_window_batched device time on the bench
scene's production geometry, dynamic stopping (shipped default) vs
rpca_fixed_iters=N, each as ONE fori_loop dispatch with a carry data
dependence (bench.py's resident methodology), reps INTERLEAVED because the
chip's clock mood swings ~2x over minutes (CLAUDE.md measurement rule).

What it checks first: that the dynamic solver takes EXACTLY N iterations on
every window of this scene (the r3 measured spread-zero fact the fixed-trip
idea rests on) and that the two paths' motion outputs are bitwise equal
there — otherwise the A/B is comparing different math and says so.

Usage: python tools/rpca_fixed_ab.py [--batch 32] [--frames 13440]
       [--reps 3] [--iters 15] [--out RPCA_FIXED_AB_r05.json]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--out", default=None)
    ap.add_argument("--backend", default="default", choices=("default", "cpu"))
    args = ap.parse_args(argv)
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import bench
    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.ops.rpca import rpca_motion_window_batched

    bench._arm_watchdog()
    if args.backend != "cpu" and not bench.data_plane_preflight():
        print(json.dumps({"error": "preflight: tunnel outage; no A/B taken"}),
              flush=True)
        return 3

    cfg_dyn = dataclasses.replace(DEFAULT_CONFIG, batch_windows=args.batch)
    cfg_fix = dataclasses.replace(cfg_dyn, rpca_fixed_iters=args.iters)
    video = bench.make_video(seed=0, n_frames=63, H=1080, W=1920,
                             n_entering=2, n_crossing=1, n_vanishing=1)
    batch = bench._window_batch(cfg_dyn, video, to_gray=True)
    B, T = cfg_dyn.batch_windows, cfg_dyn.window_size

    # --- precondition: dynamic count == N everywhere + bitwise equality ---
    m_dyn, it_dyn = rpca_motion_window_batched(batch, cfg_dyn)
    m_fix, it_fix = rpca_motion_window_batched(batch, cfg_fix)
    it_dyn = np.asarray(it_dyn)
    spread_zero = bool((it_dyn == args.iters).all())
    bitwise_equal = bool(np.array_equal(np.asarray(m_dyn), np.asarray(m_fix)))
    precheck = {
        "dynamic_iters_min": int(it_dyn.min()),
        "dynamic_iters_max": int(it_dyn.max()),
        "spread_zero_at_n": spread_zero,
        "motion_bitwise_equal": bitwise_equal,
    }
    print(json.dumps({"precheck": precheck}), flush=True)

    def make_run_k(cfg):
        @jax.jit
        def run_k(b, k):
            def body(_, carry):
                bi = b + jnp.minimum(carry, 0).astype(b.dtype)
                motion, iters = rpca_motion_window_batched(bi, cfg)
                return jnp.minimum(
                    jnp.sum(motion.astype(jnp.int32)) + jnp.sum(iters), 1
                )
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return run_k

    runs = [("dynamic", make_run_k(cfg_dyn)), ("fixed", make_run_k(cfg_fix))]
    for name, rk in runs:
        t0 = time.perf_counter()
        int(rk(batch, jnp.int32(1)))
        print(f"[warm] {name}: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)

    n_batches = max(args.frames // (B * T), 1)
    samples = {name: [] for name, _ in runs}
    for rep in range(args.reps):
        for name, rk in runs:  # interleaved
            t0 = time.perf_counter()
            out = int(rk(batch, jnp.int32(n_batches)))
            dt = time.perf_counter() - t0
            assert out >= 0
            samples[name].append(dt)
            print(f"[rep {rep}] {name}: {dt:.3f}s", file=sys.stderr, flush=True)

    frames = n_batches * B * T
    best = {name: min(v) for name, v in samples.items()}
    result = {
        "batch_windows": B,
        "frames_timed": frames,
        "fixed_iters": args.iters,
        "precheck": precheck,
        "dynamic_ms_per_672f": round(best["dynamic"] / frames * 672e3, 2),
        "fixed_ms_per_672f": round(best["fixed"] / frames * 672e3, 2),
        "speedup_x": round(best["dynamic"] / best["fixed"], 3),
        "samples_s": {k: [round(x, 3) for x in v] for k, v in samples.items()},
        "backend": jax.default_backend(),
        "note": (
            "fixed-trip fori_loop IALM (no stopping-criterion norms, no "
            "per-window freeze masks) vs shipped dynamic while_loop; "
            "interleaved reps, best-of; outputs bitwise equal iff "
            "precheck.spread_zero_at_n (VERDICT r4 #4a)"
        ),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        from pathlib import Path

        Path(args.out).write_text(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
