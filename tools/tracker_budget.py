#!/usr/bin/env python
"""Device-tracker budget probe: where do the tracking scan's microseconds go?

Times track_window (the lax.scan consumer, pipeline/tracking_jax.py) on the
current backend over synthetic compacted tables at several segment
densities, in three variants:

  full     — the real step (cost matrix + JV LAP + events + linking)
  enum     — track_enum_lap=4 (vectorized enumeration LAP on small frames,
             JV fallback above the threshold); full-vs-enum is the enum win
  stacked  — track_stacked_ops=True (event scatters 5->2, linking gathers
             5->1); full-vs-stacked is the backlog-0 stacking win
  enumstk  — both flags (the composed candidate default)
  nolap    — solve_lap stubbed to the identity permutation (everything
             unmatched); the full-vs-nolap delta is the LAP's share
  empty    — all-invalid tables (the lax.cond fast path / chunk skip)

All variants run interleaved in ONE process (the chip's clock mood swings
~2x over minutes; only same-process A/Bs are meaningful).

Prints one JSON line per (density, variant): ms per 336-frame batch and
the implied fps.  Run on the chip to decide whether further tracker work
has a prize; CPU runs are only a smoke test.

Usage: python tools/tracker_budget.py [--frames 336] [--iters 8] [--chunk 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_tables(rng, T, K, density, max_segments=3):
    """Synthetic compacted tables: walkers with sub-knee steps so the LAP
    sees realistic match structure (not all-appear)."""
    cys = np.zeros((T, K), np.float32)
    cxs = np.zeros((T, K), np.float32)
    valids = np.zeros((T, K), bool)
    walkers = []
    for t in range(T):
        if rng.random() < density and len(walkers) < max_segments:
            walkers.append([rng.uniform(5, 95), rng.uniform(5, 95)])
        if walkers and rng.random() < density * 0.3:
            walkers.pop(int(rng.integers(len(walkers))))
        if rng.random() > density:
            frame_walkers = []
        else:
            frame_walkers = walkers
        for k, w in enumerate(frame_walkers[:K]):
            w[0] = float(np.clip(w[0] + rng.uniform(-12, 12), 0, 99))
            w[1] = float(np.clip(w[1] + rng.uniform(-12, 12), 0, 99))
            cys[t, k], cxs[t, k] = w
            valids[t, k] = True
    return cys, cxs, valids


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=336)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import dataclasses

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.pipeline import tracking_jax as tj

    # "full" pins the JV path even if the shipped default flips to enum
    cfg = dataclasses.replace(DEFAULT_CONFIG, track_enum_lap=0)
    T, K = args.frames, cfg.max_tracks
    roi = np.zeros((100, 100), np.uint8)
    roi[55:80, 20:80] = 255
    rng = np.random.default_rng(0)

    densities = {"dense": 0.95, "mixed": 0.5, "sparse": 0.1, "empty": 0.0}
    streams = {
        name: make_tables(rng, T, K, d) for name, d in densities.items()
    }

    real_lap = tj.solve_lap
    variant_cfg = {
        "full": cfg,
        "nolap": cfg,
        "enum": dataclasses.replace(cfg, track_enum_lap=4),
        "stacked": dataclasses.replace(cfg, track_stacked_ops=True),
        "enumstk": dataclasses.replace(
            cfg, track_enum_lap=4, track_stacked_ops=True
        ),
    }
    fns = jnp.arange(T, dtype=jnp.int32)
    dev_streams = {
        name: (jnp.asarray(cys), jnp.asarray(cxs), jnp.asarray(valids), fns)
        for name, (cys, cxs, valids) in streams.items()
    }
    out = {}

    def build(variant):
        vcfg = variant_cfg[variant]

        @jax.jit
        def run(cys, cxs, valids, fns):
            def body(i, acc):
                st, ev = tj.track_window(
                    tj.empty_state(K), jnp.asarray(roi), cys, cxs, valids,
                    fns, vcfg, chunk=args.chunk,
                )
                return acc + ev.count + st.hist_len.sum()

            return jax.lax.fori_loop(0, args.iters, body, jnp.int32(0))

        # trace + compile every stream NOW, while the intended solve_lap
        # monkeypatch is active (jit defers tracing to the first call, and
        # track_window's cache key does not see the patch — measured!)
        for a in dev_streams.values():
            int(run(*a))
        return run

    def measure(variant, run):
        for name, a in dev_streams.items():
            t0 = time.perf_counter()
            s = int(run(*a))
            dt = time.perf_counter() - t0
            ms = dt / args.iters * 1e3
            out[f"{variant}:{name}"] = round(ms, 3)
            print(
                json.dumps(
                    {
                        "variant": variant,
                        "stream": name,
                        "ms_per_batch": round(ms, 3),
                        "fps": round(T / (ms / 1e3)),
                        "checksum": s,
                    }
                ),
                flush=True,
            )

    # decision-critical A/Bs first: distinct static cfgs (no key collision),
    # compiled together, timed interleaved — the mood-proof comparison
    runs = {v: build(v) for v in ("full", "enum", "stacked", "enumstk")}
    for v, r in runs.items():
        measure(v, r)

    # nolap floor last, in its own trace world (same cfg as full -> same
    # jit cache key, so it must not coexist with the real-LAP trace)
    jax.clear_caches()
    tj.solve_lap = lambda cost, skip=None: jnp.arange(
        cost.shape[0], dtype=jnp.int32
    )
    measure("nolap", build("nolap"))
    tj.solve_lap = real_lap
    if out.get("full:dense") and out.get("nolap:dense"):
        print(
            json.dumps(
                {
                    "lap_share_dense": round(
                        1 - out["nolap:dense"] / out["full:dense"], 3
                    ),
                    "lap_share_sparse": round(
                        1 - out.get("nolap:sparse", 0) / out["full:sparse"], 3
                    )
                    if out.get("full:sparse")
                    else None,
                    "enum_speedup_dense": round(
                        out["full:dense"] / out["enum:dense"], 2
                    )
                    if out.get("enum:dense")
                    else None,
                    "enum_speedup_mixed": round(
                        out["full:mixed"] / out["enum:mixed"], 2
                    )
                    if out.get("enum:mixed")
                    else None,
                    "stacked_speedup_dense": round(
                        out["full:dense"] / out["stacked:dense"], 2
                    )
                    if out.get("stacked:dense")
                    else None,
                    "enumstk_speedup_dense": round(
                        out["full:dense"] / out["enumstk:dense"], 2
                    )
                    if out.get("enumstk:dense")
                    else None,
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
