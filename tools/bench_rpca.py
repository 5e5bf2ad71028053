"""Microbenchmark for the batched IALM solver (the pipeline's hot kernel).

Times `ialm_rpca_batched` on crop-shaped synthetic windows on the CURRENT
backend (bare `python` = the real chip on this rig) and reports ms per
while-loop trip, which is the number to hold against the HBM traffic floor
(see CLAUDE.md: ~3 ms/trip of unavoidable (B,T,P)-array traffic at B=16 on
v5e).  Used to measure storage-dtype experiments (CLAUDE.md backlog #3).

Usage: python tools/bench_rpca.py [--batch 16] [--reps 5] [--variants ...]
"""

from __future__ import annotations

import argparse
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

import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.geometry import crop_region_from_corners
from swiftwatcher_tpu.io.synthetic import make_video
from swiftwatcher_tpu.ops.color import bgr_to_gray_host
from swiftwatcher_tpu.ops.rpca import ialm_rpca_batched


def make_batch(B: int):
    """Crop-shaped (B, 21, P) f32 batch from the standard synthetic scene,
    with per-window variety (shifted copies) so convergence is realistic."""
    cfg = DEFAULT_CONFIG
    video = make_video(seed=0, n_frames=63, H=1080, W=1920,
                       n_entering=2, n_crossing=1, n_vanishing=1)
    (x1, y1), (x2, y2) = crop_region_from_corners(video.corners, cfg)
    T = cfg.window_size
    wins = []
    for b in range(B):
        s = (b * 7) % (63 - T)
        wins.append(bgr_to_gray_host(video.frames[s : s + T, y1:y2, x1:x2, :]))
    gray = np.stack(wins)  # (B, T, H, W) u8
    X = gray.reshape(B, T, -1).astype(np.float32)
    return jax.device_put(X)


def time_variant(X, reps: int, **kw):
    cfg = DEFAULT_CONFIG
    kw.setdefault("lmbda", cfg.rpca_lambda)
    kw.setdefault("tol", cfg.rpca_tol)
    kw.setdefault("max_iter", cfg.rpca_max_iter)

    def run():
        A, E, iters = ialm_rpca_batched(X, **kw)
        # force full readback of a scalar derived from every output
        # (block_until_ready is a no-op on the axon backend)
        return (
            float(jnp.sum(jnp.abs(E[:, 0, :256].astype(jnp.float32)))),
            np.asarray(iters),
        )

    _, iters = run()  # compile
    trips = int(iters.max())
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    return dt, trips, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--variants",
        nargs="*",
        default=["production", "warm", "cold"],
        help="names: production (the shipped config, derived from "
        "ialm_gates_and_kwargs), cold, warm, warm-bf16all, ... (see VARIANTS)",
    )
    args = ap.parse_args()

    # the SHIPPED configuration, derived from the same gate helper the
    # pipeline uses (never hand-duplicate the knob plumbing here: it
    # drifted once — 'warm' alone is NOT the production default)
    import jax.numpy as jnp

    from swiftwatcher_tpu.config import DEFAULT_CONFIG
    from swiftwatcher_tpu.ops.rpca import ialm_gates_and_kwargs

    _, prod_kwargs = ialm_gates_and_kwargs(
        DEFAULT_CONFIG, jnp.dtype(DEFAULT_CONFIG.rpca_dtype)
    )
    prod = {
        k: v
        for k, v in prod_kwargs.items()
        if k in ("warm_basis", "fused_front", "x_store_dtype",
                 "store_y_dtype", "store_ae_dtype")
    }

    VARIANTS = {
        "production": prod,
        "warm": dict(warm_basis=True),
        "cold": dict(warm_basis=False),
        # storage-dtype experiments (CLAUDE.md backlog #3)
        "warm-x8": dict(warm_basis=True, x_store_dtype="uint8"),
        "warm-xbf16": dict(warm_basis=True, x_store_dtype="bfloat16"),
        "warm-ybf16": dict(warm_basis=True, store_y_dtype="bfloat16"),
        "warm-x8-ybf16": dict(
            warm_basis=True, x_store_dtype="uint8", store_y_dtype="bfloat16"
        ),
        "warm-bf16all": dict(
            warm_basis=True,
            x_store_dtype="uint8",
            store_y_dtype="bfloat16",
            store_ae_dtype="bfloat16",
        ),
    }

    X = make_batch(args.batch)
    B, T, P = X.shape
    pass_mb = B * T * P * 4 / 1e6
    print(f"# B={B} T={T} P={P}  one f32 (B,T,P) pass = {pass_mb:.0f} MB")

    base_iters = None
    for name in args.variants:
        kw = VARIANTS[name]
        try:
            dt, trips, iters = time_variant(X, args.reps, **kw)
        except TypeError as e:
            print(f"{name:>16}: unsupported ({e})")
            continue
        if base_iters is None:
            base_iters = iters
        drift = int(np.abs(iters.astype(int) - base_iters.astype(int)).max())
        print(
            f"{name:>16}: {dt*1e3:8.1f} ms total  {dt*1e3/trips:6.2f} ms/trip "
            f"({trips} trips, iter drift vs first variant: {drift})"
        )


if __name__ == "__main__":
    main()
