"""Minimal on-chip transfer-leak probe (SOAK_r05 follow-up).

The 30-min chip soak grew host RSS ~57 MB per run_video pass while the
identical workload on the CPU backend is flat (tools/leak_probe.py), so
the growth is in the axon backend, not the pipeline.  This probe removes
the pipeline entirely: loop `device_put(40 MB) -> jnp.sum -> readback`,
delete every reference, gc, and record RSS.  Growth here == the tunnel
PJRT client retains per-transfer host staging buffers (rig artifact);
flat here would point back at something pipeline-shaped.

Usage: python tools/leak_probe_chip.py [--iters 12] [--mb 40]
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--mb", type=int, default=40)
    args = ap.parse_args()

    import bench

    bench._arm_watchdog()
    if not bench.data_plane_preflight():
        print(json.dumps({"error": "preflight failed: tunnel outage"}))
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    n = args.mb * (1 << 20)
    host = np.arange(n, dtype=np.uint8)  # one reused host buffer
    print(json.dumps({"backend": jax.default_backend(),
                      "mb_per_iter": args.mb}), flush=True)
    for i in range(args.iters):
        dev = jax.device_put(host)
        s = int(jnp.sum(dev.astype(jnp.int32) & 1))  # force full materialize
        del dev
        gc.collect()
        print(json.dumps({"i": i, "rss_mb": _rss_mb(), "checksum": s}),
              flush=True)


if __name__ == "__main__":
    main()
