"""Axon tunnel liveness probe.

Distinguishes (per CLAUDE.md rig notes) a full tunnel outage from a compile
brownout: a plain device_put + np.asarray round trip needs no compile; a tiny
fresh jit exercises the remote compile service.  Writes one status line to
stdout and exits 0 (live), 2 (data plane dead), 3 (data OK, compile dead).

Run under `timeout` from the shell; jax on axon can hang indefinitely.
"""
import sys
import time


def main() -> int:
    import numpy as np
    import jax

    t0 = time.time()
    try:
        x = jax.device_put(np.arange(8, dtype=np.float32))
        v = float(np.asarray(x).sum())
    except Exception as e:  # noqa: BLE001 - report any transport failure
        print(f"DATA_DEAD {type(e).__name__}: {e}")
        return 2
    t_data = time.time() - t0
    t0 = time.time()
    try:
        # salt the program with the pid so the remote compile cache can't
        # serve it; we want to probe the compile service, not the cache
        salt = float(1 + (int(sys.argv[1]) if len(sys.argv) > 1 else 0) % 97)
        y = jax.jit(lambda a: a * salt + 1)(x)
        float(np.asarray(y).sum())
    except Exception as e:  # noqa: BLE001
        print(f"COMPILE_DEAD data={t_data:.1f}s {type(e).__name__}: {e}")
        return 3
    t_comp = time.time() - t0
    print(f"LIVE data={t_data:.1f}s compile={t_comp:.1f}s v={v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
