#!/usr/bin/env python
"""On-chip A/B: SqueezeNet forward at HIGHEST precision (shipped — bf16
drift flips near-tie argmaxes, models/squeezenet.py _conv note) vs a bf16
forward, interleaved same-process.  Decides whether a faster-forward
scheme (bf16 screen + HIGHEST re-run of near-ties) has a prize on the
classify path, and how much of the classify budget the CNN itself is.

Usage: python tools/cnn_forward_ab.py [--batch 384] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp

    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter
    from swiftwatcher_tpu.models.squeezenet import forward

    filt = SqueezeNetSegmentFilter.from_default_weights()
    params = filt.params
    params_bf16 = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (args.batch, 224, 224, 3)).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_f32(p, x, iters):
        def body(_, carry):
            y = forward(p, x + jnp.minimum(carry, 0.0))
            return jnp.minimum(jnp.sum(y), 1.0)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_bf16(p, x, iters):
        xb = x.astype(jnp.bfloat16)

        def body(_, carry):
            y = forward(p, xb + carry.astype(jnp.bfloat16) * 0)
            return jnp.minimum(jnp.sum(y).astype(jnp.float32), 1.0)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(run_f32(params, x, 2))
    float(run_bf16(params_bf16, x, 2))
    res = {}
    for rep in range(5):
        for name, fn, p in (("highest_f32", run_f32, params),
                            ("bf16", run_bf16, params_bf16)):
            t0 = time.perf_counter()
            float(fn(p, x, args.iters))
            dt = (time.perf_counter() - t0) / args.iters
            res.setdefault(name, []).append(dt * 1000)
    out = {k: round(min(v), 2) for k, v in res.items()}
    out["speedup"] = round(out["highest_f32"] / out["bf16"], 2)
    out["unit"] = f"ms per {args.batch}-image forward"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
