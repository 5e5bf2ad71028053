"""On-chip A/B: compact_tables cumsum-rank scatter vs the old stable
argsort, interleaved same-process (clock-mood rule).  Measured r4 on chip:
rank 0.935 ms vs argsort 1.036 ms per (32,21,256) compact (1.11x; the
rank path is shipped, bit-identical by construction + test).  Times the full
resident_tracked-style composition granularity: compact over (B,T,256)
tables, B=32, T=21."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import functools

from swiftwatcher_tpu.ops.props import RegionTable
from swiftwatcher_tpu.pipeline.tracking_jax import compact_tables

B, T, N, K = 32, 21, 256, 24
rng = np.random.default_rng(0)
valid = rng.random((B, T, N)) < 0.02
mk = lambda: jnp.asarray(rng.integers(0, 99, (B, T, N)).astype(np.int32))
tb = RegionTable(
    area=jnp.asarray((rng.integers(1, 50, (B, T, N)) * valid).astype(np.int32)),
    sum_y=mk(), sum_x=mk(), min_y=mk(), min_x=mk(), max_y=mk(), max_x=mk(),
    valid=jnp.asarray(valid),
)


@functools.partial(jax.jit, static_argnames=("K",))
def compact_argsort(table, K):
    valid = table.valid
    order = jnp.argsort(~valid, axis=-1, stable=True)[..., :K]
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    kvalid = take(valid)
    area = jnp.maximum(take(table.area), 1).astype(jnp.float32)
    cy = take(table.sum_y).astype(jnp.float32) / area
    cx = take(table.sum_x).astype(jnp.float32) / area
    overflow = jnp.sum(valid, axis=-1) > K
    return cy, cx, kvalid, overflow


@functools.partial(jax.jit, static_argnames=("fn_tag", "K", "iters"))
def loop(fn_tag, table, K, iters):
    def body(_, carry):
        t2 = RegionTable(**{
            f: (getattr(table, f) + jnp.minimum(carry, 0).astype(getattr(table, f).dtype))
            if f != "valid" else getattr(table, f)
            for f in ("area", "sum_y", "sum_x", "min_y", "min_x", "max_y", "max_x", "valid")
        })
        if fn_tag == 1:
            cy, cx, kv, ov = compact_tables(t2, K)[:4]
        else:
            cy, cx, kv, ov = compact_argsort(t2, K)
        return jnp.minimum(jnp.sum(cy).astype(jnp.int32) + jnp.sum(kv), 1)
    return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

ITERS = 50
for tag in (1, 0):
    int(loop(tag, tb, K, 2))  # compile
res = {}
for rep in range(6):
    for tag, name in ((1, "rank"), (0, "argsort")):
        t0 = time.perf_counter()
        int(loop(tag, tb, K, ITERS))
        dt = (time.perf_counter() - t0) / ITERS
        res.setdefault(name, []).append(dt * 1000)
import json
out = {k: round(min(v), 3) for k, v in res.items()}
out["speedup"] = round(out["argsort"] / out["rank"], 3)
out["unit"] = "ms per (32,21,256) compact"
print(json.dumps(out))
