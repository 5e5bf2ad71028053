"""Cheap long-axis prefix sums for TPU.

XLA lowers `jnp.cumsum` over a 93k-element axis to O(log n) full-array
passes — measured 47.5 ms for a (672, 93312) int32 mask cumsum on v5e,
versus 6.1 ms for the same result computed hierarchically (short int16
cumsums within fixed-size groups + an int32 cumsum of group totals).
Used by the CCL rank compaction (ops/ccl.py) and the delta6 wire decode's
escape-ordinal recovery (io/wirecodec.py), whose row cumsums dominated
their stages.
"""

from __future__ import annotations

import jax.numpy as jnp

_GROUP = 1024


def _group_len(P: int) -> int:
    """Largest divisor of P in [256, 4096] (no pad copy), else _GROUP."""
    best = 0
    for L in range(256, min(4096, P) + 1):
        if P % L == 0:
            best = L
    return best or _GROUP


def rowwise_mask_cumsum(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int32 cumsum of a 0/1 mask over the LAST axis, two-level.

    mask: (..., P) bool or {0,1} integer.  Exactly equals
    jnp.cumsum(mask.astype(int32), axis=-1) (tested), ~8x cheaper on TPU
    for P ~ 1e5: the inner cumsum runs int16 over short groups (counts
    fit — group length <= 4096 < 32768), the outer over the group totals.
    Group length prefers an exact divisor of P so no pad copy is paid.
    """
    *lead, P = mask.shape
    L = _group_len(P)
    pad = (-P) % L
    m = mask.astype(jnp.int16)
    if pad:
        m = jnp.pad(m, [(0, 0)] * len(lead) + [(0, pad)])
    G = (P + pad) // L
    x = m.reshape(*lead, G, L)
    inner = jnp.cumsum(x, axis=-1)
    tot = inner[..., -1].astype(jnp.int32)
    offs = jnp.cumsum(tot, axis=-1) - tot
    out = (inner.astype(jnp.int32) + offs[..., None]).reshape(*lead, P + pad)
    return out[..., :P] if pad else out
