"""On-device tracking: the reference's per-frame tracker as a lax.scan.

The host tracker (tracking.py) is the strict-parity path; this module keeps
the whole loop on device — per-frame padded cost matrices, the jittable
Jonker-Volgenant LAP, track linking, ROI event tests — so multi-chip or
latency-sensitive deployments never synchronize per frame.

Cost-matrix layout over fixed capacity K = cfg.max_tracks (2K x 2K):
  row/col i < K   = previous-frame slot i,   row/col K+c = current slot c
  diag(i, i) = 1 for valid slots (non-match cost), 0 for padding slots
  match cell (p, K+c) = 0.5 * 2^(dist-25) + 0.5 * 2^(angle_diff-90)
  every other valid-valid cell = 1 + eps (the reference's "impossible"
  filler, segment_tracking.py:179-186 — these DO get assigned: each match
  forces one leftover row onto a filler column, so their value participates
  in the match/no-match trade-off and must be 1+eps, not a big sentinel)
  valid-vs-padding cells = BIG so padding stays on its free diagonal.

Exponents are clamped at cfg.cost_exp_clamp (any clamped entry already
dwarfs the alternatives in f32, so assignments are unchanged; avoids inf).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..ops.hungarian import solve_lap

# The reference adds float64 machine epsilon to 1.0 (segment_tracking.py:186);
# in float32 that literal rounds back to exactly 1.0, losing the strict
# "filler > diagonal" ordering — so use float32 machine epsilon instead.
_EPS32 = jnp.float32(1.1920929e-07)
_BIG = jnp.float32(1e9)


class TrackState(NamedTuple):
    cy: jnp.ndarray          # (K,) f32 previous-frame centroids
    cx: jnp.ndarray
    valid: jnp.ndarray       # (K,) bool
    hist_len: jnp.ndarray    # (K,) int32
    first_cy: jnp.ndarray    # (K,) f32 first centroid of the motion path
    first_cx: jnp.ndarray
    fn: jnp.ndarray          # () int32 previous frame number


class EventBuffer(NamedTuple):
    first_cy: jnp.ndarray    # (CAP,) f32
    first_cx: jnp.ndarray
    last_cy: jnp.ndarray
    last_cx: jnp.ndarray
    last_fn: jnp.ndarray     # (CAP,) int32
    count: jnp.ndarray       # () int32
    overflow: jnp.ndarray    # () bool


class _EvStacked(NamedTuple):
    """EventBuffer's four f32 columns as one (CAP, 4) array so the per-step
    event write is ONE f32 scatter + one int32 scatter instead of five
    (cfg.track_stacked_ops; layout converted at the track_window boundary,
    never visible to callers).  Column order: first_cy, first_cx, last_cy,
    last_cx."""
    f4: jnp.ndarray          # (CAP, 4) f32
    fn: jnp.ndarray          # (CAP,) int32
    count: jnp.ndarray       # () int32
    overflow: jnp.ndarray    # () bool


def _stack_events(ev: EventBuffer) -> _EvStacked:
    return _EvStacked(
        f4=jnp.stack([ev.first_cy, ev.first_cx, ev.last_cy, ev.last_cx], -1),
        fn=ev.last_fn, count=ev.count, overflow=ev.overflow,
    )


def _unstack_events(ev) -> EventBuffer:
    if isinstance(ev, EventBuffer):
        return ev
    return EventBuffer(
        first_cy=ev.f4[:, 0], first_cx=ev.f4[:, 1],
        last_cy=ev.f4[:, 2], last_cx=ev.f4[:, 3],
        last_fn=ev.fn, count=ev.count, overflow=ev.overflow,
    )


def empty_state(K: int) -> TrackState:
    z = jnp.zeros((K,), jnp.float32)
    return TrackState(
        cy=z, cx=z, valid=jnp.zeros((K,), bool),
        hist_len=jnp.zeros((K,), jnp.int32), first_cy=z, first_cx=z,
        fn=jnp.asarray(-1, jnp.int32),
    )


def empty_events(cap: int) -> EventBuffer:
    z = jnp.zeros((cap,), jnp.float32)
    return EventBuffer(
        first_cy=z, first_cx=z, last_cy=z, last_cx=z,
        last_fn=jnp.zeros((cap,), jnp.int32),
        count=jnp.asarray(0, jnp.int32), overflow=jnp.asarray(False),
    )


def _match_block(state: TrackState, cy, cx, cfg: PipelineConfig):
    """(K, K) f32 match costs 0.5*d_cost + 0.5*a_cost for every (prev slot,
    curr slot) pair, validity-agnostic (callers mask)."""
    clamp = jnp.float32(cfg.cost_exp_clamp)

    d = jnp.sqrt(
        (state.cy[:, None] - cy[None, :]) ** 2
        + (state.cx[:, None] - cx[None, :]) ** 2
    )
    d_cost = jnp.exp2(jnp.minimum(d - cfg.dist_cost_knee, clamp))

    deg = jnp.float32(180.0 / jnp.pi)
    old_angle = deg * jnp.arctan2(
        state.first_cy - state.cy, -(state.first_cx - state.cx)
    )
    new_angle = deg * jnp.arctan2(
        state.cy[:, None] - cy[None, :], -(state.cx[:, None] - cx[None, :])
    )
    diff = jnp.abs(new_angle - old_angle[:, None])
    diff = jnp.minimum(diff, 360.0 - diff)
    a_cost = jnp.where(
        (state.hist_len > 0)[:, None],
        jnp.exp2(jnp.minimum(diff - cfg.angle_cost_knee, clamp)),
        1.0,
    )
    return (0.5 * d_cost + 0.5 * a_cost).astype(jnp.float32)


def _cost_matrix(state: TrackState, cy, cx, valid, cfg: PipelineConfig):
    K = state.cy.shape[0]
    match = _match_block(state, cy, cx, cfg)

    pv, cv = state.valid, valid
    rv = jnp.concatenate([pv, cv])                      # row validity (2K,)
    filler = jnp.float32(cfg.nonmatch_cost) + _EPS32
    both_valid = rv[:, None] & rv[None, :]
    cost = jnp.where(both_valid, filler, _BIG)
    # match block (prev rows, curr cols)
    mblock = jnp.where(pv[:, None] & cv[None, :], match.astype(jnp.float32), _BIG)
    cost = cost.at[:K, K:].set(jnp.where(both_valid[:K, K:], mblock, _BIG))
    # diagonal: non-match cost for valid slots, free parking for padding
    diag = jnp.where(rv, jnp.float32(cfg.nonmatch_cost), 0.0)
    n2 = 2 * K
    eye = jnp.eye(n2, dtype=bool)
    cost = jnp.where(eye, diag[None, :] * jnp.ones((n2, 1)), cost)
    return cost


@functools.lru_cache(maxsize=None)
def _pattern_table(n: int) -> np.ndarray:
    """All partial matchings of n rows onto n columns, as (num_patterns, n)
    int32 rows of matched-column-or−1.  Sizes: n=3 → 34, 4 → 209, 5 → 1546,
    6 → 13327; larger n is rejected (the table would dwarf the LAP it
    replaces)."""
    if n > 6:
        raise ValueError(f"enum LAP pattern table capped at n=6 (got {n})")
    pats: list[list[int]] = []

    def rec(row: int, used: int, cur: list[int]) -> None:
        if row == n:
            pats.append(cur)
            return
        rec(row + 1, used, cur + [-1])
        for c in range(n):
            if not (used >> c) & 1:
                rec(row + 1, used | (1 << c), cur + [c])

    rec(0, 0, [])
    return np.asarray(pats, np.int32)


@functools.lru_cache(maxsize=None)
def _pattern_onehot(n: int) -> np.ndarray:
    """(num_patterns, n, n) f32 one-hot of _pattern_table: [q, p, c] = 1 iff
    pattern q matches prev slot p to curr slot c (all-zero row for −1).
    Scoring contracts this against the weight block as a multiply-reduce —
    TPU gathers cost ~1.25 ns/element, so indexing the weights per frame
    inside the scan would dominate the enum step."""
    pats = _pattern_table(n)
    return (pats[:, :, None] == np.arange(n)[None, None, :]).astype(np.float32)


def _prev_match_lap(state: TrackState, cy, cx, valid, cfg: PipelineConfig):
    """(K,) int32: current-slot index matched to each previous slot (−1 if
    unmatched), via the full padded JV solve."""
    K = state.cy.shape[0]
    cost = _cost_matrix(state, cy, cx, valid, cfg)
    # padding rows/cols sit on a free diagonal: pre-assign them so the LAP's
    # augment cost scales with the REAL segment count, not the capacity
    # (exact — see solve_lap's docstring)
    col4row = solve_lap(cost, skip=~jnp.concatenate([state.valid, valid]))
    match_col = col4row[:K] - K                                   # (K,)
    return jnp.where(
        state.valid
        & (match_col >= 0)
        & jnp.take(valid, jnp.clip(match_col, 0, K - 1)),
        match_col,
        -1,
    )


def _prev_match_enum(state: TrackState, cy, cx, valid, cfg: PipelineConfig, n: int):
    """Enumeration LAP for frames with ≤ n live tracks AND ≤ n segments, all
    in the first n slots (callers guarantee this; compacted tables are
    valid-prefix).

    The padded 2K×2K assignment decomposes exactly: a matching M costs
      Σ_{(p,c)∈M} m(p,c) + |M|·(nonmatch+eps) + (P+C−2|M|)·nonmatch
    (each match consumes one filler cell — the displaced current row parks on
    the freed previous column — and every unmatched slot sits on its diagonal;
    fillers strictly beat diagonals nowhere, so this arrangement is optimal
    for any M).  Minimizing over M is a min-weight bipartite matching with
    edge weight w(p,c) = m(p,c) + eps − nonmatch, and for n ≤ 4 all 209
    partial matchings can be scored in one vectorized pass — no sequential
    Dijkstra.  Invalid pairs carry weight _BIG: any pattern touching one
    scores ≥ 1e9 − n > 0 ≥ the empty pattern, so it can never win (a chosen
    edge must improve on unmatched, i.e. have w < 0).  Tie-breaking between
    equal-cost (or one-f32-ulp near-tie) optima may differ from JV's —
    measure-zero on float centroids, reachable on integer-snapped
    duplicates; both resolutions are optimal within f32 rounding
    (PARITY.md deviation 10, test_enum_lap_ties_are_optimal)."""
    K = state.cy.shape[0]
    sub = TrackState(
        cy=state.cy[:n], cx=state.cx[:n], valid=state.valid[:n],
        hist_len=state.hist_len[:n], first_cy=state.first_cy[:n],
        first_cx=state.first_cx[:n], fn=state.fn,
    )
    m = _match_block(sub, cy[:n], cx[:n], cfg)                    # (n, n)
    w = m + (_EPS32 - jnp.float32(cfg.nonmatch_cost))
    pair_ok = sub.valid[:, None] & valid[None, :n]
    w = jnp.where(pair_ok, w, _BIG)
    oh = jnp.asarray(_pattern_onehot(n))                          # (P, n, n)
    scores = jnp.sum(oh * w[None, :, :], axis=(1, 2))             # (P,)
    best = jnp.argmin(scores)
    pat = jnp.asarray(_pattern_table(n))                          # (P, n)
    return jnp.concatenate(
        [pat[best], jnp.full((K - n,), -1, jnp.int32)]
    )


def _step_full(carry, inputs, roi_mask, cfg: PipelineConfig):
    state, events = carry
    cy, cx, valid, fn, active = inputs
    K = state.cy.shape[0]

    n_enum = int(getattr(cfg, "track_enum_lap", 0))
    if 0 < n_enum < K:
        fits = ~(jnp.any(state.valid[n_enum:]) | jnp.any(valid[n_enum:]))
        prev_match = jax.lax.cond(
            fits,
            lambda: _prev_match_enum(state, cy, cx, valid, cfg, n_enum),
            lambda: _prev_match_lap(state, cy, cx, valid, cfg),
        )
    else:
        prev_match = _prev_match_lap(state, cy, cx, valid, cfg)
    disappeared = state.valid & (prev_match < 0)

    # inverse map: which prev slot matched each curr slot (-1 if none)
    scatter_idx = jnp.where(prev_match >= 0, prev_match, K)       # K = dump slot
    curr_from = jnp.zeros((K + 1,), jnp.int32).at[scatter_idx].set(
        jnp.arange(K, dtype=jnp.int32) + 1
    )[:K] - 1                                                     # -1 if none

    # ---- events: disappeared inside ROI with history ----------------------
    Hm, Wm = roi_mask.shape
    iy = jnp.clip(state.cy.astype(jnp.int32), 0, Hm - 1)
    ix = jnp.clip(state.cx.astype(jnp.int32), 0, Wm - 1)
    in_roi = roi_mask.reshape(-1)[iy * Wm + ix] == 255
    is_event = disappeared & in_roi & (state.hist_len >= 1)

    stacked = bool(getattr(cfg, "track_stacked_ops", False))
    cap = (events.f4 if stacked else events.first_cy).shape[0]
    ev_first_cy = jnp.where(state.hist_len > 0, state.first_cy, state.cy)
    ev_first_cx = jnp.where(state.hist_len > 0, state.first_cx, state.cx)
    # event slot k lands at count + (its rank among events in ascending slot
    # order) — the cumsum IS that rank, so no argsort/permutation is needed
    # (sorts are multi-pass networks on TPU and this runs per scan step);
    # placement is identical to compacting events first and appending
    n_ev = jnp.sum(is_event).astype(jnp.int32)
    pos = events.count + jnp.cumsum(is_event) - 1                 # (K,)
    write = is_event & (pos < cap)
    slot = jnp.where(write, pos, cap)                             # cap = dump

    if stacked:
        # one (cap+1, 4) f32 scatter + one int32 scatter (backlog 0: the
        # five per-step scatters stacked into two; values identical)
        vals4 = jnp.stack([ev_first_cy, ev_first_cx, state.cy, state.cx], -1)
        ext4 = jnp.concatenate([events.f4, jnp.zeros((1, 4), jnp.float32)])
        extf = jnp.concatenate(
            [events.fn, jnp.zeros((1,), jnp.int32)]
        )
        events = _EvStacked(
            f4=ext4.at[slot].set(vals4)[:cap],
            fn=extf.at[slot].set(jnp.full((K,), state.fn, jnp.int32))[:cap],
            count=jnp.minimum(events.count + n_ev, cap),
            overflow=events.overflow | (events.count + n_ev > cap),
        )
    else:
        def scatter(buf, vals):
            ext = jnp.concatenate([buf, jnp.zeros((1,), buf.dtype)])
            return ext.at[slot].set(vals.astype(buf.dtype))[:cap]

        events = EventBuffer(
            first_cy=scatter(events.first_cy, ev_first_cy),
            first_cx=scatter(events.first_cx, ev_first_cx),
            last_cy=scatter(events.last_cy, state.cy),
            last_cx=scatter(events.last_cx, state.cx),
            last_fn=scatter(events.last_fn, jnp.full((K,), state.fn)),
            count=jnp.minimum(events.count + n_ev, cap),
            overflow=events.overflow | (events.count + n_ev > cap),
        )

    # ---- link: new state from current segments ----------------------------
    has_prev = curr_from >= 0
    p = jnp.clip(curr_from, 0, K - 1)
    if stacked:
        # one (K, 5) row gather replaces five (K,) gathers at the same
        # indices; the int32 hist_len rides a bitcast (value-exact — the
        # bits never pass through an f32 arithmetic op)
        src = jnp.stack(
            [
                jax.lax.bitcast_convert_type(state.hist_len, jnp.float32),
                state.first_cy, state.first_cx, state.cy, state.cx,
            ],
            -1,
        )                                                         # (K, 5)
        g = src[p]
        hist_p = jax.lax.bitcast_convert_type(g[:, 0], jnp.int32)
        first_cy_p, first_cx_p = g[:, 1], g[:, 2]
        cy_p, cx_p = g[:, 3], g[:, 4]
    else:
        hist_p = state.hist_len[p]
        first_cy_p, first_cx_p = state.first_cy[p], state.first_cx[p]
        cy_p, cx_p = state.cy[p], state.cx[p]
    new_hist = jnp.where(has_prev & valid, hist_p + 1, 0)
    pf_cy = jnp.where(hist_p > 0, first_cy_p, cy_p)
    pf_cx = jnp.where(hist_p > 0, first_cx_p, cx_p)
    new_state = TrackState(
        cy=cy, cx=cx, valid=valid,
        hist_len=new_hist,
        first_cy=jnp.where(has_prev & valid, pf_cy, 0.0),
        first_cx=jnp.where(has_prev & valid, pf_cx, 0.0),
        fn=fn,
    )
    # inactive frames (batch padding beyond the video's last real window)
    # must be complete no-ops — the reference's loop never runs them
    new_state, events = jax.tree.map(
        lambda new, old: jnp.where(active, new, old),
        (new_state, events),
        carry,
    )
    return (new_state, events), None


def _step(carry, inputs, roi_mask, cfg: PipelineConfig):
    """Per-frame tracker step with an empty-frame fast path.

    Surveillance footage is mostly empty sky: when the frame carries no
    segments AND no track survives from the previous frame, the full step
    (cost matrix, LAP, event scatter) reduces to 'reset the state to this
    frame' — a lax.cond skips all of it.  The full branch is bit-identical
    to always running _step_full (with nothing valid, it computes exactly
    this reset)."""
    state, events = carry
    cy, cx, valid, fn, active = inputs

    def empty(carry, inputs):
        state, events = carry
        cy, cx, valid, fn, active = inputs
        K = state.cy.shape[0]
        zero = jnp.zeros((K,), jnp.float32)
        st = TrackState(
            cy=cy, cx=cx, valid=valid,
            hist_len=jnp.zeros((K,), jnp.int32),
            first_cy=zero, first_cx=zero, fn=fn,
        )
        st = jax.tree.map(
            lambda new, old: jnp.where(active, new, old), st, state
        )
        return (st, events), None

    any_work = jnp.any(state.valid) | jnp.any(valid)
    return jax.lax.cond(
        any_work,
        lambda c, i: _step_full(c, i, roi_mask, cfg),
        empty,
        carry,
        inputs,
    )


# Default frames per outer scan step (1 = plain per-frame scan).  Chunking
# lets stretches of empty sky (no live tracks, no segments) skip a whole
# chunk in ONE cond instead of paying per-frame scan-step overhead —
# measured on v5e at chunk=8: all-empty 5.1 -> 3.5 ms per 336-frame batch,
# but the dense synthetic bench scene 17.7 -> 19.7 ms (most chunks have
# work, so the chunk cond is pure overhead).  Default stays per-frame; set
# cfg.track_scan_chunk=8 for sparse real footage.
_SCAN_CHUNK = 1


@functools.partial(jax.jit, static_argnames=("cfg", "chunk"))
def track_window(
    state: TrackState,
    roi_mask: jnp.ndarray,
    cys: jnp.ndarray,      # (T, K) f32
    cxs: jnp.ndarray,
    valids: jnp.ndarray,   # (T, K) bool
    fns: jnp.ndarray,      # (T,) int32
    cfg: PipelineConfig = DEFAULT_CONFIG,
    active: jnp.ndarray | None = None,   # (T,) bool; False = no-op frame
    chunk: int = _SCAN_CHUNK,
) -> Tuple[TrackState, EventBuffer]:
    """Scan the tracker over one window's compacted segment tables.

    The scan runs `chunk` frames per outer step; a chunk with no live
    tracks and no segments reduces to 'reset the state to its last active
    frame' (exactly what running the per-frame steps would compute — the
    per-step empty path's argument applied chunk-wise), so empty-sky
    footage costs one cond per chunk.  chunk=1 is the plain per-frame
    scan; outputs are identical for any chunk (tested)."""
    T = cys.shape[0]
    events = empty_events(cap=4 * T)
    if getattr(cfg, "track_stacked_ops", False):
        events = _stack_events(events)   # carry layout only; callers see
        # EventBuffer either way (unstacked below)
    if active is None:
        active = jnp.ones(T, bool)

    def f(carry, inp):
        return _step(carry, inp, roi_mask, cfg)

    if chunk <= 1 or T < chunk:
        (state, events), _ = jax.lax.scan(
            f, (state, events), (cys, cxs, valids, fns, active)
        )
        return state, _unstack_events(events)

    pad = (-T) % chunk
    if pad:
        # inactive padding frames are exact no-ops (the active-mask
        # machinery the batch padding already relies on)
        zf = jnp.zeros((pad, cys.shape[1]), cys.dtype)
        cys = jnp.concatenate([cys, zf])
        cxs = jnp.concatenate([cxs, zf])
        valids = jnp.concatenate(
            [valids, jnp.zeros((pad, valids.shape[1]), bool)]
        )
        fns = jnp.concatenate([fns, jnp.full((pad,), -1, jnp.int32)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    n_chunks = (T + pad) // chunk
    K = cys.shape[1]

    def chunk_step(carry, inp):
        ccy, ccx, cval, cfns, cact = inp
        st, ev = carry
        any_work = jnp.any(st.valid) | jnp.any(cval & cact[:, None])

        def full(c):
            (s, e), _ = jax.lax.scan(f, c, inp)
            return s, e

        def empty(c):
            s, e = c
            # running the per-frame steps here would, at each ACTIVE frame,
            # reset the state to that frame (valid all-False, hist 0,
            # first 0) and leave events untouched — so the chunk collapses
            # to a reset at its LAST active frame (no-op if none active)
            has_active = jnp.any(cact)
            last = (chunk - 1) - jnp.argmax(jnp.flip(cact))
            zero = jnp.zeros((K,), jnp.float32)
            st_new = TrackState(
                cy=ccy[last], cx=ccx[last], valid=cval[last],
                hist_len=jnp.zeros((K,), jnp.int32),
                first_cy=zero, first_cx=zero, fn=cfns[last],
            )
            s = jax.tree.map(
                lambda new, old: jnp.where(has_active, new, old), st_new, s
            )
            return s, e

        return jax.lax.cond(any_work, full, empty, carry), None

    chunked = lambda a: a.reshape(n_chunks, chunk, *a.shape[1:])
    (state, events), _ = jax.lax.scan(
        chunk_step,
        (state, events),
        (chunked(cys), chunked(cxs), chunked(valids), chunked(fns), chunked(active)),
    )
    return state, _unstack_events(events)


@functools.partial(jax.jit, static_argnames=("K", "with_bbox"))
def compact_tables(table, K: int, with_bbox: bool = False):
    """RegionTable (..., 256) -> top-K valid slots in ascending label order:
    (cys, cxs, valids, overflow) with shapes (..., K).

    with_bbox additionally returns (min_y, min_x, max_y, max_x) compacted
    the same way — the classify fast path reads THESE back instead of the
    full 256-slot table (~20x fewer readback bytes on a slow host link).

    The valid-first stable order is a cumsum-rank scatter, not a sort:
    valid slot i lands at rank(valid)_i - 1, invalid slot i at
    n_valid + rank(invalid)_i - 1 — exactly stable argsort(~valid)'s
    placement by construction (the same sort-removal argument as the
    scan's event compaction and JV valid_order; sorts are multi-pass
    networks on TPU and this runs on every (B, T) frame)."""
    valid = table.valid
    n = valid.shape[-1]
    idx = jnp.arange(n, dtype=jnp.int32)
    nv = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    n_valid = nv[..., -1:]
    pos = jnp.where(valid, nv - 1, n_valid + (idx - nv))
    order_full = jnp.zeros(valid.shape, jnp.int32)
    order_full = jnp.put_along_axis(
        order_full, pos, jnp.broadcast_to(idx, valid.shape), axis=-1,
        inplace=False,
    )
    order = order_full[..., :K]
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    kvalid = take(valid)
    area = jnp.maximum(take(table.area), 1).astype(jnp.float32)
    cy = take(table.sum_y).astype(jnp.float32) / area
    cx = take(table.sum_x).astype(jnp.float32) / area
    overflow = jnp.sum(valid, axis=-1) > K
    if with_bbox:
        bbox = tuple(
            take(a) for a in (table.min_y, table.min_x, table.max_y, table.max_x)
        )
        return cy, cx, kvalid, overflow, bbox
    return cy, cx, kvalid, overflow
