"""Connected-component labeling on TPU.

Replaces the reference's per-frame cv2.connectedComponents call
(image_filtering.py:325-329) — the stage its author marked "CPU processing
bottleneck" (__main__.py:78) — with a batched, jittable label-propagation
kernel over the whole (T, H, W) window:

  * init: every foreground pixel's label = its linear raster index
  * TPU fast path: the ENTIRE realistic-scene CCL (label seed + S min
    sweeps + root-ranking raster cumsum + rank seed + S more sweeps + a
    convergence certificate) runs as ONE VMEM-resident Pallas pass
    (ops/pallas/rank_compact.py:label_rank_fused); frames whose
    components are deeper than S sweeps recompute through the chunked
    machinery below — bit-identical labels for ANY input
  * fallback converge: chunked in-VMEM sweep kernels (ccl_sweep.py), the
    whole-frame scan-flood kernel (ccl_local.py — O(direction changes)
    super-sweeps), and on non-TPU backends 8-neighborhood min-pools plus
    pointer-jumping (path-halving) gathers
  * fallback compact: a component's root is its minimum linear index ==
    its first raster-scan pixel, so ranking roots by a per-frame
    cumulative sum and flooding ranks back yields labels 1..N in
    raster-first-occurrence order.

Connectivity is 8 — the reference passes `4` positionally into the *labels*
output slot of the cv2 binding, so its effective connectivity is the default
8 (verified empirically; SURVEY.md §2.1).

Numbering note: OpenCV's block-based union-find occasionally numbers
components out of raster order; we use strict raster-first-occurrence. The
pixel partition is identical; only label values may permute within a frame,
which downstream tracking is invariant to (costs are pairwise).  The
reference then casts labels to uint8 (aliasing components ≥ 256, label 256
collapsing into background); `wrap_labels_uint8` reproduces that.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _min_pool_8(lbl: jnp.ndarray, sentinel: float) -> jnp.ndarray:
    """3x3 min over the trailing two dims, borders padded with sentinel.

    Implemented as an elementwise min of nine shifted slices (XLA fuses them
    into one VPU pass) — measured much faster than lax.reduce_window for
    this access pattern on TPU."""
    pad = [(0, 0)] * (lbl.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(lbl, pad, mode="constant", constant_values=sentinel)
    H, W = lbl.shape[-2], lbl.shape[-1]
    ax_h, ax_w = lbl.ndim - 2, lbl.ndim - 1
    out = None
    for dy in range(3):
        row = jax.lax.slice_in_dim(p, dy, dy + H, axis=ax_h)
        for dx in range(3):
            s = jax.lax.slice_in_dim(row, dx, dx + W, axis=ax_w)
            out = s if out is None else jnp.minimum(out, s)
    return out


@functools.partial(
    jax.jit, static_argnames=("max_iters", "use_pallas", "interpret")
)
def label_components(
    fg: jnp.ndarray,
    max_iters: int = 256,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label 8-connected foreground components of a (T, H, W) bool batch.

    Returns (labels, counts): labels is int32 (T, H, W) with background 0 and
    components numbered 1..N per frame in raster-first-occurrence order;
    counts is (T,) int32 per-frame component totals.

    interpret=True runs every Pallas kernel in interpreter mode so the
    full TPU fast/slow integration (fused kernel, flag decode, fallback
    chain) is exercisable on CPU in CI (use with use_pallas=True).

    Two-phase propagation: XLA gathers are expensive on TPU (~10 ms per
    (T, P) take_along_axis at this size) while 3x3 min-pools are cheap, and
    swift blobs have tiny diameters — so phase 1 is gather-free pool-only
    flooding (converges in ~diameter sweeps), and only if that hasn't
    converged does phase 2 add pointer-jumping (path halving) per sweep for
    pathological snake-like components, giving O(log diameter) there.
    """
    T, H, W = fg.shape
    P = H * W
    # Labels propagate as float32: linear indices < 2^24 are exact in f32,
    # and f32 min/compare is the VPU-native fast path (int32 is not).
    assert P < (1 << 24), "crop too large for exact f32 label propagation"
    sentinel = float(P)

    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 1) * W
        + jax.lax.broadcasted_iota(jnp.int32, (T, H, W), 2)
    )
    lbl0 = jnp.where(fg, idx.astype(jnp.float32), jnp.float32(sentinel))
    # Pools per convergence check (checks cost a full reduction).  Swept on
    # v5e with the separable sweep kernel at 672x216x432 (realistic blobs):
    # 2 -> 19.7 ms, 3 -> 16.6, 4 -> 16.8, 6 -> 18.1, 8 -> 19.3, 12 -> 21.7;
    # 4 balances wasted post-convergence sweeps against check overhead.
    CHUNK = 4
    phase1_iters = min(24, max_iters)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # Whole-frame in-VMEM convergence (ops/pallas/ccl_local.py): the frame is
    # the 'block' of block-local CCL, flooded to its exact fixpoint with
    # segmented scans — no HBM traffic between sweeps, no gathers.  Budget:
    # label + fg + scan temps, ~8 live f32 copies, against ~16 MB VMEM.
    local_kernel = use_pallas and H * W * 4 * 8 <= 12 * (1 << 20)

    def pool_chunk(lbl):
        if use_pallas:
            # K sweeps per HBM round trip (VMEM-resident between sweeps)
            from .pallas.ccl_sweep import sweep_chunk

            return sweep_chunk(lbl, fg, CHUNK, sentinel, interpret=interpret)
        for _ in range(CHUNK):
            pooled = _min_pool_8(lbl, sentinel)
            lbl = jnp.where(fg, jnp.minimum(lbl, pooled), sentinel)
        return lbl

    # Sentinel row appended so background/sentinel gathers stay in range.
    def jump(lbl_flat):
        ext = jnp.concatenate(
            [lbl_flat, jnp.full((T, 1), jnp.float32(sentinel))], axis=1
        )
        return jnp.take_along_axis(ext, lbl_flat.astype(jnp.int32), axis=1)

    def rank_gather(lbl, ranks):
        """Exact compaction of a CONVERGED label image by one gather:
        rank_map[p] = ranks[lbl[p]] (background sentinel hits the appended
        zero column).  Expensive on TPU (~80 ms/672f) — last-resort path
        for components the floods could not finish."""
        ext = jnp.concatenate([ranks, jnp.zeros((T, 1), jnp.int32)], axis=1)
        g = jnp.take_along_axis(
            ext, lbl.astype(jnp.int32).reshape(T, P), axis=1
        )
        return g.reshape(T, H, W).astype(jnp.float32)

    def phase1_body(state):
        lbl, _, it = state
        new = pool_chunk(lbl)
        return new, jnp.any(new != lbl), it + CHUNK

    def phase2_body(state):
        # Counts ONE unit per round (not CHUNK): the round's pools+jump are
        # a single halving step of the pointer forest, and charging CHUNK
        # against max_iters quartered the jump budget — a (216, 432) dense
        # speckle needs 77 rounds (measured) and was splitting one giant
        # serpentine component at the 64-round cap.  The operator is
        # monotone decreasing, so max_iters rounds is a safety bound, not
        # a semantic knob.
        lbl, _, it = state
        cand = pool_chunk(lbl)
        flat = jump(cand.reshape(T, P))
        new = jnp.where(fg, flat.reshape(T, H, W), sentinel)
        return new, jnp.any(new != lbl), it + 1

    def cond(limit):
        def _c(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < limit)
        return _c

    def verify_fixpoint(lbl):
        # one cheap XLA pool pass: True if another sweep would still change
        new = jnp.where(fg, jnp.minimum(lbl, _min_pool_8(lbl, sentinel)), sentinel)
        return jnp.any(new != lbl)

    def settle(lbl, changed):
        """Finish a partially-flooded label image exactly.

        Phase 1 (batched pool chunks) handles blob-like components — the
        only shapes real scenes produce — at full batch throughput; this
        runs ONLY when phase 1 hit its sweep budget.  On TPU the finisher
        is the whole-frame in-VMEM kernel (exact fixpoint, O(direction
        changes) super-sweeps, no gathers); elsewhere it is the
        pool+pointer-jump loop.  A zero-iteration phase-2 while_loop after
        the kernel insures against a kernel max_iters cap."""
        if local_kernel:
            from .pallas.ccl_local import converge_frames

            lbl = jax.lax.cond(
                changed,
                lambda l: converge_frames(
                    l, fg, max_iters, sentinel, interpret=interpret
                ),
                lambda l: l,
                lbl,
            )
            changed = jax.lax.cond(
                changed, verify_fixpoint, lambda l: jnp.asarray(False), lbl
            )
        lbl, _, _ = jax.lax.while_loop(
            cond(max_iters), phase2_body, (lbl, changed, jnp.asarray(0, jnp.int32))
        )
        return lbl

    if local_kernel:
        # The ENTIRE realistic-scene CCL — label seed + S sweeps + root
        # ranking cumsum + rank seed + S sweeps — runs as ONE VMEM-resident
        # Pallas pass (ops/pallas/rank_compact.py:label_rank_fused),
        # replacing the chunked label flood (init ~4 ms + ~12 ms/672f), the
        # (T, P) cumsum (~9 ms) and the chunked rank flood (~16 ms).  The
        # label and rank floods are isomorphic (one min propagating from
        # the component's unique root per sweep), so the kernel's own
        # label-fixpoint certificate covers the rank map too; frames with
        # components deeper than S sweeps (giant merges, snakes) recompute
        # through the chunked flood/settle machinery + the standalone
        # compaction kernel — bit-identical labels for ANY input.
        from .pallas.ccl_local import converge_frames
        from .pallas.rank_compact import (
            RANK_SWEEPS,
            label_rank_fused,
            rank_seed_sweep,
        )
        from .scan import rowwise_mask_cumsum

        lblk, labk = label_rank_fused(
            fg, RANK_SWEEPS, sentinel, interpret=interpret
        )
        # The kernel certifies convergence in-VMEM (one extra sweep) and
        # encodes the per-frame flag as a negative value at lblk[:, 0, 0]
        # — reading T scalars here replaces a full pool-pass verify.
        lchanged = jnp.any(lblk[:, 0, 0] < 0.0)

        def compact_from(lbl):
            """Compaction for a CONVERGED label image (fallback path)."""
            rank_map = rank_seed_sweep(
                lbl, RANK_SWEEPS, sentinel, interpret=interpret
            )
            rchanged = verify_fixpoint(rank_map)

            def rank_body(state):
                r, _, it = state
                new = pool_chunk(r)
                return new, jnp.any(new != r), it + CHUNK

            rank_map, rchanged, _ = jax.lax.while_loop(
                cond(phase1_iters), rank_body,
                (rank_map, rchanged, jnp.asarray(0, jnp.int32)),
            )
            rank_map = jax.lax.cond(
                rchanged,
                lambda r: converge_frames(
                    r, fg, max_iters, sentinel, interpret=interpret
                ),
                lambda r: r,
                rank_map,
            )
            rchanged = jax.lax.cond(
                rchanged, verify_fixpoint, lambda r: jnp.asarray(False),
                rank_map,
            )

            def gather_fallback(r):
                # pathological (snake-like) components
                is_root = jnp.logical_and(fg, lbl == idx.astype(jnp.float32))
                ranks = rowwise_mask_cumsum(is_root.reshape(T, P))
                return rank_gather(lbl, ranks)

            return jax.lax.cond(rchanged, gather_fallback, lambda r: r, rank_map)

        def fast_path(_):
            # labels come compact straight from the kernel; the count is
            # their frame max (background 0)
            return labk, jnp.max(labk, axis=(1, 2))

        def slow_path(_):
            # decode the flag marker, then continue the label flood from
            # the kernel's swept state
            lbl0k = jnp.where(lblk < 0.0, -lblk - 1.0, lblk)
            lbl, ch, _ = jax.lax.while_loop(
                cond(phase1_iters), phase1_body,
                (lbl0k, jnp.asarray(True), jnp.asarray(0, jnp.int32)),
            )
            rank_map = compact_from(settle(lbl, ch))
            counts = jnp.max(
                jnp.where(rank_map < sentinel, rank_map, 0.0), axis=(1, 2)
            ).astype(jnp.int32)
            return jnp.where(fg, rank_map.astype(jnp.int32), 0), counts

        return jax.lax.cond(lchanged, slow_path, fast_path, None)

    init = (lbl0, jnp.asarray(True), jnp.asarray(0, jnp.int32))
    lbl, changed, _ = jax.lax.while_loop(cond(phase1_iters), phase1_body, init)
    lbl = settle(lbl, changed)

    # Compact: rank roots in raster order, then FLOOD each root's rank back
    # through its component with the same cheap min-pools.  A per-pixel
    # rank[root[p]] gather would be the obvious move, but a (T, P) gather
    # costs ~80 ms on TPU while these pools cost ~1 ms; distinct components
    # are never 8-adjacent, so ranks cannot leak between them.
    from .scan import rowwise_mask_cumsum

    is_root = jnp.logical_and(fg, lbl == idx.astype(jnp.float32))

    ranks = rowwise_mask_cumsum(is_root.reshape(T, P))  # 1-based at roots
    counts = ranks[:, -1]
    ranks3 = ranks.reshape(T, H, W)

    def _flood(rank0, chunk_fn):
        def body(state):
            r, _, it = state
            new = chunk_fn(r)
            return new, jnp.any(new != r), it + CHUNK

        r, ch, _ = jax.lax.while_loop(
            cond(phase1_iters), body,
            (rank0, jnp.asarray(True), jnp.asarray(0, jnp.int32)),
        )
        return r, ch

    def general_flood(_):
        rank0 = jnp.where(is_root, ranks3.astype(jnp.float32), jnp.float32(sentinel))
        rank0 = jnp.where(fg, rank0, jnp.float32(sentinel))
        return _flood(rank0, pool_chunk)

    def small_flood(_):
        # Rank values <= 255 are bfloat16-EXACT (as is sentinel 256), so
        # the rank flood — same propagation as the label flood but over
        # tiny values — runs at half the HBM traffic.  Realistic frames
        # hold < 10 components, so this is the permanent fast path; the
        # gate falls back to f32 whenever any frame exceeds 255.  The
        # result normalizes to the f32 convention (background = sentinel
        # P) so the settle/verify machinery below is branch-agnostic.
        s16 = jnp.bfloat16(256.0)

        def chunk16(r):
            if use_pallas:
                from .pallas.ccl_sweep import sweep_chunk

                return sweep_chunk(r, fg, CHUNK, 256.0, interpret=interpret)
            for _ in range(CHUNK):
                pooled = _min_pool_8(r, 256.0)
                r = jnp.where(fg, jnp.minimum(r, pooled), s16)
            return r

        r0 = jnp.where(is_root, ranks3.astype(jnp.bfloat16), s16)
        r0 = jnp.where(fg, r0, s16)
        r, ch = _flood(r0, chunk16)
        return jnp.where(fg, r.astype(jnp.float32), jnp.float32(sentinel)), ch

    rank_map, rchanged = jax.lax.cond(
        jnp.max(counts) <= 255, small_flood, general_flood, None
    )
    # (local_kernel is always False here — that path returned above.)
    rank_map = jax.lax.cond(
        rchanged, lambda r: rank_gather(lbl, ranks), lambda r: r, rank_map
    )
    labels = jnp.where(fg, rank_map.astype(jnp.int32), 0)
    return labels, counts


def wrap_labels_uint8(labels: jnp.ndarray, modulus: int = 256) -> jnp.ndarray:
    """Reference parity: cc_labeling casts int labels to uint8
    (image_filtering.py:329), aliasing labels mod `modulus` (by default 256,
    with label 256 collapsing to background)."""
    return (labels % modulus).astype(jnp.uint8)
