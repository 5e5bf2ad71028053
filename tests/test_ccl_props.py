"""CCL + region tables vs cv2.connectedComponents and hand-rolled regionprops."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from swiftwatcher_tpu.ops.ccl import label_components, wrap_labels_uint8
from swiftwatcher_tpu.ops.props import region_tables


def _partition_equal(a, b):
    """Same pixel partition: bijection between label values of a and b."""
    assert (a > 0).sum() == (b > 0).sum()
    fg = a > 0
    pairs = set(zip(a[fg].ravel().tolist(), b[fg].ravel().tolist()))
    return (
        len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})
    )


def _random_blobs(rng, H, W, density=0.25):
    img = (rng.random((H, W)) > (1 - density)).astype(np.uint8) * 255
    return img


@pytest.mark.parametrize("density", [0.05, 0.25, 0.45])
def test_ccl_partition_matches_cv2(rng, density):
    imgs = np.stack([_random_blobs(rng, 37, 61, density) for _ in range(6)])
    labels, counts = label_components(imgs > 0)
    labels = np.asarray(labels)
    for t in range(6):
        n_cv, lbl_cv = cv2.connectedComponents(imgs[t])  # default 8-conn
        assert int(counts[t]) == n_cv - 1
        assert _partition_equal(lbl_cv, labels[t])


def test_ccl_labels_are_raster_first_occurrence(rng):
    imgs = np.stack([_random_blobs(rng, 25, 33, 0.3) for _ in range(3)])
    labels, _ = label_components(imgs > 0)
    labels = np.asarray(labels)
    for t in range(3):
        seen = []
        for v in labels[t].ravel():
            if v != 0 and v not in seen:
                seen.append(int(v))
        assert seen == sorted(seen)
        assert seen == list(range(1, len(seen) + 1))


def test_ccl_diagonal_connectivity():
    # Two pixels touching only diagonally are ONE component under 8-conn
    # (the reference's effective connectivity, SURVEY.md §2.1).
    img = np.zeros((1, 8, 8), bool)
    img[0, 2, 2] = True
    img[0, 3, 3] = True
    labels, counts = label_components(img)
    assert int(counts[0]) == 1
    assert int(np.asarray(labels)[0, 2, 2]) == int(np.asarray(labels)[0, 3, 3]) == 1


def test_ccl_snake_converges():
    # Long serpentine component: stresses propagation depth.
    H, W = 32, 32
    img = np.zeros((H, W), bool)
    for r in range(0, H, 2):
        img[r, :] = True
        if (r // 2) % 2 == 0 and r + 1 < H:
            img[r + 1, W - 1] = True
        elif r + 1 < H:
            img[r + 1, 0] = True
    labels, counts = label_components(img[None])
    assert int(counts[0]) == 1
    lab = np.asarray(labels)[0]
    assert set(np.unique(lab[img])) == {1}


def test_uint8_wrap_aliases_like_reference(rng):
    # >255 components: labels alias mod 256, label 256 collapses to bg.
    img = np.zeros((40, 80), np.uint8)
    img[::2, ::2] = 255  # 800 isolated pixels (spacing 2 defeats 8-conn)
    labels, counts = label_components(img[None] > 0)
    n = int(counts[0])
    assert n == 20 * 40
    wrapped = np.asarray(wrap_labels_uint8(labels))[0]
    full = np.asarray(labels)[0]
    np.testing.assert_array_equal(wrapped.astype(np.int32), full % 256)
    # component with compacted label 256 vanished into background
    assert (wrapped[full == 256] == 0).all()


def test_region_tables_match_manual_regionprops(rng):
    imgs = np.stack([_random_blobs(rng, 29, 41, 0.3) for _ in range(4)])
    labels, _ = label_components(imgs > 0)
    wrapped = np.asarray(wrap_labels_uint8(labels))
    table = region_tables(wrapped)
    for t in range(4):
        lbl = wrapped[t]
        for k in range(1, 256):
            mask = lbl == k
            if not mask.any():
                assert not bool(np.asarray(table.valid)[t, k])
                continue
            ys, xs = np.nonzero(mask)
            assert bool(np.asarray(table.valid)[t, k])
            assert int(np.asarray(table.area)[t, k]) == len(ys)
            # regionprops: centroid = coord means, bbox = (min, min, max+1, max+1)
            np.testing.assert_allclose(
                float(np.asarray(table.centroid_y)[t, k]), ys.mean(), rtol=1e-6
            )
            np.testing.assert_allclose(
                float(np.asarray(table.centroid_x)[t, k]), xs.mean(), rtol=1e-6
            )
            assert int(np.asarray(table.min_y)[t, k]) == ys.min()
            assert int(np.asarray(table.max_y)[t, k]) == ys.max() + 1
            assert int(np.asarray(table.min_x)[t, k]) == xs.min()
            assert int(np.asarray(table.max_x)[t, k]) == xs.max() + 1


def test_region_tables_num_segments(rng):
    imgs = np.stack([_random_blobs(rng, 20, 20, 0.2) for _ in range(2)])
    labels, counts = label_components(imgs > 0)
    table = region_tables(np.asarray(wrap_labels_uint8(labels)))
    # below 256 components, num_segments == CCL counts
    np.testing.assert_array_equal(np.asarray(table.num_segments), np.asarray(counts))


def test_sweep_chunk_matches_xla_pools(rng):
    # The separable Pallas sweep kernel (interpret mode on CPU) must be
    # bit-identical to K XLA min-pool sweeps, including odd-N padding and
    # the fast/slow paths of the K=FAST_LABELS props cond downstream.
    import jax.numpy as jnp

    from swiftwatcher_tpu.ops.ccl import _min_pool_8
    from swiftwatcher_tpu.ops.pallas.ccl_sweep import sweep_chunk

    for N in (3, 4):                       # odd N exercises the pad path
        H, W = 24, 40
        P = H * W
        sentinel = float(P)
        fg = np.stack([_random_blobs(rng, H, W, 0.3) > 0 for _ in range(N)])
        idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.float32)
        lbl = np.where(fg, idx[None], np.float32(sentinel))

        ref = jnp.asarray(lbl)
        for _ in range(6):
            pooled = _min_pool_8(ref, sentinel)
            ref = jnp.where(fg, jnp.minimum(ref, pooled), jnp.float32(sentinel))

        out = sweep_chunk(
            jnp.asarray(lbl), jnp.asarray(fg), 6, sentinel, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sweep_chunk_bf16_matches_f32(rng):
    # bf16-IO sweep (the rank-flood fast path: values < 256 are bf16-exact,
    # 4 frames per grid step) must equal the f32 kernel bit-for-bit,
    # including the wider-F padding path (N % 4 != 0).
    import jax.numpy as jnp

    from swiftwatcher_tpu.ops.pallas.ccl_sweep import sweep_chunk

    for N in (3, 4, 5):
        H, W = 24, 40
        sentinel = 256.0
        fg = np.stack([_random_blobs(rng, H, W, 0.3) > 0 for _ in range(N)])
        idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]) % 200
        lbl = np.where(fg, idx[None].astype(np.float32), np.float32(sentinel))

        ref = sweep_chunk(jnp.asarray(lbl), jnp.asarray(fg), 6, sentinel, True)
        out = sweep_chunk(
            jnp.asarray(lbl).astype(jnp.bfloat16),
            jnp.asarray(fg),
            6,
            sentinel,
            interpret=True,
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)), np.asarray(ref)
        )


def test_rank_flood_gate_boundary():
    """The bf16 rank-flood fast path gates on max per-frame component count
    <= 255 (bf16-exact values); both sides of the boundary must label
    identically to scipy's oracle numbering-in-raster-order."""
    from scipy import ndimage

    for n_pts in (255, 256, 257):
        img = np.zeros((40, 80), bool)
        ys, xs = np.divmod(np.arange(n_pts) * 2, 80)
        img[ys * 2, xs] = True          # isolated pixels, raster order
        labels, counts = label_components(img[None])
        assert int(counts[0]) == n_pts
        lab = np.asarray(labels)[0]
        ref, nref = ndimage.label(img, structure=np.ones((3, 3)))
        assert nref == n_pts
        np.testing.assert_array_equal(lab, ref)  # raster numbering agrees


def _oracle_converged(fg):
    """(T, H, W) bool -> (min-index fixpoint f32 labels, compact int32)."""
    from scipy import ndimage

    T, H, W = fg.shape
    P = H * W
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int64)
    lbl = np.full((T, H, W), float(P), np.float32)
    want = np.zeros((T, H, W), np.int32)
    for t in range(T):
        cc, n = ndimage.label(fg[t], structure=np.ones((3, 3)))
        if not n:
            continue
        mins = np.asarray(ndimage.minimum(idx, cc, index=np.arange(1, n + 1)))
        lbl[t][fg[t]] = mins[cc[fg[t]] - 1]
        order = np.argsort(mins)
        remap = np.empty(n, np.int32)
        remap[order] = np.arange(1, n + 1)
        want[t][fg[t]] = remap[cc[fg[t]] - 1]
    return lbl, want


def _numpy_min_flood(rank, fg, sentinel):
    """Finish a partial min flood to its fixpoint (oracle for the caller's
    chunked-flood contract)."""
    out = rank.copy()
    while True:
        p = np.pad(out, ((1, 1), (1, 1)), constant_values=sentinel)
        pooled = np.min(
            [p[dy:dy + out.shape[0], dx:dx + out.shape[1]]
             for dy in range(3) for dx in range(3)],
            axis=0,
        )
        new = np.where(fg, np.minimum(out, pooled), sentinel)
        if np.array_equal(new, out):
            return out
        out = new


def test_rank_seed_sweep_interpret(rng):
    """The one-pass Pallas compaction (seed ranks via in-VMEM cumsum + S
    min sweeps) is exact for small blobs and leaves larger components in a
    state the caller's chunked flood finishes to the exact compact labels
    (the TPU fast path in ops/ccl.py label_components)."""
    from swiftwatcher_tpu.ops.pallas.rank_compact import rank_seed_sweep

    H, W = 48, 80
    P = H * W
    fg = np.zeros((4, H, W), bool)
    # frame 0: small separated blobs (converge inside the kernel)
    for cy, cx, r in [(5, 7, 2), (5, 30, 1), (20, 7, 3), (40, 70, 2)]:
        fg[0, cy - r:cy + r + 1, cx - r:cx + r + 1] = True
    # frame 1: a long horizontal snake (flood distance >> sweeps)
    fg[1, 10, 5:70] = True
    fg[1, 30, 3] = True
    # frame 2: empty; frame 3: dense random speckle (many merges)
    fg[3] = rng.random((H, W)) > 0.6
    lbl, want = _oracle_converged(fg)

    rank = np.asarray(
        rank_seed_sweep(jnp.asarray(lbl), 6, float(P), interpret=True)
    )
    # frame 0 is exact straight out of the kernel
    np.testing.assert_array_equal(
        np.where(fg[0], rank[0].astype(np.int64), 0), want[0]
    )
    assert np.all(rank[2] == float(P))  # empty frame: all sentinel
    for t in range(4):
        # roots always carry their exact 1-based raster rank
        roots = lbl[t] == (
            np.arange(H)[:, None] * W + np.arange(W)[None, :]
        ).astype(np.float32)
        roots &= fg[t]
        np.testing.assert_array_equal(rank[t][roots], want[t][roots])
        # the caller's finish contract: min-flooding to fixpoint = compact
        done = _numpy_min_flood(rank[t], fg[t], float(P))
        np.testing.assert_array_equal(
            np.where(fg[t], done.astype(np.int64), 0), want[t]
        )


def test_label_rank_fused_interpret(rng):
    """The fused whole-CCL kernel (label seed + sweeps + ranking cumsum +
    rank sweeps in one pass): when its label output verifies as a flood
    fixpoint, its rank output IS the exact compact labeling (the
    label/rank flood isomorphism the TPU fast path relies on); when the
    label output is NOT converged (deep components), the caller's fallback
    recomputes — here we just assert the flag trips."""
    from swiftwatcher_tpu.ops.pallas.rank_compact import label_rank_fused

    H, W = 48, 80
    P = H * W
    fg = np.zeros((4, H, W), bool)
    for cy, cx, r in [(5, 7, 2), (5, 30, 1), (20, 7, 3), (40, 70, 2)]:
        fg[0, cy - r:cy + r + 1, cx - r:cx + r + 1] = True
    fg[1, 10, 5:70] = True          # snake: flood distance >> sweeps
    fg[3] = rng.random((H, W)) > 0.75
    lbl_want, want = _oracle_converged(fg)

    S = 12
    lbl, lab = label_rank_fused(jnp.asarray(fg), S, float(P), interpret=True)
    lbl, lab = np.asarray(lbl), np.asarray(lab)
    for t in (0, 2):
        # small blobs / empty: labels converge -> compact labels are exact
        np.testing.assert_array_equal(lbl[t], lbl_want[t])
        np.testing.assert_array_equal(lab[t], want[t])
    # the snake frame must NOT verify as converged (caller falls back)
    assert not np.array_equal(lbl[1], lbl_want[1])
    # frame 3 (speckle with shallow merges): check the isomorphism contract
    # — if labels converged, the compact labels must equal the oracle
    if np.array_equal(lbl[3], lbl_want[3]):
        np.testing.assert_array_equal(lab[3], want[3])


def test_ccl_giant_serpentine_converges(rng):
    """Dense speckle produces one giant serpentine component whose
    pointer-jump convergence needs ~77 phase-2 rounds; charging CHUNK
    (not 1) per round against ccl_max_iters capped the budget at 64 and
    split the component (off-by-one count).  Regression for the
    pure-XLA fallback path."""
    from scipy import ndimage

    fg = rng.random((1, 216, 432)) > 0.62
    labels, counts = label_components(jnp.asarray(fg), use_pallas=False)
    cc, n = ndimage.label(fg[0], structure=np.ones((3, 3)))
    assert int(counts[0]) == n
    idx = (np.arange(216)[:, None] * 432 + np.arange(432)[None, :]).astype(np.int64)
    mins = np.asarray(ndimage.minimum(idx, cc, index=np.arange(1, n + 1)))
    order = np.argsort(mins)
    remap = np.empty(n, np.int32)
    remap[order] = np.arange(1, n + 1)
    want = np.where(fg[0], remap[np.maximum(cc, 1) - 1], 0)
    np.testing.assert_array_equal(np.asarray(labels)[0], want)


def _scipy_compact_labels(fg_t):
    """Reference labels: scipy 8-conn components renumbered in raster
    first-occurrence order (the pipeline's label convention)."""
    from scipy import ndimage

    H, W = fg_t.shape
    cc, n = ndimage.label(fg_t, structure=np.ones((3, 3)))
    if not n:
        return np.zeros((H, W), np.int32), 0
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int64)
    mins = np.asarray(ndimage.minimum(idx, cc, index=np.arange(1, n + 1)))
    remap = np.empty(n, np.int32)
    remap[np.argsort(mins)] = np.arange(1, n + 1)
    return np.where(fg_t, remap[np.maximum(cc, 1) - 1], 0).astype(np.int32), n


def _fuzz_scene(rng, H, W):
    """Structured random scene: blobs + line segments + a ring + speckle,
    the component shapes that exercise every CCL path (fused fast, deep
    flood, gather fallback, capacity gates)."""
    fg = np.zeros((H, W), bool)
    for _ in range(int(rng.integers(0, 6))):
        cy, cx = int(rng.integers(2, H - 2)), int(rng.integers(2, W - 2))
        r = int(rng.integers(1, 4))
        fg[max(cy - r, 0):cy + r + 1, max(cx - r, 0):cx + r + 1] = True
    for _ in range(int(rng.integers(0, 3))):
        y = int(rng.integers(0, H))
        a, b = sorted(rng.integers(0, W, 2).tolist())
        fg[y, a:b + 1] = True
    if rng.random() < 0.5:  # hollow ring: a component whose flood wraps
        cy, cx, r = H // 2, W // 2, min(H, W) // 3
        yy, xx = np.ogrid[:H, :W]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        fg |= (d2 >= (r - 1) ** 2) & (d2 <= (r + 1) ** 2)
    fg |= rng.random((H, W)) > float(rng.uniform(0.9, 0.995))
    return fg


@pytest.mark.parametrize("shape", [(5, 56, 88), (4, 47, 121)])
def test_ccl_props_fuzz_fused_vs_scipy(rng, shape):
    """Randomized scenes through the DEFAULT on-hardware path (fused Pallas
    kernels, interpret mode) — labels vs scipy, XLA-path equality, and
    region-table moments vs direct numpy accumulation."""
    T, H, W = shape
    fg = np.stack([_fuzz_scene(rng, H, W) for _ in range(T)])
    fgj = jnp.asarray(fg)

    fast = label_components(fgj, use_pallas=True, interpret=True)
    xla = label_components(fgj, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(xla[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(xla[1]))

    lab, cnt = np.asarray(fast[0]), np.asarray(fast[1])
    for t in range(T):
        want, n = _scipy_compact_labels(fg[t])
        assert int(cnt[t]) == n
        np.testing.assert_array_equal(lab[t], want)

    wrapped = np.asarray(wrap_labels_uint8(fast[0]))
    table = region_tables(wrapped)
    area = np.asarray(table.area)
    s_y, s_x = np.asarray(table.sum_y), np.asarray(table.sum_x)
    valid = np.asarray(table.valid)
    for t in range(T):
        for v in range(1, 256):
            m = wrapped[t] == v
            assert valid[t, v] == m.any()
            if m.any():
                assert area[t, v] == m.sum()
                ys, xs = np.nonzero(m)
                assert s_y[t, v] == ys.sum() and s_x[t, v] == xs.sum()
    """The FULL TPU fast/slow integration — fused kernel, in-kernel
    convergence flag decode, resumed flood, compact_from fallback chain,
    per-frame empty skip — exercised on CPU via interpret mode and
    compared against both the pure-XLA path and scipy.  (Without this,
    the path that is the DEFAULT on hardware had no CI coverage.)"""
    from scipy import ndimage

    H, W = 64, 96
    fg = np.zeros((6, H, W), bool)
    # fast path: small blobs incl. a merged pair
    for cy, cx, r in [(10, 10, 2), (12, 14, 2), (40, 70, 3)]:
        fg[0, cy - r:cy + r + 1, cx - r:cx + r + 1] = True
    # slow path: a snake longer than 2*RANK_SWEEPS
    fg[1, 30, 4:92] = True
    fg[1, 50, 10] = True
    # empty frame (frame 2), dense speckle (frame 3), full block (frame 4)
    fg[3] = rng.random((H, W)) > 0.6
    fg[4, 8:40, 8:88] = True
    fg[5, ::3, ::3] = True     # isolated-pixel grid (many components)
    fgj = jnp.asarray(fg)

    fast = label_components(fgj, use_pallas=True, interpret=True)
    xla = label_components(fgj, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(xla[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(xla[1]))

    lab, cnt = np.asarray(fast[0]), np.asarray(fast[1])
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.int64)
    for t in range(6):
        cc, n = ndimage.label(fg[t], structure=np.ones((3, 3)))
        assert int(cnt[t]) == n
        if n:
            mins = np.asarray(
                ndimage.minimum(idx, cc, index=np.arange(1, n + 1))
            )
            order = np.argsort(mins)
            remap = np.empty(n, np.int32)
            remap[order] = np.arange(1, n + 1)
            want = np.where(fg[t], remap[np.maximum(cc, 1) - 1], 0)
        else:
            want = np.zeros((H, W), np.int32)
        np.testing.assert_array_equal(lab[t], want)
