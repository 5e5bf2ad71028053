"""Whole-frame in-VMEM CCL kernel (ops/pallas/ccl_local.py): partition
parity vs scipy's 8-connected labeling and vs the XLA two-phase path,
including pathological snake/spiral components where plain min-pool
flooding is O(path length).  Runs the kernel in interpret mode on the CPU
test backend; the compiled kernel is exercised on the real chip by bench
and by label_components' TPU gate."""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from swiftwatcher_tpu.ops.ccl import label_components
from swiftwatcher_tpu.ops.pallas.ccl_local import converge_frames

ST8 = np.ones((3, 3), int)


def spiral(H, W, step=2):
    fg = np.zeros((H, W), bool)
    top, bot, left, right = 0, H - 1, 0, W - 1
    while top <= bot and left <= right:
        fg[top, left : right + 1] = True
        fg[top : bot + 1, right] = True
        fg[bot, left : right + 1] = True
        fg[max(top + step, 0) : bot + 1, left] = True
        top += step
        bot -= step
        left += step
        right -= step
    return fg


def zigzag(H, W):
    # a serpentine 1-px path: worst case for plain flooding
    fg = np.zeros((H, W), bool)
    for r in range(0, H, 2):
        fg[r, :] = True
        if r + 1 < H:
            fg[r + 1, W - 1 if (r // 2) % 2 == 0 else 0] = True
    return fg


def _converge(fg):
    T, H, W = fg.shape
    idx = (np.arange(H)[:, None] * W + np.arange(W)[None, :]).astype(np.float32)
    sent = float(H * W)
    lbl0 = np.where(fg, idx[None], sent).astype(np.float32)
    out = np.asarray(
        converge_frames(
            jnp.asarray(lbl0), jnp.asarray(fg), 4 * (H + W), sent, interpret=True
        )
    )
    return out, idx, sent


@pytest.mark.parametrize(
    "make",
    [
        lambda rng: rng.random((48, 64)) < 0.3,
        lambda rng: rng.random((48, 64)) < 0.7,
        lambda rng: spiral(48, 64),
        lambda rng: zigzag(32, 48),
        lambda rng: np.zeros((48, 64), bool),
        lambda rng: np.ones((48, 64), bool),
    ],
)
def test_kernel_partition_matches_scipy(rng, make):
    fg = make(rng)[None]
    out, idx, sent = _converge(fg)
    ref, _ = ndimage.label(fg[0], structure=ST8)
    for r in np.unique(ref[ref > 0]):
        mask = ref == r
        vals = np.unique(out[0][mask])
        assert len(vals) == 1 and vals[0] == idx[mask].min()
    assert np.all(out[0][~fg[0]] == sent)


def test_label_components_snake_stress(rng):
    # end-to-end label_components on the serpentine worst case: the XLA path
    # (pool + pointer jumping) must produce the identical partition and
    # correct per-frame counts
    f0 = np.zeros((48, 48), bool)
    f0[:32] = zigzag(32, 48)
    fg = np.stack([f0, spiral(48, 48), rng.random((48, 48)) < 0.4])
    labels, counts = label_components(jnp.asarray(fg), max_iters=1024)
    labels = np.asarray(labels)
    for t in range(3):
        ref, n = ndimage.label(fg[t], structure=ST8)
        assert int(counts[t]) == n
        # identical partition, raster-first-occurrence numbering
        seen = {}
        for r in np.unique(ref[ref > 0]):
            mask = ref == r
            vals = np.unique(labels[t][mask])
            assert len(vals) == 1
            seen[int(vals[0])] = mask
        assert sorted(seen) == list(range(1, n + 1))
        assert np.all(labels[t][ref == 0] == 0)


def test_kernel_matches_xla_path_on_random_batch(rng):
    fg = rng.random((4, 40, 56)) < 0.35
    out, idx, sent = _converge(fg)
    labels, _ = label_components(jnp.asarray(fg), max_iters=512, use_pallas=False)
    labels = np.asarray(labels)
    # same partition: kernel roots are min linear indices, labels are ranks —
    # compare partition structure frame by frame
    for t in range(4):
        ref, _ = ndimage.label(fg[t], structure=ST8)
        for r in np.unique(ref[ref > 0]):
            mask = ref == r
            assert len(np.unique(out[t][mask])) == 1
            assert len(np.unique(labels[t][mask])) == 1
