"""Device-side classifier preprocessing vs the host PIL parity path.

The device path (models/preprocess.py) must reproduce Pillow's antialiased
bilinear resample BYTE-FOR-BYTE (int32 fixed-point taps, PIL's own
accumulator), and the full filter must agree with the PIL twin on keep
decisions with the shipped weights.
"""

import dataclasses

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from swiftwatcher_tpu.config import DEFAULT_CONFIG
from swiftwatcher_tpu.models.classifier import (
    DEFAULT_WEIGHTS,
    SqueezeNetSegmentFilter,
    preprocess_segment,
)
from swiftwatcher_tpu.models.preprocess import (
    pack_canvases,
    preprocess_batch,
    resize_coeffs,
)

SIZES = [(h, w) for h in (1, 3, 5, 13, 24, 25, 26, 33, 47, 64)
         for w in (1, 3, 5, 13, 24, 25, 26, 33, 47, 64)]


def test_resize_bit_exact_vs_pil(rng):
    cfg = DEFAULT_CONFIG
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8) for h, w in SIZES]
    canv, hs, ws = pack_canvases(imgs, 64)
    full = np.asarray(
        preprocess_batch(
            jnp.asarray(canv),
            jnp.asarray(resize_coeffs(ws, 64, cfg.cnn_resize_to)),
            jnp.asarray(resize_coeffs(hs, 64, cfg.cnn_resize_to)),
            cfg,
        )
    )
    mean = np.asarray(cfg.cnn_mean, np.float32)
    std = np.asarray(cfg.cnn_std, np.float32)
    pad = (cfg.cnn_input_size - cfg.cnn_resize_to) // 2
    sl = slice(pad, pad + cfg.cnn_resize_to)
    for i, im in enumerate(imgs):
        pil = np.asarray(
            Image.fromarray(im).resize(
                (cfg.cnn_resize_to, cfg.cnn_resize_to), Image.BILINEAR
            )
        )
        # invert the (f32) normalize to recover the uint8 resample exactly
        got = np.round((full[i, sl, sl] * std + mean) * 255.0).astype(np.uint8)
        np.testing.assert_array_equal(got, pil, err_msg=f"size {SIZES[i]}")
        # the padding ring must be exactly the normalized zero
        assert np.allclose(full[i, 0, 0], (0.0 - mean) / std)


def test_full_batch_matches_host_preprocess(rng):
    # whole normalized tensors: device vs host PIL twin, 1-ulp tolerance
    # (the f32 (x - mean) / std runs in different op orders)
    cfg = DEFAULT_CONFIG
    imgs = [rng.integers(0, 256, (h, w, 3), np.uint8)
            for h, w in [(24, 24), (31, 17), (64, 64), (3, 24)]]
    canv, hs, ws = pack_canvases(imgs, cfg.cnn_max_seg_hw)
    full = np.asarray(
        preprocess_batch(
            jnp.asarray(canv),
            jnp.asarray(resize_coeffs(ws, cfg.cnn_max_seg_hw, cfg.cnn_resize_to)),
            jnp.asarray(resize_coeffs(hs, cfg.cnn_max_seg_hw, cfg.cnn_resize_to)),
            cfg,
        )
    )
    for i, im in enumerate(imgs):
        np.testing.assert_allclose(
            full[i], preprocess_segment(im, cfg), atol=2e-6
        )


@pytest.mark.skipif(not DEFAULT_WEIGHTS.exists(), reason="no shipped weights")
def test_keep_decisions_agree_with_pil_path(rng):
    # shipped weights; bird-like dark blobs on noisy sky + pure-noise crops
    cfg_dev = DEFAULT_CONFIG
    cfg_pil = dataclasses.replace(DEFAULT_CONFIG, cnn_device_preprocess=False)
    f_dev = SqueezeNetSegmentFilter.from_default_weights(cfg_dev)
    f_pil = SqueezeNetSegmentFilter.from_default_weights(cfg_pil)
    images = []
    for k in range(40):
        h, w = int(rng.integers(24, 49)), int(rng.integers(24, 49))
        im = rng.integers(140, 220, (h, w, 3), np.uint8)
        if k % 2 == 0:  # dark bird-ish blob in the middle
            yc, xc = h // 2, w // 2
            im[yc - 3 : yc + 3, xc - 6 : xc + 6] = rng.integers(
                10, 60, (6, 12, 3), np.uint8
            )
        images.append(im)
    keep_dev = f_dev.classify_images(images)
    keep_pil = f_pil.classify_images(images)
    np.testing.assert_array_equal(keep_dev, keep_pil)


def test_oversized_segment_falls_back_to_pil(rng):
    # one crop beyond cnn_max_seg_hw: the batch must route through the host
    # twin and still return a well-formed mask
    filt = SqueezeNetSegmentFilter(
        {  # tiny random params: only the code path matters here
            k: v
            for k, v in np.load(DEFAULT_WEIGHTS).items()
        }
        if DEFAULT_WEIGHTS.exists()
        else pytest.skip("no shipped weights"),
        DEFAULT_CONFIG,
    )
    big = rng.integers(0, 256, (DEFAULT_CONFIG.cnn_max_seg_hw + 8, 24, 3), np.uint8)
    small = rng.integers(0, 256, (24, 24, 3), np.uint8)
    keep = filt.classify_images([big, small])
    assert keep.shape == (2,) and keep.dtype == bool


def test_canvas_bucket_is_output_invariant(rng):
    """classify_images' adaptive canvas bucket (32 when every crop fits,
    else cnn_max_seg_hw) exists only to cut upload bytes — predictions must
    be identical across buckets and vs the host PIL twin, because
    resize_coeffs zero-weights taps beyond the true extent."""
    import dataclasses

    from swiftwatcher_tpu.models.classifier import SqueezeNetSegmentFilter
    from swiftwatcher_tpu.models.squeezenet import random_params

    params = random_params(rng)
    cfg = DEFAULT_CONFIG
    f_dev = SqueezeNetSegmentFilter(params, cfg)
    f_pil = SqueezeNetSegmentFilter(
        params, dataclasses.replace(cfg, cnn_device_preprocess=False)
    )
    small = [rng.integers(0, 256, (h, w, 3), np.uint8)
             for h, w in ((24, 24), (25, 31), (32, 24), (30, 30))]
    big = [rng.integers(0, 256, (h, w, 3), np.uint8)
           for h, w in ((24, 24), (47, 24), (24, 64))]

    assert f_dev._canvas_bucket(small) == 32
    assert f_dev._canvas_bucket(big) == cfg.cnn_max_seg_hw

    # a small-only batch (32 canvas) and the same crops inside a mixed
    # batch (64 canvas) must agree with each other and with host PIL
    keep_small = f_dev.classify_images(small)
    keep_mixed = f_dev.classify_images(small + big)
    np.testing.assert_array_equal(keep_small, keep_mixed[: len(small)])
    np.testing.assert_array_equal(keep_small, f_pil.classify_images(small))
    np.testing.assert_array_equal(
        keep_mixed, f_pil.classify_images(small + big)
    )

    # timers accumulate into the caller's dict
    timers = {}
    f_dev.classify_images(small, timers=timers)
    assert timers.get("classify_pack", 0) >= 0
    assert timers.get("classify_device", 0) > 0
    assert f_dev.upload_bytes > 0
