"""SqueezeNet forward parity vs a torch-functional oracle built from the
same state_dict (torchvision itself is unavailable; the oracle re-creates
squeezenet1_0's graph with torch.nn.functional ops)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from swiftwatcher_tpu.models.squeezenet import (
    FIRE_LAYOUT,
    POOL_AFTER,
    convert_torch_state_dict,
    forward,
    random_params,
)
from swiftwatcher_tpu.models.classifier import (
    SqueezeNetSegmentFilter,
    expand_bbox,
    preprocess_segment,
)
from swiftwatcher_tpu.config import DEFAULT_CONFIG


def _torch_params_from(params_hwio):
    """our HWIO params -> torch OIHW tensors."""
    out = {}
    for k, v in params_hwio.items():
        t = torch.from_numpy(np.asarray(v))
        if t.ndim == 4:
            t = t.permute(3, 2, 0, 1).contiguous()
        out[k] = t
    return out


def _torch_forward(tp, x_nchw):
    def conv(x, key, stride=1, padding=0):
        return F.conv2d(x, tp[f"{key}.weight"], tp[f"{key}.bias"], stride=stride, padding=padding)

    x = F.relu(conv(x_nchw, "features.0", stride=2))
    fire_by_idx = {idx: cfg for idx, *cfg in FIRE_LAYOUT}
    for idx in range(1, 13):
        if idx in POOL_AFTER:
            x = F.max_pool2d(x, 3, stride=2, ceil_mode=True)
        elif idx in fire_by_idx:
            s = F.relu(conv(x, f"features.{idx}.squeeze"))
            e1 = F.relu(conv(s, f"features.{idx}.expand1x1"))
            e3 = F.relu(conv(s, f"features.{idx}.expand3x3", padding=1))
            x = torch.cat([e1, e3], dim=1)
    x = F.relu(conv(x, "classifier.1"))
    x = F.adaptive_avg_pool2d(x, (1, 1))
    return torch.flatten(x, 1)


def test_forward_matches_torch_functional(rng):
    params = random_params(rng)
    tp = _torch_params_from(params)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(forward({k: v for k, v in params.items()}, x))
    theirs = _torch_forward(tp, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_converted_reference_weights_forward(rng):
    # The shipped weights (converted from the reference's model.pt) must run
    # and agree with the torch-functional oracle on the same weights.
    from swiftwatcher_tpu.models.classifier import DEFAULT_WEIGHTS

    if not DEFAULT_WEIGHTS.exists():
        pytest.skip("converted weights not present")
    data = np.load(DEFAULT_WEIGHTS)
    params = {k: data[k] for k in data.files}
    assert len(params) == 52
    tp = _torch_params_from(params)
    x = rng.standard_normal((3, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(forward(params, x))
    theirs = _torch_forward(tp, torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == (3, 2)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(ours.argmax(1), theirs.argmax(1))


def test_expand_bbox_matches_reference_arith():
    # 10x7 bbox -> 24x24 centered with floor/ceil split
    assert expand_bbox([5, 5, 15, 12], (24, 24)) == [5 - 7, 5 - 8, 15 + 7, 12 + 9]
    # already big enough: unchanged
    assert expand_bbox([0, 0, 30, 40], (24, 24)) == [0, 0, 30, 40]


def test_preprocess_matches_torchvision_semantics(rng):
    img = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    out = preprocess_segment(img, DEFAULT_CONFIG)
    assert out.shape == (224, 224, 3)
    pad = (224 - 24) // 2
    # outside the padded center: normalized zeros
    mean = np.asarray(DEFAULT_CONFIG.cnn_mean, np.float32)
    std = np.asarray(DEFAULT_CONFIG.cnn_std, np.float32)
    np.testing.assert_allclose(out[0, 0], -mean / std, rtol=1e-6)
    # center block: PIL-resized, normalized
    from PIL import Image

    ref = (
        np.asarray(
            Image.fromarray(img).resize((24, 24), Image.BILINEAR), np.float32
        )
        / 255.0
    )
    np.testing.assert_allclose(
        out[pad : pad + 24, pad : pad + 24], (ref - mean) / std, rtol=1e-5, atol=1e-6
    )


def test_classifier_filter_interface(rng):
    # Random weights; verify the keep-mask plumbing end to end on a table.
    from swiftwatcher_tpu.pipeline.window import localize_windows
    from oracles import make_synthetic_window

    g = make_synthetic_window(rng, T=21, H=40, W=48, n_dots=2)
    crops = np.stack([np.repeat(g[..., None], 3, axis=-1)])
    table, _ = localize_windows(crops, DEFAULT_CONFIG, with_bbox=True)
    import jax

    table = jax.tree.map(np.asarray, table)
    filt = SqueezeNetSegmentFilter(random_params(rng), DEFAULT_CONFIG)
    frame_full = np.zeros((200, 200, 3), np.uint8)
    keep = filt(table, (0, 10), frame_full, [(20, 30), (68, 70)])
    n_valid = int(table.valid[0, 10].sum())
    assert len(keep) == n_valid
    assert all(isinstance(k, bool) for k in keep)
