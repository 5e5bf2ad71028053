"""Device meshes and sharded execution.

The reference is single-process with no parallelism (SURVEY.md §2.3); these
are the rebuild's first-class scaling primitives:

  * data parallelism over 21-frame WINDOWS ('data' axis) — windows are
    independent for localization; tracking stays a per-video sequential
    consumer of the (tiny) segment tables
  * sequence/tensor parallelism over PIXELS inside RPCA ('model' axis) —
    each device holds a column block of the crop; the only cross-device
    traffic is psum of 21x21 Grams and scalar norms (ICI-friendly), plus an
    all_gather of the motion image before the stencil stages
  * tensor-parallel classifier training — the head conv's 512-channel
    contraction shards over 'model'; XLA inserts the psum from the
    shardings (jit + NamedSharding, the scaling-book recipe)

Everything compiles against any jax.sharding.Mesh, so the same code runs on
a v5e pod slice or on the 8-virtual-device CPU mesh used in tests.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

import optax

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..ops.color import bgr_to_gray
from ..ops.rpca import ialm_rpca_batched
from ..ops.filtering import apply_postfilter
from ..ops.ccl import label_components, wrap_labels_uint8
from ..ops.props import RegionTable, region_tables
from ..models import train as train_mod


def make_mesh(
    n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None
) -> Mesh:
    """2-D ('data', 'model') mesh over the first n devices.

    Default shape puts a factor of 2 on 'model' when available (pixel/tensor
    sharding) and the rest on 'data' (window sharding)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if shape is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // model, model)
    grid = np.asarray(devs[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(grid, ("data", "model"))


def _sharded_stencil_tables(motion, b, t, H, W, mesh, cfg, with_bbox):
    """Post-RPCA stages inside a shard_map body: DIVIDE the stencil/CCL/
    table work across the 'model' axis by frame slices (each device filters
    and labels bt/m frames) instead of running it replicated — the final
    all_gather of the (tiny) per-frame tables re-replicates.  Uses the same
    fused-postfilter gate as the single-chip path (ops/filtering.py)."""

    m = mesh.shape["model"]
    bt = b * t
    flat = motion.reshape(bt, H, W)
    btp = -(-bt // m) * m
    if btp != bt:
        flat = jnp.pad(flat, ((0, btp - bt), (0, 0), (0, 0)))
    k = btp // m
    mine = jax.lax.dynamic_slice_in_dim(
        flat, jax.lax.axis_index("model") * k, k, axis=0
    )
    filtered = apply_postfilter(mine, cfg)
    labels, _ = label_components(filtered > 0, cfg.ccl_max_iters)
    table = region_tables(
        wrap_labels_uint8(labels, cfg.label_modulus), with_bbox=with_bbox
    )
    return jax.tree.map(
        lambda a: jax.lax.all_gather(a, "model", axis=0, tiled=True)[
            :bt
        ].reshape(b, t, *a.shape[1:]),
        table,
    )


def sharded_localize_windows(
    crops: jnp.ndarray,
    mesh: Mesh,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
):
    """Window localization over a mesh: windows dp-sharded over 'data',
    RPCA pixels sharded over 'model' (width blocks), stencil stages
    divided across 'model' after an all_gather of the motion image.

    crops: (B, T, H, W, 3) uint8 with B % data == 0 and W % model == 0.
    Returns (RegionTable (B, T, 256), iters (B,)).
    """
    from ..ops.rpca import ialm_gates_and_kwargs, motion_from_E, pad_pixels_for_fused

    B, T, H, W, _ = crops.shape
    dtype = jnp.dtype(cfg.rpca_dtype)
    # Shared gates (ops/rpca.py): the fused Pallas IALM front runs
    # per-device on its pixel block (the Gram psum is the only cross-device
    # step), so it composes with sequence parallelism.
    fused, kwargs = ialm_gates_and_kwargs(cfg, dtype)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P("data", None, None, "model", None),
        out_specs=(
            RegionTable(
                **{f.name: P("data") for f in dataclasses.fields(RegionTable)}
            ),
            P("data"),
        ),
        check_vma=False,
    )
    def body(local):
        b, t, h, w_local, _ = local.shape
        m = mesh.shape["model"]
        gray = bgr_to_gray(local)                       # (b, T, H, W/m)
        P_loc = h * w_local
        X = pad_pixels_for_fused(
            gray.reshape(b, t, P_loc).astype(dtype), fused
        )
        _, E, iters = ialm_rpca_batched(X, axis_name="model", **kwargs)
        motion_local = motion_from_E(E, P_loc).reshape(b, t, h, w_local)
        motion = jax.lax.all_gather(motion_local, "model", axis=3, tiled=True)
        table = _sharded_stencil_tables(
            motion, b, t, h, w_local * m, mesh, cfg, with_bbox
        )
        return table, iters

    return body(crops)


def sharded_localize_windows_gray(
    gray: jnp.ndarray,
    mesh: Mesh,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    with_bbox: bool = False,
):
    """Sharded localization for pre-grayscaled windows and ARBITRARY crop
    geometry: the runner's mesh mode (run_video(mesh=...)).

    Unlike `sharded_localize_windows` (which shards the crop's width axis
    and therefore needs W % model == 0), this variant shards the FLAT pixel
    axis of the RPCA iterate, zero-padding it up to a multiple of the
    'model' axis — zero pixel columns are exactly IALM-neutral (covered by
    tests), and the padding is sliced off before the stencil stages, so any
    chimney geometry shards without perturbing parity.  The stencil/CCL/
    table work is divided across 'model' by frame slices after the motion
    all_gather, exactly as in the width-sharded path.

    gray: (B, T, H, W) uint8 with B % mesh.shape['data'] == 0.
    Returns (RegionTable (B, T, 256), iters (B,)).
    """
    from ..ops.rpca import ialm_gates_and_kwargs, motion_from_E, pad_pixels_for_fused

    B, T, H, W = gray.shape
    dtype = jnp.dtype(cfg.rpca_dtype)
    model = mesh.shape["model"]
    P_full = H * W
    P_pad = -(-P_full // model) * model
    fused, kwargs = ialm_gates_and_kwargs(cfg, dtype)

    X = gray.reshape(B, T, P_full)
    if P_pad != P_full:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, P_pad - P_full)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P("data", None, "model"),
        out_specs=(
            RegionTable(
                **{f.name: P("data") for f in dataclasses.fields(RegionTable)}
            ),
            P("data"),
        ),
        check_vma=False,
    )
    def body(local):
        b, t, p_local = local.shape
        Xl = pad_pixels_for_fused(local.astype(dtype), fused)
        _, E, iters = ialm_rpca_batched(Xl, axis_name="model", **kwargs)
        motion_local = motion_from_E(E, p_local)
        # reassemble the flat pixel axis, drop the mesh padding, then divide
        # the stencil/CCL/table work across 'model' by frame slices
        motion = jax.lax.all_gather(motion_local, "model", axis=2, tiled=True)
        table = _sharded_stencil_tables(
            motion[..., :P_full], b, t, H, W, mesh, cfg, with_bbox
        )
        return table, iters

    return body(X)


def sharded_train_step(mesh: Mesh, lr: float = 1e-3):
    """Build a pjit'd classifier-head train step over the mesh.

    Placement: feature batch dp over 'data', 512-channel feature/weight dim
    tp over 'model' (XLA inserts the contraction psum); labels dp; head
    bias and optimizer scalars replicated.

    Returns (step_fn, shard_fn) where step_fn(head, opt_state, feats,
    labels) -> (head, opt_state, loss) and shard_fn places host arrays.
    """
    opt = optax.adam(lr)
    raw_step = train_mod.make_train_step(opt)

    feat_spec = NamedSharding(mesh, P("data", None, None, "model"))
    label_spec = NamedSharding(mesh, P("data"))
    w_spec = NamedSharding(mesh, P(None, None, "model", None))
    b_spec = NamedSharding(mesh, P())

    head_spec = {"classifier.1.weight": w_spec, "classifier.1.bias": b_spec}

    def place(head, opt_state, feats, labels):
        head = {k: jax.device_put(v, head_spec[k]) for k, v in head.items()}
        opt_state = jax.tree.map(
            lambda v: jax.device_put(
                v, b_spec if np.ndim(v) == 0 else
                (w_spec if np.shape(v) == np.shape(head["classifier.1.weight"]) else b_spec)
            ),
            opt_state,
        )
        feats = jax.device_put(feats, feat_spec)
        labels = jax.device_put(labels, label_spec)
        return head, opt_state, feats, labels

    step = jax.jit(raw_step, donate_argnums=(0, 1))
    return step, place


def init_sharded_training(mesh: Mesh, params, lr: float = 1e-3):
    """Split params, init optimizer, return everything placed on the mesh."""
    trunk, head = train_mod.split_params(
        {k: jnp.asarray(v) for k, v in params.items()}
    )
    opt = optax.adam(lr)
    opt_state = opt.init(head)
    step, place = sharded_train_step(mesh, lr)
    return trunk, head, opt_state, step, place
