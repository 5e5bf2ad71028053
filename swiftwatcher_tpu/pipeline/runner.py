"""Per-video orchestration: the reference's swift_counting_algorithm
(__main__.py:56-100) rebuilt around the compiled window program.

Host duties only: pull a 21-frame window from the source, slice the crop,
hand the uint8 batch to the jitted localization program, convert the
returned segment tables into tracker steps, and export CSVs at the end.
All per-pixel work happens inside `localize_window` on device.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..geometry import crop_region_from_corners, roi_crop_region_from_corners
from ..ops.roi_mask import generate_roi_mask
from ..io.readers import FrameSource
from ..io.export import export_results, generate_test_dir
from ..io.prefetch import WindowPrefetcher
from ..utils.metrics import RunMetrics
from ..utils.checkpoint import save_checkpoint, load_checkpoint
from .window import localize_windows_gray
from .tracking import SegmentTracker, Event
from .events import classify_events


@dataclasses.dataclass
class _CompactTableView:
    """Duck-typed stand-in for RegionTable over compacted (B, T, K) arrays.

    The classify fast path hands this to SqueezeNetSegmentFilter instead of
    the 256-slot table: valid slots are packed at the front in ascending
    label order (pipeline/tracking_jax.py:compact_tables), so bbox lookups
    by np.nonzero(valid) see the same segments in the same order."""

    valid: np.ndarray
    min_y: np.ndarray
    min_x: np.ndarray
    max_y: np.ndarray
    max_x: np.ndarray


@dataclasses.dataclass
class VideoResult:
    events: List[Event]
    df_labels: Optional[pd.DataFrame]
    total_predicted: int
    total_rejected: int
    frames_processed: int
    ialm_iters: List[int]
    export_dir: Optional[Path] = None
    metrics: Optional[object] = None


def extract_frame_segments_batched(table, b: int, t: int):
    """Segment centroids for frame (b, t) of a window-batched (B, T, 256)
    RegionTable, in ascending label order, as float64 (row, col) —
    regionprops parity (SURVEY.md §2.1)."""
    valid = table.valid[b, t]
    idx = np.nonzero(valid)[0]
    sum_y = table.sum_y[b, t].astype(np.float64)
    sum_x = table.sum_x[b, t].astype(np.float64)
    area = table.area[b, t].astype(np.float64)
    return [(sum_y[k] / area[k], sum_x[k] / area[k]) for k in idx]


def run_video(
    source: FrameSource,
    corners,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    export_dir: Optional[Path] = None,
    debug: bool = False,
    segment_filter: Optional[Callable] = None,
    status_cb: Optional[Callable[[int, int], None]] = None,
    export_segments_dir: Optional[Path] = None,
    checkpoint_path: Optional[Path] = None,
    checkpoint_interval_batches: int = 16,
    tracker_impl: str = "host",
    profile_dir: Optional[Path] = None,
    mesh=None,
) -> VideoResult:
    """Count swifts in one video.

    segment_filter: optional per-frame hook where the SqueezeNet classifier
    plugs in (__main__.py:84-85); called as
    segment_filter(table, (batch_idx, frame_idx), full_frame_bgr,
    crop_region) -> list[bool] keep-mask over the frame's valid segments in
    label order (see models.classifier.SqueezeNetSegmentFilter.__call__).
    export_segments_dir: when set (--export), per-segment overlay/crop PNGs
    are written there (__main__.py:94-96).
    checkpoint_path: when set, tracker state + frame cursor are serialized
    there every checkpoint_interval_batches, and a pre-existing checkpoint
    at that path resumes the run (no reference counterpart; SURVEY.md §5).
    mesh: optional jax.sharding.Mesh ('data', 'model').  Localization runs
    through parallel.mesh.sharded_localize_windows_gray — windows dp-sharded
    over 'data', RPCA pixels sp-sharded over 'model' (flat-axis padding, so
    ANY chimney geometry shards with exact parity).  Requires
    cfg.batch_windows % mesh.shape['data'] == 0.  Tracking/events stay a
    sequential consumer of the tiny tables, as in single-chip mode.
    tracker_impl: "host" (scipy LAP — the strict-parity path) or "device"
    (the whole tracker as one lax.scan per batch, pipeline/tracking_jax.py;
    only segment tables' scalars ever leave the device).  Device mode does
    not support segment_filter/export_segments_dir (they need host frames)
    and falls back to host, with a warning, when those are requested.
    Checkpointing works in both modes (formats are marked and not
    cross-resumable: the device state is a fixed-capacity TrackState).
    profile_dir: when set, a jax.profiler trace of the run is captured
    there (viewable in TensorBoard/Perfetto), host stages are wrapped in
    TraceAnnotations, and per-stage DEVICE times are recorded in the
    manifest via forced-completion timing (SURVEY.md §5).  Profiling
    serializes dispatch and consume, so throughput drops while it is on.
    """
    if tracker_impl == "device" and (
        export_segments_dir is not None
        or (segment_filter is not None and not hasattr(segment_filter, "batch_call"))
    ):
        import warnings

        warnings.warn(
            "tracker_impl='device' requires a batchable segment_filter "
            "(models.classifier.SqueezeNetSegmentFilter) and no "
            "export_segments_dir (PNG export needs the host per-frame "
            "path); falling back to the host tracker",
            RuntimeWarning,
            stacklevel=2,
        )
        tracker_impl = "host"
    # --- init: regions + ROI mask from the first frame (once per video) ---
    ff = source.read_frame(0, increment=False)
    crop_region = crop_region_from_corners(corners, cfg)
    roi_region = roi_crop_region_from_corners(corners, cfg)
    roi_mask = np.asarray(generate_roi_mask(ff, roi_region, crop_region, cfg))

    tracker = SegmentTracker(roi_mask, cfg)
    metrics = RunMetrics()

    # Stabilization reference (opt-in, cfg.stabilize_max_shift > 0): the
    # gray crop of the SAME frame the ROI mask was built from, so the mask,
    # stabilized pixel coordinates, and track centroids across every window
    # all share one pose (ops/stabilize.py).  None when the feature is off.
    stab_ref = None
    if cfg.stabilize_max_shift > 0:
        from ..ops.color import bgr_to_gray_host
        from ..geometry import crop_array

        stab_ref = jax.device_put(
            bgr_to_gray_host(crop_array(np.asarray(ff), crop_region))
        )

    use_device_tracker = tracker_impl == "device"
    if use_device_tracker:
        from .tracking_jax import compact_tables, empty_state, track_window

        roi_dev = jax.device_put(roi_mask)
        dev_state = empty_state(cfg.max_tracks)
        # one-slot queue of not-yet-read-back event buffers (fused classify
        # defers its readback one batch so the fused program's device time
        # + the readback round trip overlap the NEXT batch's host work
        # instead of sitting on the consume critical path)
        deferred_ev = [None]

        def _drain_device_events(ev, overflow, rest, n_wins):
            """Read back one batch's event buffers and append its events.

            The device tracker carries only frame NUMBERS through the scan;
            timestamps are recomputed as frame_number / fps.  This matches
            the host path exactly for every current source (ArraySource,
            HDF5Source, VideoFileSource all stamp frames that way — see
            io/readers.py frame_timestamp call sites), but a future source
            with non-uniform timestamps must use tracker_impl="host"."""
            from ..io.export import frame_timestamp
            from ..io.readers import NULL_TIMESTAMP

            ev, *rest = jax.tree.map(np.asarray, (ev, *rest))
            if rest:  # fused classify: kept-segment count rides along
                metrics.segments_total += int(rest[0])
            # Only count real windows: slots beyond n_wins are zero-padded
            # batch fillers whose RPCA/label content is meaningless.
            metrics.track_overflows += int(
                np.asarray(overflow)[:n_wins].sum()
            )
            if bool(ev.overflow):
                raise RuntimeError("device tracker event buffer overflow")
            assert getattr(source, "uniform_timestamps", True), (
                "device tracker recomputes timestamps as frame/fps; source "
                "declares non-uniform timestamps — use tracker_impl='host'"
            )
            for i in range(int(ev.count)):
                fn = int(ev.last_fn[i])
                tracker.events.append(
                    Event(
                        first_centroid=(
                            float(ev.first_cy[i]), float(ev.first_cx[i])
                        ),
                        last_centroid=(
                            float(ev.last_cy[i]), float(ev.last_cx[i])
                        ),
                        frame_number=fn,
                        timestamp=frame_timestamp(fn, source.fps)
                        if fn >= 0
                        else NULL_TIMESTAMP,
                    )
                )

    frames_processed = 0
    if checkpoint_path is not None:
        from ..utils.checkpoint import source_fingerprint

        src_info = source_fingerprint(source)
        if use_device_tracker:
            from ..utils.checkpoint import load_checkpoint_device

            restored = load_checkpoint_device(checkpoint_path, src_info)
        else:
            restored = load_checkpoint(checkpoint_path, tracker, src_info)
        if restored is not None:
            if not getattr(source, "supports_seek", False):
                raise ValueError(
                    "cannot resume a sequential source (cv2.VideoCapture "
                    "reads in order and ignores frame numbers) — re-encode "
                    "to HDF5/npy for checkpointed runs"
                )
            if use_device_tracker:
                (source.next_frame_number, frames_processed,
                 dev_state, prior_events) = restored
                tracker.events.extend(prior_events)
            else:
                source.next_frame_number, frames_processed = restored

    ialm_iters: List[int] = []
    # budget timers are passed only to filters that accept them (the hook
    # contract stays 3-positional for user-supplied filters)
    _filter_timer_kw = {}
    if segment_filter is not None and hasattr(segment_filter, "batch_call"):
        import inspect

        try:
            if "timers" in inspect.signature(segment_filter.batch_call).parameters:
                _filter_timer_kw = {"timers": metrics.stage_seconds}
        except (TypeError, ValueError):
            pass
    needs_frames = segment_filter is not None or export_segments_dir is not None
    prefetcher = WindowPrefetcher(
        source, crop_region, cfg, keep_frames=needs_frames,
        initial_planned=frames_processed,
        frame_hw=None if ff is None else ff.shape[:2],
    )

    profiling = profile_dir is not None
    if profiling:
        import contextlib
        import time as _time

        Path(profile_dir).mkdir(parents=True, exist_ok=True)
        try:
            jax.profiler.start_trace(str(profile_dir))
            trace_active = True
        except Exception as e:  # backend without profiler support
            import warnings

            warnings.warn(f"jax.profiler trace unavailable: {e}", RuntimeWarning)
            trace_active = False
        annotate = jax.profiler.TraceAnnotation
    else:
        trace_active = False

        import contextlib

        def annotate(_name):
            return contextlib.nullcontext()

    if mesh is not None:
        if cfg.batch_windows % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_windows={cfg.batch_windows} must divide over the "
                f"mesh 'data' axis ({mesh.shape['data']})"
            )
        from ..parallel.mesh import sharded_localize_windows_gray

        def _stab(g):
            # opt-in stabilization runs OUTSIDE shard_map on the global
            # array (GSPMD partitions the dense ops); integer SAD keeps it
            # bit-identical to the unsharded path under any partitioning
            if cfg.stabilize_max_shift > 0:
                from ..ops.stabilize import stabilize_window

                g, _ = stabilize_window(g, cfg.stabilize_max_shift, stab_ref)
            return g

        @jax.jit
        def _localize_sharded(g):
            return sharded_localize_windows_gray(
                _stab(g), mesh, cfg, with_bbox=needs_frames
            )

        @functools.partial(jax.jit, static_argnames=("N", "H", "W"))
        def _localize_sharded_packed(first, packed, ei, ev, N, H, W):
            # decode + sharded localization in ONE program: XLA propagates
            # the shard_map boundary shardings back into the decode ops
            # (SPMD-partitioned for free) and no extra dispatch is paid
            from ..io.wirecodec import decode_delta4

            g = decode_delta4(first, packed, ei, ev, N, H, W)
            T = cfg.window_size
            return sharded_localize_windows_gray(
                _stab(g.reshape(N // T, T, H, W)), mesh, cfg,
                with_bbox=needs_frames,
            )

        @functools.partial(jax.jit, static_argnames=("N", "H", "W"))
        def _localize_sharded_packed6(mode, bg, lvl1, lvl2, ei, ev, N, H, W):
            from ..io.wirecodec import decode_delta6

            g = decode_delta6(mode, bg, lvl1, lvl2, ei, ev, N, H, W)
            T = cfg.window_size
            return sharded_localize_windows_gray(
                _stab(g.reshape(N // T, T, H, W)), mesh, cfg,
                with_bbox=needs_frames,
            )

    def _localize(gray_dev):
        from ..io.wirecodec import WirePacket, WirePacket6

        if isinstance(gray_dev, WirePacket6):
            from .window import localize_windows_packed6

            N, H, W = gray_dev.shape
            T = cfg.window_size
            if mesh is not None:
                return _localize_sharded_packed6(
                    gray_dev.mode, gray_dev.bg, gray_dev.lvl1, gray_dev.lvl2,
                    gray_dev.esc_idx, gray_dev.esc_val, N=N, H=H, W=W,
                )
            return localize_windows_packed6(
                gray_dev.mode, gray_dev.bg, gray_dev.lvl1, gray_dev.lvl2,
                gray_dev.esc_idx, gray_dev.esc_val,
                shape=(N // T, T, H, W), cfg=cfg,
                with_bbox=needs_frames, stab_ref=stab_ref,
            )
        if isinstance(gray_dev, WirePacket):
            from .window import localize_windows_packed

            N, H, W = gray_dev.shape
            T = cfg.window_size
            if mesh is not None:
                return _localize_sharded_packed(
                    gray_dev.first, gray_dev.packed,
                    gray_dev.esc_idx, gray_dev.esc_val, N=N, H=H, W=W,
                )
            return localize_windows_packed(
                gray_dev.first, gray_dev.packed,
                gray_dev.esc_idx, gray_dev.esc_val,
                shape=(N // T, T, H, W), cfg=cfg,
                with_bbox=needs_frames, stab_ref=stab_ref,
            )
        if mesh is not None:
            return _localize_sharded(gray_dev)
        return localize_windows_gray(gray_dev, cfg, with_bbox=needs_frames,
                                     stab_ref=stab_ref)

    def dispatch(batch):
        gray_dev, wins, cursor = batch
        with annotate("localize_dispatch"):
            table, iters = _localize(gray_dev)
        if profiling:
            # forced-completion timing: the scalar readback bounds the true
            # device time of the localization program (block_until_ready is
            # a no-op on some plugin backends, so read a value instead)
            import time as _time

            t0 = _time.perf_counter()
            int(jnp.sum(iters))
            metrics.device_stage_add("localize", _time.perf_counter() - t0)
        if use_device_tracker:
            nonlocal dev_state
            B = table.valid.shape[0]
            T = cfg.window_size
            classify = segment_filter is not None
            compacted = compact_tables(table, cfg.max_tracks, with_bbox=classify)
            cy, cx, kvalid, overflow = compacted[:4]
            fns = jnp.asarray(
                np.concatenate([np.asarray(w[1], np.int32) for w in wins]
                               + [np.full(T, -1, np.int32)] * (B - len(wins)))
            )
            active = jnp.asarray(
                np.arange(B * T) < len(wins) * T
            )  # batch-padding frames are no-ops (the reference never runs them)
            # Null frames (fn = -1: the zero-image tail of the video's last
            # window, past the inclusive-end duplicate) carry no real
            # motion.  Their RPCA output is the (0 - 1/mu) null-space term
            # of the svp length-quirk (image_filtering.py:285), whose
            # DIRECTION is numerically unspecified — LAPACK's arbitrary
            # null basis in the reference vs our row-space SVD's — so
            # "segments" there are solver-dependent noise.  The reference's
            # noise is observed to stay under the TOZERO threshold (no
            # null-frame segments, ever, across the differential corpus);
            # replicate that OBSERVED behavior deterministically instead of
            # inheriting arbitrary noise.  Found by tools/parity_fuzz.py:
            # phantom fn=-1 events on zero-tail windows.
            kvalid = kvalid & (fns >= 0).reshape(B, T)[..., None]
            if classify:
                # CLASSIFY FAST PATH (VERDICT r2 #2): the keep-mask needs
                # host crops, so the tracking scan is DEFERRED to consume —
                # compacted bbox readback -> one batched CNN forward for ALL
                # of the dispatch's segments -> keep-mask ANDed into the
                # compacted valid slots -> one track_window dispatch.  Slot
                # alignment: compact_tables' stable argsort keeps ascending
                # label order, the same order batch_call emits.  Only the
                # (B, T, K) compacted arrays are read back, not the 256-slot
                # table — and as ONE packed (5, B, T, K) int32 device array
                # (valid + 4 bbox planes), so consume pays a single host
                # round-trip instead of five (each np.asarray is its own
                # ~35 ms round-trip on this rig's tunnel).
                bbox = compacted[4]
                packed = jnp.stack(
                    (kvalid.astype(jnp.int32),) + tuple(bbox)
                )
                try:
                    # start the device->host copy NOW so consume's
                    # np.asarray finds the bytes already landed (the copy
                    # overlaps the next batch's prefetch/dispatch instead
                    # of being its own blocking ~35 ms round trip)
                    packed.copy_to_host_async()
                except AttributeError:
                    pass
                return table, iters, wins, cursor, (
                    "classify", cy, cx, kvalid, overflow, fns, active,
                    packed,
                )
            with annotate("track_dispatch"):
                dev_state, ev = track_window(
                    dev_state,
                    roi_dev,
                    cy.reshape(B * T, -1),
                    cx.reshape(B * T, -1),
                    kvalid.reshape(B * T, -1),
                    fns,
                    cfg,
                    active=active,
                    chunk=cfg.track_scan_chunk,
                )
            if profiling:
                import time as _time

                t0 = _time.perf_counter()
                int(ev.count)
                metrics.device_stage_add("track_scan", _time.perf_counter() - t0)
            # dev_state is snapshotted HERE (it already reflects this batch)
            # so a checkpoint written at consume time pairs the state with
            # this batch's cursor, not the one dispatched after it
            return table, iters, wins, cursor, (ev, overflow, dev_state)
        return table, iters, wins, cursor, None

    def consume(pending):
        nonlocal frames_processed
        metrics.stage_start("consume")
        table, iters, wins, cursor, ev = pending
        if use_device_tracker and isinstance(ev, tuple) and ev[0] == "classify":
            _, cy, cx, kvalid, overflow, fns, active, packed = ev
            nonlocal dev_state
            # compacted (5, B, T, K) readback only — ONE transfer for the
            # valid mask + 4 bbox planes (not the 256-slot table, not five
            # separate round-trips)
            import time as _time

            t0 = _time.perf_counter()
            planes = np.asarray(packed)
            metrics.stage_seconds["classify_readback"] = metrics.stage_seconds.get(
                "classify_readback", 0.0
            ) + (_time.perf_counter() - t0)
            view = _CompactTableView(
                valid=planes[0].astype(bool),
                min_y=planes[1],
                min_x=planes[2],
                max_y=planes[3],
                max_x=planes[4],
            )
            B = view.valid.shape[0]
            T = cfg.window_size
            K = cfg.max_tracks
            frames_by_bt = {
                (b, t): wins[b][0][t]
                for b in range(len(wins))
                for t in range(T)
                if view.valid[b, t].any()
            }
            # FUSED CLASSIFY (VERDICT r4 #1): one program per batch — CNN
            # preprocessing + forward + keep-mask scatter + tracking scan —
            # with a single packed meta upload and only event buffers read
            # back.  Falls back to the two-program path when a crop exceeds
            # every device canvas bucket or classify_fused=False.
            fused_args = None
            if (
                cfg.classify_fused
                and frames_by_bt
                and getattr(segment_filter, "supports_fused", False)
            ):
                from .classify_fused import classify_track_fused, pack_fused

                with annotate("classify_pack"):
                    fused_args = pack_fused(
                        segment_filter, view, frames_by_bt, crop_region,
                        timers=metrics.stage_seconds,
                    )
            if fused_args is not None:
                canv, meta, mx = fused_args
                coeff = segment_filter._coeff_table(mx)
                t0 = _time.perf_counter()
                with annotate("classify_track_fused"):
                    dev_state, evs, n_kept = classify_track_fused(
                        segment_filter.params, coeff,
                        jnp.asarray(canv), jnp.asarray(meta),
                        dev_state, roi_dev, cy, cx, kvalid, fns, active,
                        cfg, cfg.track_scan_chunk,
                    )
                metrics.stage_seconds["classify_device"] = (
                    metrics.stage_seconds.get("classify_device", 0.0)
                    + (_time.perf_counter() - t0)
                )
                ev = (evs, overflow, dev_state, n_kept)
            elif frames_by_bt:
                with annotate("classify"):
                    keep_masks = segment_filter.batch_call(
                        view, frames_by_bt, crop_region, **_filter_timer_kw
                    )
                keep = np.ones((B, T, K), bool)
                n_seg = 0
                for (b, t), kl in keep_masks.items():
                    n_seg += sum(1 for k in kl if k)
                    for j, keep_j in enumerate(kl[:K]):
                        keep[b, t, j] = keep_j
                metrics.segments_total += n_seg
                with annotate("track_dispatch"):
                    dev_state, evs = track_window(
                        dev_state,
                        roi_dev,
                        cy.reshape(B * T, -1),
                        cx.reshape(B * T, -1),
                        (kvalid & jnp.asarray(keep)).reshape(B * T, -1),
                        fns,
                        cfg,
                        active=active,
                        chunk=cfg.track_scan_chunk,
                    )
                ev = (evs, overflow, dev_state)
            else:
                # no valid segments anywhere in the batch: nothing to
                # classify — track directly (kvalid already gated)
                with annotate("track_dispatch"):
                    dev_state, evs = track_window(
                        dev_state,
                        roi_dev,
                        cy.reshape(B * T, -1),
                        cx.reshape(B * T, -1),
                        kvalid.reshape(B * T, -1),
                        fns,
                        cfg,
                        active=active,
                        chunk=cfg.track_scan_chunk,
                    )
                ev = (evs, overflow, dev_state)
        if use_device_tracker:
            ev, overflow, state_snapshot, *rest = ev
            if rest:
                # FUSED CLASSIFY: defer this batch's readback one batch.
                # The async copies start the device->host transfers now;
                # the fused program's device time and the round trip then
                # overlap the next batch's prefetch/host work instead of
                # blocking here.  Draining the PREVIOUS batch first keeps
                # events chronological.
                for leaf in jax.tree.leaves((ev, overflow, *rest)):
                    try:
                        leaf.copy_to_host_async()
                    except AttributeError:
                        pass
                to_drain = deferred_ev[0]
                deferred_ev[0] = (ev, overflow, rest, len(wins))
                if to_drain is not None:
                    _drain_device_events(*to_drain)
            else:
                _drain_device_events(ev, overflow, rest, len(wins))
            for b, (frames, numbers, stamps) in enumerate(wins):
                ialm_iters.append(int(np.asarray(iters)[b]))
                frames_processed += sum(1 for x in numbers if x >= 0)
                metrics.windows += 1
            metrics.batches += 1
            metrics.frames_processed = frames_processed
            if (
                checkpoint_path is not None
                and metrics.batches % checkpoint_interval_batches == 0
            ):
                from ..utils.checkpoint import (
                    save_checkpoint_device,
                    source_fingerprint,
                )

                # the checkpoint pairs THIS batch's cursor with THIS
                # batch's state — a deferred event buffer must land in
                # tracker.events first or resume would drop its events
                if deferred_ev[0] is not None:
                    _drain_device_events(*deferred_ev[0])
                    deferred_ev[0] = None
                save_checkpoint_device(
                    checkpoint_path, cursor[0], frames_processed,
                    state_snapshot, tracker.events,
                    source_info=source_fingerprint(source),
                )
            metrics.stage_stop("consume")
            if status_cb is not None:
                status_cb(frames_processed, source.total_frames)
            return
        table = jax.tree.map(np.asarray, table)  # waits for the device
        # Batchable filters classify the WHOLE dispatch in one device
        # forward (identical per-image results; per-frame dispatches pay
        # the host link round trip per non-empty frame — VERDICT r2 #2).
        keep_masks = None
        if segment_filter is not None and hasattr(segment_filter, "batch_call"):
            # numbers[t] >= 0 mirrors the device path's kvalid gate: null
            # frames (fn = -1) carry only solver-dependent RPCA noise whose
            # centroids are forced empty below anyway — classifying them is
            # wasted CNN forwards + host crops (ADVICE r4).
            frames_by_bt = {
                (b, t): frames[t]
                for b, (frames, numbers, _) in enumerate(wins)
                for t in range(cfg.window_size)
                if numbers[t] >= 0 and table.valid[b, t].any()
            }
            with annotate("classify"):
                keep_masks = segment_filter.batch_call(
                    table, frames_by_bt, crop_region, **_filter_timer_kw
                )
        for b, (frames, numbers, stamps) in enumerate(wins):
            ialm_iters.append(int(np.asarray(iters)[b]))
            for t in range(cfg.window_size):
                # Null frames (fn = -1) yield no real segments — their RPCA
                # output is unspecified null-space noise; see the identical
                # gate on the device path above (kvalid &= fns >= 0).
                null_frame = numbers[t] < 0
                centroids = (
                    [] if null_frame
                    else extract_frame_segments_batched(table, b, t)
                )
                keep = None
                if null_frame:
                    pass  # tracker still steps (the reference pops null
                    #       frames through the tracker; with no segments
                    #       its live tracks terminate here, as observed)
                elif keep_masks is not None:
                    keep = keep_masks.get((b, t), [])
                    centroids = [c for c, k in zip(centroids, keep) if k]
                elif segment_filter is not None:
                    keep = segment_filter(table, (b, t), frames[t], crop_region)
                    centroids = [c for c, k in zip(centroids, keep) if k]
                tracker.step(centroids, numbers[t], stamps[t])
                if export_segments_dir is not None and not null_frame:
                    from ..io.segments_export import export_frame_segments

                    # the reference filters segments BEFORE export
                    # (__main__.py:84-96): rejected segments produce no
                    # PNGs, survivors relabel 1..N
                    export_frame_segments(
                        frames[t], table, (b, t), numbers[t], crop_region,
                        export_segments_dir, source.filepath.stem, cfg,
                        keep=keep,
                    )
                metrics.segments_total += len(centroids)
                if numbers[t] >= 0:
                    frames_processed += 1
            metrics.windows += 1
        metrics.batches += 1
        metrics.frames_processed = frames_processed
        if checkpoint_path is not None and metrics.batches % checkpoint_interval_batches == 0:
            from ..utils.checkpoint import source_fingerprint

            save_checkpoint(
                checkpoint_path, cursor[0], frames_processed, tracker,
                source_info=source_fingerprint(source),
            )
        metrics.stage_stop("consume")
        if status_cb is not None:
            status_cb(frames_processed, source.total_frames)

    # Software pipeline: the prefetch thread reads/grayscales/uploads ahead;
    # here we dispatch batch k+1 before consuming batch k so host tracking
    # overlaps device compute and transfers.
    try:
        pending = None
        while True:
            metrics.stage_start("prefetch_wait")
            batch = prefetcher.next()
            metrics.stage_stop("prefetch_wait")
            nxt = dispatch(batch) if batch is not None else None
            if pending is not None:
                with annotate("consume"):
                    consume(pending)
            pending = nxt
            if nxt is None:
                break
    finally:
        prefetcher.close()
        if trace_active:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

    if use_device_tracker and deferred_ev[0] is not None:
        # flush the last batch's deferred event buffers (fused classify)
        _drain_device_events(*deferred_ev[0])
        deferred_ev[0] = None

    events = tracker.events
    metrics.events = len(events)
    metrics.ialm_iters = ialm_iters
    metrics.read_errors = source.read_errors
    metrics.wire_bytes = prefetcher.wire_bytes
    df_labels = classify_events(events, cfg) if events else None

    total_pred = total_rej = 0
    out_dir = None
    if df_labels is not None and export_dir is not None:
        out_dir = Path(export_dir)
        if debug:
            out_dir = generate_test_dir(out_dir)
        export_results(
            out_dir, df_labels, source.fps, source.start_frame, source.end_frame
        )
    if df_labels is not None:
        total_pred = int((df_labels["label"] > 0).sum())
        total_rej = int((df_labels["label"] == 0).sum())

    if out_dir is not None:
        metrics.write_manifest(Path(out_dir) / "run_manifest.json")
    elif profile_dir is not None:
        metrics.write_manifest(Path(profile_dir) / "run_manifest.json")
    return VideoResult(
        events=events,
        df_labels=df_labels,
        total_predicted=total_pred,
        total_rejected=total_rej,
        frames_processed=frames_processed,
        ialm_iters=ialm_iters,
        export_dir=out_dir,
        metrics=metrics,
    )
