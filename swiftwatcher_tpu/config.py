"""Typed configuration for the swiftwatcher-tpu pipeline.

Every algorithm constant that the reference hardcodes as a literal is a named
field here, so parity configurations are explicit and sweepable.  Reference
call sites for each default are cited inline (paths relative to
/root/reference/swiftwatcher/).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """All tunables of the swift counting pipeline.

    Defaults replicate the reference exactly (see citations per field).
    """

    # ----- windowing -------------------------------------------------------
    # data_structures.py:120  FrameQueue(queue_size=21)
    window_size: int = 21

    # ----- RPCA / IALM ------------------------------------------------------
    # image_filtering.py:256  inexact_augmented_lagrange_multiplier defaults
    rpca_lambda: float = 0.01
    rpca_tol: float = 0.001
    rpca_max_iter: int = 100
    rpca_rho: float = 1.5            # image_filtering.py:277
    rpca_mu_cap: float = 1e7         # image_filtering.py:295 (mu*1e7 cap factor)

    # ----- motion post-filtering -------------------------------------------
    # data_structures.py:194  bilateral_blur(frame, 7, 15, 1)
    bilateral_d: int = 7
    bilateral_sigma_color: float = 15.0
    bilateral_sigma_space: float = 1.0
    # data_structures.py:198  thresh_to_zero(frame, 15)
    motion_threshold: int = 15
    # data_structures.py:202  grayscale_opening(frame, (3, 3))
    opening_size: Tuple[int, int] = (3, 3)

    # ----- segmentation -----------------------------------------------------
    # image_filtering.py:329: labels cast to uint8 -> max 255 distinct labels,
    # labels alias mod 256.  Table capacity of 256 reproduces that exactly
    # (slot k holds the union of all components whose compacted label ≡ k).
    label_modulus: int = 256
    # Max CCL propagation sweeps (bounded flood fill; birds are small blobs).
    ccl_max_iters: int = 256
    # __main__.py:78  min segment bbox size for crop extraction
    min_seg_size: Tuple[int, int] = (24, 24)

    # ----- tracking ---------------------------------------------------------
    # segment_tracking.py:196  dist_cost = 2 ** (dist - 25)
    dist_cost_knee: float = 25.0
    # segment_tracking.py:241  angle_cost = 2 ** (angle_difference - 90)
    angle_cost_knee: float = 90.0
    # segment_tracking.py:254  non-match cost
    nonmatch_cost: float = 1.0
    # Track-table capacity for the on-device tracking scan (padded); the host
    # tracker is capacity-free.  Realistic frames hold <10 segments.
    max_tracks: int = 24
    # Exponent clamp for finite-precision cost computation on device (any
    # clamped entry is already astronomically above the non-match cost 1, so
    # the assignment is unchanged; avoids f32 inf in the LAP solver).
    cost_exp_clamp: float = 60.0

    # ----- event classification --------------------------------------------
    # event_classification.py:95  drop angles that are multiples of 15 deg
    false_angle_multiple: float = 15.0
    # OPT-IN accuracy extension (0.0 = exact reference behavior): only drop
    # false angles when the path's first->last displacement is below this
    # many pixels.  The 15-deg-multiple drop targets grid artifacts of tiny
    # opened segments (which move a couple px); a real dive at exactly -90
    # deg moves tens of px and is a true entry the reference miscounts
    # (measured: crowded-corpus detection misses in ACCURACY_r04.json).
    false_angle_min_disp: float = 0.0
    # event_classification.py:110-114  label 1 iff angle in (mode-30, mode+30)
    angle_band_halfwidth: float = 30.0
    # event_classification.py:124  36-bin histogram over [-180, 180]
    angle_hist_bins: int = 36
    # event_classification.py:131  mode only trusted inside (-135, -45)
    mode_valid_range: Tuple[float, float] = (-135.0, -45.0)
    default_mode: float = -90.0      # event_classification.py:139

    # ----- geometry ---------------------------------------------------------
    # image_filtering.py:50-51  crop box ratios (1.25w x 0.625w)
    crop_side_ratio: float = 0.125
    crop_up_ratio: float = 0.5
    crop_down_ratio: float = 0.125
    # image_filtering.py:72-73  ROI strip ratios
    roi_inset_ratio: float = 0.025
    roi_height_ratio: float = 0.25
    # image_filtering.py:24  fixed resize dim (unused downstream, kept for
    # interface parity with generate_regions)
    resize_dim: Tuple[int, int] = (300, 150)
    # image_filtering.py:105-110  ROI mask build constants
    roi_median_ksize: int = 9
    roi_dilate_n: int = 20

    # ----- classifier --------------------------------------------------------
    # segment_classification.py:18-24 preprocessing constants
    cnn_input_size: int = 224
    cnn_resize_to: int = 24
    cnn_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    cnn_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # Per-window cap on segments routed through the CNN (padded batch).
    cnn_batch_cap: int = 64
    # Device-side preprocessing (models/preprocess.py): bit-exact PIL resize
    # as int32 matmuls on device.  Segments larger than cnn_max_seg_hw on a
    # side (rare — birds are small) fall back to the host PIL path.
    cnn_device_preprocess: bool = True
    cnn_max_seg_hw: int = 64
    # Fuse the CNN keep-mask into the tracking-scan program (device tracker
    # only): one dispatch + one meta upload per batch instead of the r4
    # path's separate classify program (3 uploads + keep readback + track
    # dispatch each paid a ~35 ms tunnel round trip — VERDICT r4 #1).
    # Bit-identical keep decisions by construction (pipeline/classify_fused
    # .py); False restores the two-program path for A/Bs.
    classify_fused: bool = True

    # ----- execution ---------------------------------------------------------
    # Compute dtype for the IALM loop.  float32 is the TPU-native choice; the
    # reference runs float64 NumPy.  Tests may use float64 on CPU for
    # bit-accurate checks.
    rpca_dtype: str = "float32"
    # Number of host prefetch buffers for window streaming.  Measured on the
    # v5e rig (warm programs, device tracker, best-of-3): depth 2 -> 379
    # fps, 4 -> 503, 6 -> 530, 8 -> 505 with the delta4 codec — deeper
    # queueing absorbs the link's latency jitter until the extra staging
    # slots start competing with it; host cost is <= ~32 MB per slot.
    prefetch_depth: int = 6
    # Windows per device dispatch: amortizes host->device round-trip latency
    # (the per-call overhead dwarfs compute for a single 21-frame window).
    # Swept end-to-end on the v5e rig (delta4 codec, depth-6 prefetch,
    # best-of-3): 8 -> 358 fps, 12 -> 402, 16 -> 480, 24 -> 423 — 16
    # balances dispatch amortization against transfer granularity (bigger
    # uploads overlap worse on a slow link).
    batch_windows: int = 16
    # Use the fused Pallas motion-filter kernel on TPU (bit-identical to the
    # XLA chain; one HBM round trip instead of four).
    use_pallas_postfilter: bool = True
    # Fuse the IALM E/M/Gram front into one Pallas pass on TPU.  Only
    # relevant when rpca_warm_basis is off: the warm-basis solver never
    # forms the per-iteration Gram, so the fused front's main output would
    # be discarded (measured slower in that combination).
    use_pallas_rpca: bool = True
    # Carry the row-space eigenbasis across IALM iterations (skips the
    # per-iteration Gram + eigh; the polish round re-converges the basis).
    # Measured on v5e: ~8% faster than the fused-front cold-start solver at
    # identical iteration counts and within the established +-2 uint8 motion
    # envelope (see ops/rpca.py and git history for the numbers).
    rpca_warm_basis: bool = True
    # IALM storage dtypes (CLAUDE.md backlog #3 — HBM-traffic cuts below the
    # solver's roofline; compute stays f32 everywhere):
    # Hold X as uint8 between uses inside the solver.  LOSSLESS (grayscale
    # windows are uint8-valued; integers 0..255 are exact under the f32
    # upcast), bit-identical output, measured -12% ms/trip on v5e.  Ignored
    # on the fused-front path (the Pallas kernel reads f32 X).
    rpca_store_x_u8: bool = True
    # Round the loop-carried A/E/Y to bfloat16 between iterations.  LOSSY:
    # max +-1 uint8 motion drift on ~0.007% of pixels (within the warm-basis
    # +-2 envelope), iteration counts +-1, measured -27% ms/trip on v5e.
    # Count parity verified across the oracle/hard-scene corpus with the
    # flag on (tests/test_rpca_storage.py).  Only applied when rpca_dtype is
    # float32 (f64 runs are strict-parity validation).
    rpca_state_bf16: bool = True
    # Opt-in fixed-trip IALM (VERDICT r4 #4a): run EXACTLY this many
    # iterations as a fori_loop, dropping the stopping-criterion Z-norm
    # reduction and the per-window freeze masks.  Bit-identical to the
    # dynamic loop when every window's dynamic count equals this value
    # (measured production behavior: spread ZERO at 15 iters on the bench
    # scene), DIVERGENT otherwise — so default 0 keeps the reference-exact
    # dynamic stopping (image_filtering.py:256-301).  Measured on chip:
    # 1.353x solver speedup (RPCA_FIXED_AB_r05.json); zero event-count
    # divergence across a 40-scene campaign (RPCA_FIXED_COUNTS_r05.json).
    # CAVEAT: windows whose dynamic count would EXCEED this value get an
    # under-converged motion estimate (the risky direction — extra
    # iterations only refine); validate per deployment with
    # tools/rpca_fixed_ab.py's precheck (it reports the scene's dynamic
    # min/max) before enabling on new footage.
    rpca_fixed_iters: int = 0
    # Decode HDF5 JPEG frames with the native C++ pump straight to cropped
    # grayscale (threaded libjpeg, off the GIL).  Opt-in: system libjpeg's
    # IDCT may differ from cv2's bundled build by +-1 count per pixel.
    native_decode: bool = False
    # Decode containers straight to the grayscale chimney crop through the
    # native libav backend (avpump.cpp slice conversion; no full-frame
    # BGR).  Default ON because engagement is probe-gated BIT-EXACT against
    # the full-frame path per file and geometry — unlike the HDF5 libjpeg
    # path above, there is no decoder-build ambiguity to opt into.
    av_gray_decode: bool = True
    # ----- wire transport (io/wirecodec.py) ---------------------------------
    # Host->device transport for the gray window batches: "off" ships raw
    # uint8; "delta6" (wire codec v2) ships bit-lossless predictive base-6
    # residuals (~2.9 bits/pixel on the bench scene vs the residual stream's
    # ~2.6 bit/pixel entropy floor — 34.0 KB/frame vs raw 93.3, delta4
    # 47.8); "delta4" is the simpler fixed 4-bit v1 format; "auto" measures
    # the upload link rate (best of 3 probes) and enables delta6 below
    # wire_auto_mbps — on a real >10 GB/s v5e host link raw wins (the host
    # encode would cost more than it saves), on a network-camera hop or
    # this rig's ~36 MB/s tunnel the codec ~tripled e2e.  All formats
    # decode on device as a prologue of the localization program.
    wire_codec: str = "auto"
    # Capacity of the per-batch escape side stream (residuals outside
    # [-7, 7]: moving birds, exposure steps).  Overflow falls back to a raw
    # upload for that batch — correctness never depends on content.
    wire_escape_cap: int = 65536
    wire_auto_mbps: float = 1000.0
    # delta6 stream-size bucket quanta (bytes / entries): variable-length
    # level-2/3 streams pad up to monotonic multiples of these so the
    # decode program shape set stays tiny (one in steady state; see
    # io/prefetch.py).  Shipped padding is <= one quantum per stream.
    wire_lvl2_quantum: int = 131072
    wire_esc3_quantum: int = 4096
    # Frames per device-tracker scan step (pipeline/tracking_jax.py).
    # 1 = per-frame (best for scenes with segments in most frames, e.g.
    # the synthetic bench); 8 skips empty-sky stretches a chunk at a time
    # (−30% scan time on all-empty footage; output identical — tested).
    track_scan_chunk: int = 1
    # Enumeration LAP threshold for the device tracker: frames whose live
    # tracks AND segments both fit in the first N slots skip the sequential
    # JV Dijkstra and score all partial matchings of an N x N block in one
    # vectorized pass (exact decomposition of the padded assignment — see
    # tracking_jax._prev_match_enum).  Busier frames fall back to the full
    # JV solve behind a lax.cond.  0 disables; capped at 6 (pattern table
    # growth).  Realistic swift footage holds <=3 simultaneous segments.
    # DEFAULT 4 since the r4 on-chip A/B (tools/tracker_budget.py,
    # interleaved same-process): dense-stream scan 46.2 -> 8.2 ms/336f
    # (5.63x), mixed 3.59x, event checksums identical; bit-identical to JV
    # on 520+ float-centroid fuzz streams (ties on integer-snapped
    # centroids proven optimal-within-rounding, PARITY deviation 10).
    track_enum_lap: int = 4
    # Stack the tracker scan step's small scatters/gathers (pipeline/
    # tracking_jax.py): the 5 event-buffer scatters become 2 (one (cap, 4)
    # f32 + one int32; stacked carry layout, converted at the track_window
    # boundary) and the 5 track-linking gathers one (K, 5) row gather
    # (int32 hist_len rides a bitcast — value-exact).  Outputs are
    # bit-identical either way (tested); whether XLA wasn't already fusing
    # these is an on-chip A/B question — default off until measured
    # (CLAUDE.md backlog 0; same primitive-count argument as the shipped
    # scan argsort removals).
    track_stacked_ops: bool = False

    # ----- extensions beyond the reference ----------------------------------
    # Opt-in electronic image stabilization (ops/stabilize.py).  The
    # reference has NO countermeasure for camera shake: RPCA's low-rank
    # background model assumes a static scene, so even +-2 px jitter turns
    # every structure edge into sparse "motion" and detection collapses
    # (ACCURACY corpus scene jitter2: detection F1 0.5 at defaults).  When
    # > 0, each window's frames are aligned to the window's temporal mean
    # by an exhaustive integer-shift SAD search over +-stabilize_max_shift
    # pixels before RPCA, inside the same compiled program.  0 (default)
    # is a compile-time no-op and preserves bit-exact reference parity.
    stabilize_max_shift: int = 0


DEFAULT_CONFIG = PipelineConfig()

# The CLI's --accuracy-pack preset: the three opt-in extensions together,
# at the values validated on the 12-scene accuracy corpus (ACCURACY_r04:
# detection AVG F1 0.9205 -> 0.9833, det+class 0.7750 -> 0.9881) and
# seed-robust across 30 fresh draws (ACCURACY_SEEDS_r04: 13/18 wins, 0
# losses).  Kept as --set-style strings so explicit --set flags override
# them (config_with_overrides applies in order, later wins).
ACCURACY_PACK_OVERRIDES = (
    "angle_band_halfwidth=60",
    "false_angle_min_disp=5",
    "stabilize_max_shift=3",
)


def config_with_overrides(overrides, base: PipelineConfig = DEFAULT_CONFIG) -> PipelineConfig:
    """Apply "field=value" override strings (the CLI's --set flag).

    Values are parsed with the field's current type (bool accepts
    true/false/1/0; tuples accept comma-separated items)."""
    cfg = base
    for item in overrides:
        field, _, raw = item.partition("=")
        field = field.strip()
        if not hasattr(cfg, field):
            raise ValueError(f"unknown config field: {field!r}")
        current = getattr(cfg, field)
        if isinstance(current, bool):
            value = raw.strip().lower() in ("1", "true", "yes", "on")
        elif isinstance(current, int):
            value = int(raw)
        elif isinstance(current, float):
            value = float(raw)
        elif isinstance(current, tuple):
            elem = type(current[0])
            value = tuple(elem(v) for v in raw.split(","))
        else:
            value = raw
        cfg = dataclasses.replace(cfg, **{field: value})
    return cfg
