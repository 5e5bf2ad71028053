"""swiftwatcher-tpu: a TPU-native chimney-swift counting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
joshuacwnewton/swiftwatcher: RPCA background subtraction over 21-frame
windows, fused motion filtering, on-device connected-component segmentation
and region statistics, Hungarian-assignment tracking, chimney-ROI event
detection, flight-angle event classification, and PREDICTED/REJECTED CSV
export — with the per-frame Python of the reference replaced by compiled
per-window XLA programs and host->HBM window streaming.
"""

from .config import PipelineConfig, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "DEFAULT_CONFIG",
    "run_video",
    "open_source",
    "__version__",
]


def __getattr__(name):
    # Lazy top-level API (PEP 562): `from swiftwatcher_tpu import run_video,
    # open_source` without importing the whole pipeline (and jax) at package
    # import — tools that only want PipelineConfig stay light.
    if name == "run_video":
        from .pipeline.runner import run_video

        return run_video
    if name == "open_source":
        from .io.readers import open_source

        return open_source
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
