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

__all__ = ["PipelineConfig", "DEFAULT_CONFIG", "__version__"]
