"""TPU-native LiDAR crowd-analytics engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
FortuneMU2025/LIDAR_AI_Recommendation_Software: point-cloud ingest,
preprocessing (outlier rejection, ground split, person clustering), crowd
density and flow analytics, recommendations, reporting and persistence —
built TPU-first with static shapes, masked fixed-capacity tensors, Pallas
kernels for the hot ops and jax.sharding for multi-chip scale.
"""

__version__ = "0.1.0"

from lidar_ai_recommendation_software_tpu.config import (  # noqa: F401
    MODULAR_CONFIG,
    MONOLITH_CONFIG,
    PipelineConfig,
)
