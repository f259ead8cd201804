"""CPU NumPy oracle (reference-faithful) implementations."""

from lidar_ai_recommendation_software_tpu.oracle import reference  # noqa: F401
