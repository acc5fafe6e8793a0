"""Pallas TPU kernels for the framework's hot non-conv paths."""

from satellite_computervision_tpu.pallas.preprocess import fused_preprocess

__all__ = ["fused_preprocess"]
