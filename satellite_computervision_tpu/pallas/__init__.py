"""Pallas TPU kernels for the framework's hot non-conv paths."""

from satellite_computervision_tpu.pallas.preprocess import fused_preprocess
from satellite_computervision_tpu.pallas.stitch import hann_inverse_weights, hann_stitch

__all__ = ["fused_preprocess", "hann_stitch", "hann_inverse_weights"]
