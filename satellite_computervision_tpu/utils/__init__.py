"""Framework utilities: profiling, structured logging, visualization.

The reference's observability is Keras verbose output + TensorBoard
callbacks + print statements (SURVEY.md §5). Here: ``jax.profiler`` trace
capture, per-stage wall timing, JSONL structured logs, and the figure/
image helpers used for qualitative checks.
"""

from satellite_computervision_tpu.utils.profiling import (
    Timer,
    stage_timer,
    trace,
    device_memory_stats,
)
from satellite_computervision_tpu.utils.logging import MetricsLogger
from satellite_computervision_tpu.utils.viz import plot_to_image, save_rgb_image

__all__ = [
    "Timer",
    "stage_timer",
    "trace",
    "device_memory_stats",
    "MetricsLogger",
    "plot_to_image",
    "save_rgb_image",
]
