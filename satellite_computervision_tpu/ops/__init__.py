"""Core image math, re-designed as pure jittable JAX functions.

Reference behaviors reproduced (bit-for-band where well-defined):
utils/processing.py:116-322 and utils/array_tools.py:12-298.
"""

from satellite_computervision_tpu.ops.normalize import (
    normalize_image,
    rescale_image,
    normalize_timeseries,
)
from satellite_computervision_tpu.ops.augment import (
    aug_color,
    aug_color_hsv,
    rgb_to_hsv,
    hsv_to_rgb,
    aug_morph,
    draw_morph_params,
    apply_morph,
)
from satellite_computervision_tpu.ops.classes import (
    merge_classes,
    one_hot,
)
from satellite_computervision_tpu.ops.harmonics import (
    sin_cos,
    make_harmonics,
    add_harmonic,
)
from satellite_computervision_tpu.ops.chips import (
    generate_chip_indices,
    extract_chips,
    stitch_chips,
)
from satellite_computervision_tpu.ops.bands import calc_ndvi

__all__ = [
    "normalize_image",
    "rescale_image",
    "normalize_timeseries",
    "aug_color",
    "aug_color_hsv",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "aug_morph",
    "draw_morph_params",
    "apply_morph",
    "merge_classes",
    "one_hot",
    "sin_cos",
    "make_harmonics",
    "add_harmonic",
    "generate_chip_indices",
    "extract_chips",
    "stitch_chips",
    "calc_ndvi",
]
