"""Host-side cloud acquisition + on-device preprocessing equivalents.

Reference: utils/ee_tools.py, utils/calibration.py, utils/pc_tools.py.
Split into:

- ``masking``   — the *math* of the EE per-pixel ops (cloud/water/shadow
                  scores, QA masks, TOA conversion) as jittable JAX,
                  runnable on raw arrays on-device;
- ``calibration`` — histogram-matching cross-scene calibration as NumPy/
                  JAX (the EE random-forest CDF-matching pipeline's
                  array equivalent);
- ``ee``        — thin Earth Engine client builders (import-gated: the
                  ``ee`` package is optional);
- ``pc``        — Planetary Computer STAC acquisition (import-gated on
                  pystac-client/stackstac);
- ``blob``      — Azure-blob/https object IO with a stdlib fallback.
"""

from satellite_computervision_tpu.cloud import masking, calibration, blob

__all__ = ["masking", "calibration", "blob", "ee", "pc"]
