"""Geospatial raster/vector utilities, self-contained (no GDAL/rasterio).

Reference: utils/raster_tools.py (rasterio/GDAL-based writers and affine
helpers). This package implements the needed subset of GeoTIFF/COG
directly so scene exports work in any environment.
"""

from satellite_computervision_tpu.geo.geotiff import (
    write_geotiff,
    write_cog,
    read_geotiff,
    GeoTiffScene,
    GeoTiffStreamWriter,
    GeoTiffCogStreamWriter,
)
from satellite_computervision_tpu.geo.transforms import (
    Affine,
    geo_transform_from_mixer,
    pixel_to_geo,
    geo_to_pixel,
    convert_poly_coords,
    convert_yolo_bbox,
    make_window,
    win_jitter,
    make_jittered_window,
    array_bounds,
)

__all__ = [
    "write_geotiff",
    "write_cog",
    "read_geotiff",
    "GeoTiffScene",
    "GeoTiffStreamWriter",
    "GeoTiffCogStreamWriter",
    "Affine",
    "geo_transform_from_mixer",
    "pixel_to_geo",
    "geo_to_pixel",
    "convert_poly_coords",
    "convert_yolo_bbox",
    "make_window",
    "win_jitter",
    "make_jittered_window",
    "array_bounds",
]
