"""satellite_computervision_tpu — a TPU-native satellite imagery segmentation framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
mjevans26/Satellite_ComputerVision (see /root/reference and SURVEY.md):

- ``ops``       core image math: normalization, rescaling, augmentation,
                class merging, harmonics, chip indexing/stitching
                (reference: utils/processing.py, utils/array_tools.py)
- ``models``    flax model zoo: U-Net, Siamese U-Net + ASPP, ConvLSTM,
                LSTM-autoencoder, hybrid, ACNN, hierarchical, DeepLab-v3+
                (reference: utils/model_tools.py)
- ``data``      TFRecord + .npy chip ingestion, file matching, host->device
                prefetch (reference: utils/processing.py generators)
- ``train``     jit train/eval steps, metrics, best-metric checkpointing
                (reference: utils/model_tools.py retrain/checkpoint flow)
- ``inference`` batched overlap-tile full-scene inference + mixer reassembly
                (reference: utils/prediction_tools.py)
- ``geo``       GeoTIFF/COG writers, affine geo<->pixel transforms
                (reference: utils/raster_tools.py)
- ``parallel``  mesh construction, data/spatial-parallel train + inference
- ``cloud``     thin host-side Earth Engine / Planetary Computer / blob
                clients (import-gated; reference: utils/ee_tools.py,
                utils/pc_tools.py, utils/calibration.py)
"""

__version__ = "0.1.0"

__all__ = [
    "ops",
    "models",
    "data",
    "train",
    "inference",
    "geo",
    "parallel",
    "cloud",
]
