"""Flax model zoo mirroring the reference's Keras builders (utils/model_tools.py).

All models are channels-last (NHWC — the TPU-native conv layout), take a
``dtype`` for bfloat16 MXU compute with float32 params, and return dicts of
named heads matching the reference's multi-output Keras models.
"""

from satellite_computervision_tpu.models import losses, metrics
from satellite_computervision_tpu.models.blocks import (
    ConvBNAct,
    ConvBlock,
    EncoderBlock,
    DecoderBlock,
    ASPP,
)
from satellite_computervision_tpu.models.unet import UNet, unet_solar, unet_parking
from satellite_computervision_tpu.models.siamese import SiameseUNet
from satellite_computervision_tpu.models.convlstm import ConvLSTM, LSTMModel, LSTMAutoencoder
from satellite_computervision_tpu.models.acnn import ACNN, HierarchicalACNN
from satellite_computervision_tpu.models.hybrid import HybridUNetLSTM
from satellite_computervision_tpu.models.deeplab import DeepLabV3Plus
from satellite_computervision_tpu.models.fold import fold_conv_bn, fold_unet_variables

__all__ = [
    "losses",
    "metrics",
    "ConvBNAct",
    "ConvBlock",
    "EncoderBlock",
    "DecoderBlock",
    "ASPP",
    "UNet",
    "unet_solar",
    "unet_parking",
    "SiameseUNet",
    "ConvLSTM",
    "LSTMModel",
    "LSTMAutoencoder",
    "ACNN",
    "HierarchicalACNN",
    "HybridUNetLSTM",
    "DeepLabV3Plus",
]
