"""Hybrid U-Net + ConvLSTM model.

Reference: get_hybrid_model (utils/model_tools.py:874-920): a U-Net branch
over high-resolution imagery (NAIP scale) and a ConvLSTM branch over a
coarser timeseries (S2/S1), each reduced to ``n_classes`` channels by a
1x1 ReLU conv; the LSTM output is nearest-resized onto the U-Net grid,
concatenated, and fused by a 1x1 softmax conv.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from satellite_computervision_tpu.models.blocks import ConvBlock, DecoderBlock, EncoderBlock
from satellite_computervision_tpu.models.convlstm import LSTMStack


class UNetTrunk(nn.Module):
    """build_unet_layers (utils/model_tools.py:321-379) without a head."""

    filters: Sequence[int] = (32, 64, 128, 256)
    factors: Sequence[int] = (3, 2, 2, 2)
    dropout: Optional[float] = None
    convs_per_block: int = 2
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        skips = []
        for feat, factor in zip(self.filters, self.factors):
            x, skip = EncoderBlock(
                feat, pool=(factor, factor), n_convs=self.convs_per_block, **common
            )(x, train)
            skips.append(skip)
        x = ConvBlock(self.filters[-1] * 2, n_convs=self.convs_per_block, **common)(x, train)
        for feat, factor, skip in zip(
            reversed(self.filters), reversed(self.factors), reversed(skips)
        ):
            x = DecoderBlock(feat, up=(factor, factor), dropout=self.dropout, **common)(
                x, skip, train
            )
        return x


class HybridUNetLSTM(nn.Module):
    n_classes: int
    filters: Sequence[int] = (32, 64, 128, 256)
    factors: Sequence[int] = (3, 2, 2, 2)
    lstm_features: int = 64
    dropout: Optional[float] = None
    # convs_per_block=1 reproduces the shipped conv_block double-call bug
    # (utils/model_tools.py:238-239) — required to receive reference .h5
    # weights via train.keras_import.load_keras_hybrid_h5
    convs_per_block: int = 2
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, unet_input, lstm_input, train: bool = False):
        common = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        unet_out = UNetTrunk(
            self.filters, self.factors, dropout=self.dropout,
            convs_per_block=self.convs_per_block, **common, name="unet"
        )(jnp.asarray(unet_input, self.dtype), train)
        if self.dropout is not None:
            unet_out = nn.Dropout(
                self.dropout, broadcast_dims=(1, 2), deterministic=not train
            )(unet_out)
        unet_dense = nn.relu(
            nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="unet_dense")(unet_out)
        )

        lstm_out = LSTMStack(self.lstm_features, dropout=self.dropout, **common)(
            jnp.asarray(lstm_input, self.dtype), train
        )
        if self.dropout is not None:
            lstm_out = nn.Dropout(
                self.dropout, broadcast_dims=(1, 2), deterministic=not train
            )(lstm_out)
        lstm_dense = nn.relu(
            nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="lstm_dense")(lstm_out)
        )
        lstm_resized = jax.image.resize(
            lstm_dense,
            (lstm_dense.shape[0], unet_dense.shape[1], unet_dense.shape[2], self.n_classes),
            method="nearest",
        )

        fused = jnp.concatenate([lstm_resized, unet_dense], axis=-1)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="probabilities")(
            fused
        ).astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        return {
            "logits": logits,
            "probs": probs,
            "classes": jnp.argmax(probs, -1).astype(jnp.int32),
        }
