"""Parametric U-Net (multiclass / binary / autoencoder heads).

Reference: build_unet_layers / get_unet_model / binary_unet / get_binary_model
/ get_autoencoder (utils/model_tools.py:321-531). One module covers all
three Keras factories via ``head``:

- ``"softmax"``  -> {"probs", "classes"(argmax), "logits"}   (get_unet_model)
- ``"sigmoid"``  -> {"probs", "classes"(> threshold), "logits"}(binary_unet;
                    solar used threshold 0.9, utils/model_tools.py:444-445)
- ``"linear"``   -> {"continuous"}                            (get_autoencoder)

XLA wants static shapes, so unlike the reference's Input(None, None, C) the
spatial size is fixed per compiled call — jit caches one executable per
(H, W) bucket, which for this workload is just the (kernel + buffer) sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from satellite_computervision_tpu.models.blocks import ConvBlock, DecoderBlock, EncoderBlock


class UNet(nn.Module):
    n_classes: int = 1
    filters: Sequence[int] = (32, 64, 128, 256, 512)
    factors: Sequence[int] = (2, 2, 2, 2, 2)
    head: str = "softmax"
    threshold: float = 0.5
    dropout: Optional[float] = None
    output_bias: Optional[float] = None
    remat: bool = False
    # convs per encoder/center block: 2 = the documented reference intent;
    # 1 = the reference's *shipped* architecture (conv_block double-call
    # bug, utils/model_tools.py:238-239) — use 1 when importing published
    # Keras .h5 weights (train.keras_import).
    convs_per_block: int = 2
    # BatchNorm running-stat momentum. The Keras default 0.99 needs many
    # steps before eval-mode stats are usable; lower (e.g. 0.9) stabilizes
    # short runs.
    bn_momentum: float = 0.99
    # Space-to-depth stem: fold 2x2 pixel blocks into channels before the
    # first conv (H, W, C) -> (H/2, W/2, 4C) and restore resolution with a
    # learned 2x upsample before the head. The first conv level then runs
    # at quarter the spatial positions with 4x the input channels — much
    # better MXU lane utilization for 3-6-band imagery (the classic TPU
    # ResNet stem optimization). An architectural variant, not a
    # weight-compatible transform of the plain UNet.
    space_to_depth: bool = False
    # Inference-serving mode: BatchNorms are folded into conv kernels /
    # biases (use models.fold.fold_unet_variables to build the matching
    # params from a trained checkpoint) — the compiled program carries no
    # BN ops at all. Numerically identical to eval-mode BN.
    fold_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if len(self.filters) != len(self.factors):
            raise ValueError("filters and factors must be the same length")
        common = dict(bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
                      dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = jnp.asarray(x, self.dtype)

        if self.space_to_depth:
            b, h, w, c = x.shape
            if h % 2 or w % 2:
                raise ValueError("space_to_depth needs even spatial dims")
            x = (
                x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c)
            )

        # remat trades recompute for activation memory (jax.checkpoint per
        # block) — lets 512^2 parking-config batches train within HBM.
        # static_argnums=2: the `train` flag stays a Python bool (BatchNorm
        # branches on it).
        if self.remat:
            encoder_cls = nn.remat(EncoderBlock, static_argnums=(2,))
            conv_cls = nn.remat(ConvBlock, static_argnums=(2,))
            decoder_cls = nn.remat(DecoderBlock, static_argnums=(3,))
        else:
            encoder_cls, conv_cls, decoder_cls = EncoderBlock, ConvBlock, DecoderBlock

        # explicit names keep the param tree identical with and without
        # remat (nn.remat otherwise scopes under "remat(...)"), so remat
        # and plain checkpoints interchange
        skips = []
        for i, (feat, factor) in enumerate(zip(self.filters, self.factors)):
            x, skip = encoder_cls(
                feat, pool=(factor, factor), n_convs=self.convs_per_block,
                name=f"EncoderBlock_{i}", **common,
            )(x, train)
            skips.append(skip)

        x = conv_cls(
            self.filters[-1] * 2, n_convs=self.convs_per_block,
            name="ConvBlock_0", **common,
        )(x, train)

        for i, (feat, factor, skip) in enumerate(
            zip(reversed(self.filters), reversed(self.factors), reversed(skips))
        ):
            x = decoder_cls(
                feat, up=(factor, factor), dropout=self.dropout,
                name=f"DecoderBlock_{i}", **common,
            )(x, skip, train)

        if self.space_to_depth:
            x = nn.ConvTranspose(
                self.filters[0], (2, 2), strides=(2, 2), padding="SAME",
                dtype=self.dtype, name="stem_upsample",
            )(x)
            if not self.fold_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-3,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name if train else None,
                    name="stem_upsample_bn",
                )(x)
            x = nn.relu(x)

        if self.dropout is not None:
            x = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(x)

        bias_init = (
            nn.initializers.constant(self.output_bias)
            if self.output_bias is not None
            else nn.initializers.zeros_init()
        )
        logits = nn.Conv(
            self.n_classes, (1, 1), bias_init=bias_init, dtype=self.dtype, name="head"
        )(x)
        logits = logits.astype(jnp.float32)

        if self.head == "softmax":
            probs = nn.softmax(logits, axis=-1)
            classes = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            return {"logits": logits, "probs": probs, "classes": classes}
        if self.head == "sigmoid":
            probs = nn.sigmoid(logits)
            classes = (probs > self.threshold).astype(jnp.int32)
            return {"logits": logits, "probs": probs, "classes": classes}
        if self.head == "linear":
            return {"continuous": logits}
        raise ValueError(f"unknown head {self.head!r}")


def unet_solar(**overrides) -> UNet:
    """Solar-array binary U-Net: 6-band Sentinel-2, threshold 0.9
    (solar notebook cell 17; utils/model_tools.py:417-454)."""
    kwargs = dict(n_classes=1, head="sigmoid", threshold=0.9)
    kwargs.update(overrides)
    return UNet(**kwargs)


def unet_parking(**overrides) -> UNet:
    """Parking-lot binary U-Net: NAIP RGB, weighted BCE pos_weight 20
    (parking notebook cells 16, 39)."""
    kwargs = dict(n_classes=1, head="sigmoid", threshold=0.5)
    kwargs.update(overrides)
    return UNet(**kwargs)
