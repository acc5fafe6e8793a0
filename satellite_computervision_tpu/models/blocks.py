"""Shared convolutional building blocks (flax.linen, NHWC).

Reference: conv_batch_act / conv_block / encoder_block / decoder_block /
DilatedSpatialPyramidPooling (utils/model_tools.py:174-574). Differences by
design:

- the reference's ``conv_block.call`` invokes its first conv twice and
  never the second (utils/model_tools.py:238-239, a latent bug); we
  implement the documented 2x conv->BN->relu stack.
- BatchNorm uses Keras defaults (momentum 0.99, epsilon 1e-3) and takes an
  optional ``bn_axis_name`` so running statistics reduce across a
  data-parallel mesh axis (cross-replica sync under pjit/shard_map).
- every block takes ``dtype`` so activations can run in bfloat16 on the
  MXU while parameters stay float32.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBNAct(nn.Module):
    """Conv2D(SAME, dilation) -> BatchNorm -> ReLU (utils/model_tools.py:174-186).

    ``fold_bn=True`` is the inference-serving mode: the BatchNorm is gone
    and its affine is pre-folded into the conv kernel/bias
    (models.fold.fold_unet_variables builds the matching params), removing
    the BN ops from the compiled program entirely."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: int = 1
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
        )(x)
        if self.fold_bn:
            if train:
                raise ValueError("fold_bn is an inference-only mode")
            return nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-3,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )(x)
        return nn.relu(x)


class ConvBlock(nn.Module):
    """n x (conv -> BN -> relu) (utils/model_tools.py:211-240).

    The reference's ``conv_block.call`` invokes its first conv_batch_act
    twice and never the second (utils/model_tools.py:238-239), so its
    *effective* (and saved-to-.h5) architecture has ONE conv per block.
    ``n_convs=2`` (default) implements the documented intent; ``n_convs=1``
    reproduces the shipped architecture — required when importing the
    reference's published Keras weights (train.keras_import)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: int = 1
    n_convs: int = 2
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cba = dict(
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )
        for _ in range(self.n_convs):
            x = ConvBNAct(self.features, **cba)(x, train)
        return x


class EncoderBlock(nn.Module):
    """conv_block -> max_pool(factor); returns (pooled, skip)
    (utils/model_tools.py:262-286)."""

    features: int
    pool: Tuple[int, int] = (2, 2)
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: int = 1
    n_convs: int = 2
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = ConvBlock(
            self.features,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            n_convs=self.n_convs,
            bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )(x, train)
        pooled = nn.max_pool(skip, self.pool, strides=self.pool)
        return pooled, skip


class DecoderBlock(nn.Module):
    """transpose_conv -> concat skip -> BN -> relu [-> dropout] -> 2x(conv->BN->relu)
    (utils/model_tools.py:288-318)."""

    features: int
    up: Tuple[int, int] = (2, 2)
    dropout: Optional[float] = None
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.fold_bn and train:
            raise ValueError("fold_bn is an inference-only mode")
        bn = dict(momentum=self.bn_momentum, epsilon=1e-3, dtype=self.dtype)
        x = nn.ConvTranspose(
            self.features, self.up, strides=self.up, padding="SAME", dtype=self.dtype
        )(x)
        x = jnp.concatenate([skip, x], axis=-1)
        if self.fold_bn:
            # the post-concat BN normalizes skip channels too (no single
            # preceding conv to fold into); it collapses to one constant
            # per-channel affine
            ch = x.shape[-1]
            scale = self.param("affine_0_scale", nn.initializers.ones, (ch,))
            shift = self.param("affine_0_bias", nn.initializers.zeros, (ch,))
            x = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name if train else None,
                **bn,
            )(x)
        x = nn.relu(x)
        if self.dropout is not None:
            # SpatialDropout2D: drop whole feature maps (broadcast over H, W).
            x = nn.Dropout(
                self.dropout,
                broadcast_dims=(1, 2),
                deterministic=not train,
            )(x)
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(x)
            if not self.fold_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    axis_name=self.bn_axis_name if train else None,
                    **bn,
                )(x)
            x = nn.relu(x)
        return x


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (utils/model_tools.py:533-574).

    Parallel 1x1 + 3x3 dilated (3, 6, 12) conv->BN->relu branches,
    concatenated then fused by a 1x1 conv->BN->relu. ``rates`` is
    parameterized so the DeepLab-v3+ head can reuse this block with its
    canonical (6, 12, 18) rates.
    """

    features: int
    rates: Sequence[int] = (3, 6, 12)
    image_pooling: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cba = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        branches = [ConvBNAct(self.features, (1, 1), **cba)(x, train)]
        for rate in self.rates:
            branches.append(
                ConvBNAct(self.features, (3, 3), dilation=rate, **cba)(x, train)
            )
        if self.image_pooling:
            # Global-average-pool branch (DeepLab v3+; the reference sketches
            # then comments this out, utils/model_tools.py:566-568).
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
            pooled = ConvBNAct(self.features, (1, 1), **cba)(pooled, train)
            pooled = jnp.broadcast_to(
                pooled, (x.shape[0], x.shape[1], x.shape[2], self.features)
            )
            branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        return ConvBNAct(self.features, (1, 1), **cba)(y, train)
