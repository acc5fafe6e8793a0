"""Atrous CNN (ACNN) and the hierarchical multi-head ACNN+LSTM model.

Reference: build_acnn_layers / build_acnn_layers2 / get_acnn_model /
get_acnn_model2 / get_hierarchical_model (utils/model_tools.py:922-1051),
which in turn follow XiaoYunZhou27/ACNN. Blocks alternate a plain 3x3 conv
(with additive residual accumulation) and a dilated (rate 3) 3x3 conv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from satellite_computervision_tpu.models.convlstm import LSTMStack


class ACNNTrunk(nn.Module):
    """The conv / dilated-conv residual block stack; returns the feature
    stream after each block so heads can tap intermediate depths.

    ``variant=2`` (default) follows build_acnn_layers2
    (utils/model_tools.py:941-979): each block's plain conv consumes the
    previous block's *activated* output. ``variant=1`` follows
    build_acnn_layers (:922-939), whose plain conv consumes the previous
    block's raw (pre-BN) conv output — the only wiring difference between
    the two reference builders.
    """

    n_blocks: int = 16
    features: int = 16
    kernel_size: Tuple[int, int] = (3, 3)
    variant: int = 2
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(momentum=0.99, epsilon=1e-3, dtype=self.dtype)

        def batch_norm(y, name):
            return nn.BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name if train else None,
                name=name,
                **bn,
            )(y)

        x = jnp.asarray(x, self.dtype)
        conv_in = x  # variant-dependent input to each block's plain conv
        features_add = None
        taps = []
        for block in range(self.n_blocks):
            feats = nn.Conv(
                self.features, self.kernel_size, padding="SAME", dtype=self.dtype,
                name=f"conv_{block}_1",
            )(conv_in)
            normed = batch_norm(feats, f"bn_{block}_1")
            if block == 0:
                features_add = nn.relu(normed)
            else:
                features_add = nn.relu(normed + features_add)
            feats = nn.Conv(
                self.features, self.kernel_size, padding="SAME",
                kernel_dilation=(3, 3), dtype=self.dtype,
                name=f"dilated_conv_{block}_2",
            )(features_add)
            normed = batch_norm(feats, f"bn_{block}_2")
            activated = nn.relu(normed)
            # variant 1 feeds the next plain conv the RAW dilated-conv
            # output; variant 2 feeds it the activated features
            conv_in = feats if self.variant == 1 else activated
            taps.append(activated)
        return taps


class ACNN(nn.Module):
    """ACNN with a softmax head (get_acnn_model2, utils/model_tools.py:992-1014)."""

    n_classes: int
    n_blocks: int = 16
    features: int = 16
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ACNNTrunk(
            self.n_blocks,
            self.features,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="trunk",
        )(x, train)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="head")(taps[-1])
        logits = logits.astype(jnp.float32)
        probs = nn.softmax(logits, axis=-1)
        return {"logits": logits, "probs": probs, "classes": jnp.argmax(probs, -1).astype(jnp.int32)}


class HierarchicalACNN(nn.Module):
    """Three-headed hierarchical model (get_hierarchical_model,
    utils/model_tools.py:1016-1051):

    - ``sub_probs``: softmax over ``sub_classes`` from the mid-depth tap;
    - ``acnn_probs``: softmax over ``acnn_classes`` from the final tap;
    - ``lstm_probs``: softmax over ``n_classes`` from the final tap fused
      with a ConvLSTM branch nearest-resized to the ACNN grid.
    """

    n_classes: int
    acnn_classes: int
    sub_classes: int
    n_blocks: int = 16
    features: int = 16
    lstm_features: int = 64
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, timeseries, train: bool = False):
        taps = ACNNTrunk(
            self.n_blocks,
            self.features,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="trunk",
        )(x, train)
        midpoint = (self.n_blocks - 1) // 2
        sub_logits = nn.Conv(self.sub_classes, (1, 1), dtype=self.dtype, name="sub_head")(
            taps[midpoint]
        ).astype(jnp.float32)
        acnn_logits = nn.Conv(self.acnn_classes, (1, 1), dtype=self.dtype, name="acnn_head")(
            taps[-1]
        ).astype(jnp.float32)

        lstm_out = LSTMStack(
            self.lstm_features, dtype=self.dtype, bn_axis_name=self.bn_axis_name
        )(timeseries, train)
        target = taps[-1].shape
        lstm_resized = jax.image.resize(
            lstm_out,
            (lstm_out.shape[0], target[1], target[2], lstm_out.shape[-1]),
            method="nearest",
        )
        fused = jnp.concatenate([lstm_resized, taps[-1]], axis=-1)
        lstm_logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="lstm_head")(
            fused
        ).astype(jnp.float32)

        return {
            "sub_probs": nn.softmax(sub_logits, -1),
            "acnn_probs": nn.softmax(acnn_logits, -1),
            "lstm_probs": nn.softmax(lstm_logits, -1),
            "sub_logits": sub_logits,
            "acnn_logits": acnn_logits,
            "lstm_logits": lstm_logits,
        }
