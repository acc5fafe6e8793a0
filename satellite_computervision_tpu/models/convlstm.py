"""ConvLSTM models: stacked ConvLSTM, LSTM regression model, LSTM autoencoder.

Reference: build_lstm_layers / build_lstm_layers2 / get_lstm_model /
get_lstm_autoencoder (utils/model_tools.py:666-872). The recurrence is a
single ConvLSTM cell scanned over the time axis with ``nn.scan`` — traced
once, compiled once, static shapes throughout (no per-timestep Python).

Cell semantics follow Keras ConvLSTM2D as used by the reference:
``activation=None`` (identity cell/output activation — the reference
normalizes + ReLUs outside the recurrence), ``hard_sigmoid`` recurrent
activation, unit forget-gate bias, dilation applied to the input
convolution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


def hard_sigmoid(x):
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


def capped_relu(x, cap: float = 2.0):
    """ReLU(max_value=2.0) — the reference's final LSTM activation
    (utils/model_tools.py:773, 810)."""
    return jnp.clip(x, 0.0, cap)


class ConvLSTMCell(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        gates = nn.Conv(
            4 * self.features,
            self.kernel_size,
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
            name="input_conv",
        )(x)
        gates = gates + nn.Conv(
            4 * self.features,
            self.kernel_size,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="recurrent_conv",
        )(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = hard_sigmoid(i)
        f = hard_sigmoid(f + 1.0)  # unit forget bias
        o = hard_sigmoid(o)
        c = f * c + i * g  # activation=None -> identity on g
        h = o * c  # and on the cell state
        return (c, h), h


class ConvLSTM(nn.Module):
    """ConvLSTM over a (B, T, H, W, C) sequence.

    Returns ``(h_seq or h_last, (c_last, h_last))``; select with
    ``return_sequences`` like Keras ConvLSTM2D.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: int = 1
    return_sequences: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, hgt, wid, _ = x.shape
        x = jnp.asarray(x, self.dtype)
        scan = nn.scan(
            ConvLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        zeros = jnp.zeros((b, hgt, wid, self.features), self.dtype)
        (c, h), h_seq = scan(
            self.features, self.kernel_size, self.dilation, self.dtype, name="cell"
        )((zeros, zeros), x)
        out = h_seq if self.return_sequences else h
        return out, (c, h)


class LSTMStack(nn.Module):
    """2x ConvLSTM(64) with BN/ReLU between; second layer dilated 3
    (build_lstm_layers, utils/model_tools.py:666-717)."""

    features: int = 64
    return_sequences: bool = False
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(momentum=0.99, epsilon=1e-3, dtype=self.dtype)
        seq, _ = ConvLSTM(self.features, return_sequences=True, dtype=self.dtype)(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            axis_name=self.bn_axis_name if train else None,
            **bn,
        )(seq)
        y = nn.relu(y)
        if self.dropout is not None:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        out, _ = ConvLSTM(
            self.features,
            dilation=3,
            return_sequences=self.return_sequences,
            dtype=self.dtype,
        )(y)
        out = nn.BatchNorm(
            use_running_average=not train,
            axis_name=self.bn_axis_name if train else None,
            **bn,
        )(out)
        return nn.relu(out)


class LSTMStack2(nn.Module):
    """Residual variant: relu(state_h + BN(lstm2_out))
    (build_lstm_layers2, utils/model_tools.py:719-771)."""

    features: int = 16
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(momentum=0.99, epsilon=1e-3, dtype=self.dtype)
        seq, (_, state_h) = ConvLSTM(
            self.features, return_sequences=True, dtype=self.dtype
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            axis_name=self.bn_axis_name if train else None,
            **bn,
        )(seq)
        y = nn.relu(y)
        if self.dropout is not None:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        out, _ = ConvLSTM(self.features, dilation=3, dtype=self.dtype)(y)
        out = nn.BatchNorm(
            use_running_average=not train,
            axis_name=self.bn_axis_name if train else None,
            **bn,
        )(out)
        return nn.relu(state_h + out)


class LSTMModel(nn.Module):
    """(B, T, H, W, C) -> per-pixel regression capped at 2.0
    (get_lstm_model, utils/model_tools.py:773-808)."""

    n_classes: int
    features: int = 64
    cap: float = 2.0
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = LSTMStack(
            self.features,
            dropout=self.dropout,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )(x, train)
        if self.dropout is not None:
            y = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(y)
        y = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype)(y)
        return capped_relu(y.astype(jnp.float32), self.cap)


class LSTMAutoencoder(nn.Module):
    """Two-headed ConvLSTM autoencoder (get_lstm_autoencoder,
    utils/model_tools.py:810-872).

    - ``temporal``: encoded state repeated T times -> ConvLSTM(32) decoder
      -> time-distributed 1x1 conv (predicts the reversed sequence).
    - ``single``: encoded state concat sin/cos harmonics -> 1x1 conv
      (predicts the next step).
    """

    n_classes: int
    n_time: int
    features: int = 16
    cap: float = 2.0
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, sincos, train: bool = False):
        encoded = LSTMStack2(
            self.features, dtype=self.dtype, bn_axis_name=self.bn_axis_name
        )(x, train)

        repeated = jnp.repeat(encoded[:, None], self.n_time, axis=1)
        decoded, _ = ConvLSTM(32, return_sequences=True, dtype=self.dtype, name="lstm_decoder")(
            repeated
        )
        # TimeDistributed(Conv 1x1): a 1x1 conv is pointwise, so applying it
        # to the (B, T, H, W, C) stack directly is identical.
        temporal = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="temporal_dense")(
            decoded
        )
        temporal = capped_relu(temporal.astype(jnp.float32), self.cap)

        concat = jnp.concatenate([encoded, jnp.asarray(sincos, self.dtype)], axis=-1)
        single = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="single_dense")(concat)
        single = capped_relu(single.astype(jnp.float32), self.cap)
        return {"temporal": temporal, "single": single}
