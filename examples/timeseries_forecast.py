"""Timeseries next-image forecasting with the ConvLSTM model.

Mirrors the reference's LSTM workflow (LSTMDataGenerator random sequence
rotation -> get_lstm_model with capped ReLU, SURVEY.md §2.1-2.2) on a
synthetic seasonal dataset: pixels oscillate through an annual harmonic
plus noise, and the model learns to forecast the next timestep from the
preceding five.

Usage: python examples/timeseries_forecast.py [--steps N]
"""


# allow `python examples/<name>.py` from anywhere: put the repo root (the
# package home) and this directory (convergence_common) on sys.path
import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_os.path.dirname(_here), _here):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from satellite_computervision_tpu.data.chip_generators import (
    rearrange_timeseries,
    split_timeseries,
)
from satellite_computervision_tpu.models import LSTMModel, losses
from satellite_computervision_tpu.train import create_train_state
from satellite_computervision_tpu.train.trainer import make_train_step

T, K, C = 6, 16, 3


def make_series_batch(rng, b=8):
    """(B, T, K, K, C) seasonal series: per-pixel phase + harmonic."""
    phase = rng.uniform(0, 2 * np.pi, (b, 1, K, K, 1))
    amp = rng.uniform(0.2, 0.5, (b, 1, K, K, C))
    t = np.arange(T + 1).reshape(1, T + 1, 1, 1, 1)
    series = 0.5 + amp * np.sin(2 * np.pi * t / T + phase)
    series += rng.normal(0, 0.02, series.shape)
    return np.clip(series, 0, 2).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    model = LSTMModel(n_classes=C, features=8)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, T - 1, K, K, C)), tx=optax.adam(2e-3)
    )
    # LSTMModel returns the activation array directly (not a head dict)
    train_step = make_train_step(losses.masked_mse, pred_key="continuous", num_classes=2)

    t0 = time.time()
    first = last = None
    for step_i in range(args.steps):
        series = make_series_batch(rng)
        rotated, _ = rearrange_timeseries(series, rng)
        feats, labels = split_timeseries(rotated, C)
        state, out = train_step(
            state, (jnp.asarray(feats), jnp.asarray(labels)), jax.random.key(step_i)
        )
        loss = float(out["loss"])
        first = loss if first is None else first
        last = loss
        if step_i % 40 == 0:
            print(f"step {step_i}: mse={loss:.5f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s; "
          f"mse {first:.4f} -> {last:.4f}")

    # forecast quality vs a persistence baseline (predict last frame again)
    series = make_series_batch(rng, b=16)
    feats, labels = split_timeseries(series, C)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pred = np.asarray(model.apply(variables, jnp.asarray(feats)))
    model_mse = float(np.mean((pred - labels) ** 2))
    persist_mse = float(np.mean((feats[:, -1] - labels) ** 2))
    print(f"forecast mse={model_mse:.5f} vs persistence={persist_mse:.5f}")
    assert model_mse < persist_mse, "model should beat persistence"
    print("OK")


if __name__ == "__main__":
    main()
