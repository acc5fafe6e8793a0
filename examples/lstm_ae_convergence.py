#!/usr/bin/env python
"""ConvLSTM-autoencoder convergence: quality evidence for the LSTM-AE
family's two-headed training objective.

The reference's LSTM autoencoder (get_lstm_autoencoder,
utils/model_tools.py:810-872) trains two heads at once: ``temporal``
reconstructs the time-REVERSED input sequence through a repeated-state
ConvLSTM decoder, and ``single`` predicts the next frame from the
encoded state concatenated with sin/cos month harmonics (its generator,
LSTMAutoencoderGenerator utils/processing.py:974-1049, derives the
harmonics from the chip filename's start month). Real chips are cloud
exports this environment cannot fetch, so this harness trains the full
two-head model under the reference objective (summed masked MSE on both
heads, train/zoo.py:_lstm_ae_loss; Adam 9e-4) on the same procedural
seasonal series as timeseries_forecast_convergence:

- per-pixel seasonal harmonic with spatially correlated phase/amplitude
  and a random per-chip season offset;
- the ``single`` head receives the TRUE target-time sin/cos plane (the
  analog of the reference's filename-month harmonics);
- NaN cloud holes in the next-frame target exercise the masked-MSE path.

Reported per epoch: temporal-head reconstruction MSE, single-head
forecast MSE, and forecast skill vs the persistence baseline
(next = last observed frame; 0 = learned nothing).

Usage (~7 min on the tunnel v5e):
  python examples/lstm_ae_convergence.py --out runs/lstm_ae_convergence.jsonl
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
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from convergence_common import smooth_field, stable_seed  # noqa: E402
from satellite_computervision_tpu.models import LSTMAutoencoder, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import make_train_step  # noqa: E402

T, K, C = 6, 64, 4  # 6-step series, 64^2 chips, 4 bands (TIMESERIES_CONFIG)
T_IN = T - 1  # 5 observed frames in, frame 6 out
PERIOD = 12.0


def make_chip(split: str, index: int):
    """Deterministic ((T_IN,K,K,C) f16 inputs, (K,K,2) f32 target-time
    sin/cos, (T_IN,K,K,C) f32 reversed-sequence target, (K,K,C) f32
    next-frame target with NaN cloud holes)."""
    rng = np.random.default_rng(stable_seed(split, index))

    mean = 0.7 + 0.25 * smooth_field(rng, K)[..., None]
    amp = 0.25 + 0.15 * smooth_field(rng, K)[..., None]
    phase = 1.5 * smooth_field(rng, K)[..., None]
    band_scale = rng.uniform(0.7, 1.1, (1, 1, C)).astype(np.float32)

    t0 = rng.uniform(0, PERIOD)
    t = (t0 + np.arange(T)).reshape(T, 1, 1, 1)
    series = mean + amp * np.sin(2 * np.pi * t / PERIOD + phase)
    series = series * band_scale
    series = series + rng.normal(0, 0.02, series.shape)
    series = np.clip(series, 0.0, 2.0).astype(np.float32)

    feats = series[:T_IN].astype(np.float16)
    temporal_y = series[:T_IN][::-1].copy()  # reversed inputs (mt.py:840-849)
    single_y = series[T_IN].copy()
    for _ in range(int(rng.integers(1, 4))):
        h, w = (int(v) for v in rng.integers(6, 20, 2))
        y, x = int(rng.integers(0, K - h)), int(rng.integers(0, K - w))
        single_y[y : y + h, x : x + w] = np.nan

    # the reference reads this off the chip filename's start month; here
    # the generator knows the true target time
    theta = 2 * np.pi * (t0 + T_IN) / PERIOD
    sincos = np.broadcast_to(
        np.array([np.sin(theta), np.cos(theta)], np.float32), (K, K, 2)
    ).copy()
    return feats, sincos, temporal_y, single_y


def batches(split, n, batch, rng, shuffle=True):
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    for i in range(0, n - batch + 1, batch):
        chips = [make_chip(split, int(j)) for j in order[i : i + batch]]
        x, sc, ty, sy = (np.stack(z) for z in zip(*chips))
        yield jax.device_put(((x, sc), (ty, sy)))


def loss_fn(y, out):
    """train/zoo.py:_lstm_ae_loss — summed masked MSE on both heads."""
    temporal_y, single_y = y
    return losses.mse_4d(single_y, out["single"]) + losses.mse_4d(
        temporal_y.reshape((-1,) + temporal_y.shape[2:]),
        out["temporal"].reshape((-1,) + out["temporal"].shape[2:]),
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-size", type=int, default=1280)
    ap.add_argument("--eval-size", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--features", type=int, default=16)
    ap.add_argument("--out", default="runs/lstm_ae_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    model = LSTMAutoencoder(
        n_classes=C, n_time=T_IN, features=args.features, dtype=jnp.bfloat16,
    )
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, T_IN, K, K, C)),
        tx=optax.adam(args.lr),
        model_args=(jnp.zeros((1, K, K, 2)),),
    )
    train_step = make_train_step(loss_fn, pred_key=None, num_classes=2)

    @jax.jit
    def eval_batch(state, x, y):
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *x, train=False,
        )
        temporal_y, single_y = y
        feats = x[0]
        return (
            losses.mse_4d(single_y, out["single"]),
            losses.mse_4d(
                temporal_y.reshape((-1,) + temporal_y.shape[2:]),
                out["temporal"].reshape((-1,) + out["temporal"].shape[2:]),
            ),
            losses.mse_4d(single_y, feats[:, -1].astype(jnp.float32)),
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as log:
        print(f"lstm-ae convergence: {args.train_size} series x {args.epochs} "
              f"epochs, batch {args.batch_size}, T_in={T_IN}")

        rng = np.random.default_rng(args.seed)
        key = jax.random.key(args.seed + 1)
        best = None
        for epoch in range(args.epochs):
            t0 = time.time()
            tloss, steps = None, 0
            for x, y in batches("train", args.train_size, args.batch_size, rng):
                key, sub = jax.random.split(key)
                state, out = train_step(state, (x, y), sub)
                tloss = out["loss"] if tloss is None else tloss + out["loss"]
                steps += 1

            sums, esteps = None, 0
            for x, y in batches("eval", args.eval_size, args.batch_size, rng,
                                shuffle=False):
                vals = eval_batch(state, x, y)
                sums = vals if sums is None else tuple(a + b for a, b in zip(sums, vals))
                esteps += 1
            single_mse, temporal_mse, pers_mse = (float(v) / max(esteps, 1) for v in sums)
            skill = 1.0 - single_mse / max(pers_mse, 1e-12)
            rec = {
                "epoch": epoch,
                "train_loss": float(tloss) / max(steps, 1),
                "forecast_mse": round(single_mse, 6),
                "reconstruction_mse": round(temporal_mse, 6),
                "persistence_mse": round(pers_mse, 6),
                "skill_vs_persistence": round(skill, 4),
                "secs": round(time.time() - t0, 1),
            }
            if best is None or skill >= best["skill_vs_persistence"]:
                best = {k: rec[k] for k in
                        ("epoch", "forecast_mse", "reconstruction_mse",
                         "persistence_mse", "skill_vs_persistence")}
            print(json.dumps(rec))
            log.write(json.dumps(rec) + "\n")
            log.flush()

        summary = {"final": best, "config": vars(args)}
        print("SUMMARY " + json.dumps(summary))
        log.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
