#!/usr/bin/env python
"""ConvLSTM next-image forecast convergence: quality evidence for the
timeseries family and the masked-MSE loss path at workload scale.

The reference's timeseries workflow trains get_lstm_model (ConvLSTM
stack -> capped ReLU) with the NaN-masked `mse_4d` loss on rotated
Sentinel-2 sequences (utils/model_tools.py:773-808, :142-166;
LSTMDataGenerator rotation, utils/processing.py:893-1000). Its real
chips are cloud exports this environment cannot fetch (zero egress), so
this harness trains the ConvLSTM under the reference's optimization
config (TIMESERIES_CONFIG: 4 bands, 64^2 chips, T=6, batch 16, Adam
9e-4, masked MSE) on procedurally generated seasonal series whose
dynamics are learnable but non-trivial:

- per-pixel seasonal harmonic with spatially correlated phase,
  amplitude and mean (smooth random fields — landscape patches green up
  together, but different patches are out of phase);
- a random per-chip season offset, so the model must infer the phase
  from the 5 input frames rather than memorize a global clock;
- NaN cloud holes in the TARGET frame (the masked-MSE path: loss and
  metrics ignore exactly those pixels).

Forecast skill is reported against the standard persistence baseline
(next = last observed frame): skill = 1 - mse_model / mse_persistence.
Persistence is the canonical "did it learn any dynamics at all" bar in
forecasting; a model that only copies its last input scores 0.

Usage (~6 min on the tunnel v5e):
  python examples/timeseries_forecast_convergence.py \
      --out runs/timeseries_forecast.jsonl
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

from convergence_common import (  # noqa: E402
    chip_batches,
    smooth_field,
    stable_seed,
)
from satellite_computervision_tpu.models import LSTMModel, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import make_train_step  # noqa: E402

T, K, C = 6, 64, 4  # TIMESERIES_CONFIG: 6 timesteps, 64^2 chips, 4 bands
PERIOD = 12.0  # seasonal period in observation steps (bimonthly S2 revisit)


def make_chip(split: str, index: int):
    """Deterministic ((T-1, K, K, C) float16 inputs, (K, K, C) float32
    next-frame target with NaN cloud holes)."""
    rng = np.random.default_rng(stable_seed(split, index))

    # landscape: per-band mean level, seasonal amplitude and phase vary
    # smoothly in space (patches of vegetation green up together)
    mean = 0.7 + 0.25 * smooth_field(rng, K)[..., None]
    amp = 0.25 + 0.15 * smooth_field(rng, K)[..., None]
    phase = 1.5 * smooth_field(rng, K)[..., None]
    band_scale = rng.uniform(0.7, 1.1, (1, 1, C)).astype(np.float32)

    t0 = rng.uniform(0, PERIOD)  # random season start per chip
    t = (t0 + np.arange(T)).reshape(T, 1, 1, 1)
    series = mean + amp * np.sin(2 * np.pi * t / PERIOD + phase)
    series = series * band_scale
    series = series + rng.normal(0, 0.02, series.shape)
    series = np.clip(series, 0.0, 2.0).astype(np.float32)

    feats = series[: T - 1].astype(np.float16)
    label = series[T - 1]
    # NaN cloud holes in the target (1-3 patches): mse_4d must skip them
    for _ in range(int(rng.integers(1, 4))):
        h, w = (int(v) for v in rng.integers(6, 20, 2))
        y, x = int(rng.integers(0, K - h)), int(rng.integers(0, K - w))
        label[y : y + h, x : x + w] = np.nan
    return feats, label


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-size", type=int, default=1600)
    ap.add_argument("--eval-size", type=int, default=320)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--features", type=int, default=32)
    ap.add_argument("--out", default="runs/timeseries_forecast.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    model = LSTMModel(n_classes=C, features=args.features, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, T - 1, K, K, C)),
        tx=optax.adam(args.lr),
    )
    train_step = make_train_step(losses.masked_mse, num_classes=2)

    @jax.jit
    def eval_batch(state, x, y):
        pred = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        # persistence baseline: next frame = last observed frame, scored
        # on exactly the same finite-target pixels
        return (losses.masked_mse(y, pred),
                losses.masked_mse(y, x[:, -1].astype(jnp.float32)))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a")
    print(f"timeseries forecast convergence: {args.train_size} series x "
          f"{args.epochs} epochs, batch {args.batch_size}, T={T}")

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 1)
    best = None
    for epoch in range(args.epochs):
        t0 = time.time()
        tloss, steps = None, 0
        for x, y in chip_batches(make_chip, "train", args.train_size,
                                 args.batch_size, rng):
            key, sub = jax.random.split(key)
            state, outs = train_step(state, (x, y), sub)
            tloss = outs["loss"] if tloss is None else tloss + outs["loss"]
            steps += 1

        emse, epers, esteps = None, None, 0
        for x, y in chip_batches(make_chip, "eval", args.eval_size,
                                 args.batch_size, rng, shuffle=False):
            m, p = eval_batch(state, x, y)
            emse = m if emse is None else emse + m
            epers = p if epers is None else epers + p
            esteps += 1
        mse = float(emse) / max(esteps, 1)
        pers = float(epers) / max(esteps, 1)
        skill = 1.0 - mse / max(pers, 1e-12)
        rec = {
            "epoch": epoch,
            "train_loss": float(tloss) / max(steps, 1),
            "eval_mse": round(mse, 6),
            "persistence_mse": round(pers, 6),
            "skill_vs_persistence": round(skill, 4),
            "secs": round(time.time() - t0, 1),
        }
        if best is None or skill >= best["skill_vs_persistence"]:
            best = {"epoch": epoch, "eval_mse": round(mse, 6),
                    "persistence_mse": round(pers, 6),
                    "skill_vs_persistence": round(skill, 4)}
        print(json.dumps(rec))
        log.write(json.dumps(rec) + "\n")
        log.flush()

    summary = {"final": best, "config": vars(args)}
    print("SUMMARY " + json.dumps(summary))
    log.write(json.dumps(summary) + "\n")
    log.close()


if __name__ == "__main__":
    main()
