"""Change-detection workflow: Siamese U-Net + ASPP on before/after pairs.

Mirrors the reference's Siamese story (make_siamese_unet,
utils/model_tools.py:638-663 + SiameseDataGenerator,
utils/processing.py:757-892) on synthetic data: paired Sentinel-2-like
chips where "after" adds bright patches that the model learns to flag.

Usage: python examples/change_detection.py [--steps N]
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

from satellite_computervision_tpu.models import SiameseUNet, losses, metrics
from satellite_computervision_tpu.ops.augment import apply_morph, draw_morph_params

K, C = 32, 4


def make_batch(rng, b=8):
    before = rng.uniform(0.05, 0.3, (b, K, K, C)).astype(np.float32)
    after = before + rng.normal(0, 0.01, before.shape).astype(np.float32)
    label = np.zeros((b, K, K, 1), np.float32)
    for i in range(b):
        y, x = rng.integers(2, K - 10, 2)
        h, w = rng.integers(4, 8, 2)
        after[i, y : y + h, x : x + w] += 0.4
        label[i, y : y + h, x : x + w] = 1.0
    return before, after, label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    model = SiameseUNet(filters=(8, 16), factors=(2, 2))
    rng = np.random.default_rng(0)
    b0, a0, _ = make_batch(rng, 1)
    variables = model.init(jax.random.key(0), jnp.asarray(b0), jnp.asarray(a0))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, before, after, label, key):
        # joint morph augmentation of the pair + label (the generator's
        # contract, utils/processing.py:883-889)
        fv, fh, rot = draw_morph_params(key)
        before, after, label = (
            apply_morph(x, fv, fh, rot) for x in (before, after, label)
        )

        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                before, after, train=True, mutable=["batch_stats"],
            )
            loss = losses.weighted_bce(label, out["logits"], pos_weight=5.0, logits=True)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss, out

    key = jax.random.key(1)
    t0 = time.time()
    for step in range(args.steps):
        before, after, label = make_batch(rng)
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss, _ = train_step(
            params, batch_stats, opt_state,
            jnp.asarray(before), jnp.asarray(after), jnp.asarray(label), sub,
        )
        if step % 20 == 0:
            print(f"step {step}: loss={float(loss):.4f}")
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    # evaluate change IoU
    cm = metrics.init_metric_state(2)
    for _ in range(4):
        before, after, label = make_batch(rng)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(before), jnp.asarray(after),
        )
        cm = metrics.update_metric_state(cm, label[..., 0] > 0.5, out["classes"][..., 0])
    final = {k: round(float(v), 4) for k, v in metrics.finalize_metrics(cm).items()}
    print("change-detection eval:", final)
    assert final["accuracy"] > 0.8
    print("OK")


if __name__ == "__main__":
    main()
