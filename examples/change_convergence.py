#!/usr/bin/env python
"""Change-detection convergence run: quality evidence at workload scale.

The reference's change-detection flagship trains make_siamese_unet on
before/after Sentinel-2 pairs (utils/model_tools.py:638-663) fed by
SiameseDataGenerator (utils/processing.py:757-892) and serves scenes via
run_local's composite -> normalize -> tile loop (utils/pc_tools.py:
620-729). The real PC chips are cloud exports this environment cannot
fetch (zero egress), so — exactly like solar_convergence — this harness
trains the FULL SiameseUNet under the reference's optimization config
(CHANGE_CONFIG: 4 S2 bands per date, 256^2 chips, batch 8, Adam 9e-4,
weighted BCE pos_weight 4, threshold 0.5) on procedurally generated
before/after pairs with the confusers that make change detection hard:

- per-date radiometric drift (global gain/offset — absorbed by the
  reference's per-composite z-normalization, which the chips reproduce);
- vegetation phenology between dates (large spectral change, NOT change);
- water bodies and pre-existing structures present in both dates;
- new construction (bright visible, low NIR) in the after date = change.

After training, scene-level eval runs the REAL serving path: synthetic
STAC-like item sets (with cloud-masked nodata patches) ->
cloud.compositing.change_pair_composite -> TiledInferenceEngine over the
8-band stack, in both chip-grid (hann) and whole-scene modes, reporting
IoU per mode (scene-mode parity).

Usage (~20 min on the tunnel v5e):
  python examples/change_convergence.py --train-size 400 --eval-size 96 \
      --epochs 20 --out runs/change_convergence.jsonl
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

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import flax.linen as nn  # noqa: E402

from convergence_common import (  # noqa: E402
    run_convergence,
    smooth_field,
    stable_seed,
)
from satellite_computervision_tpu.cloud.compositing import (  # noqa: E402
    change_pair_composite,
    normalize_composite,
)
from satellite_computervision_tpu.inference import TiledInferenceEngine  # noqa: E402
from satellite_computervision_tpu.models import SiameseUNet, losses  # noqa: E402
from satellite_computervision_tpu.train import create_train_state  # noqa: E402
from satellite_computervision_tpu.train.trainer import (  # noqa: E402
    make_eval_step,
    make_train_step,
)

BANDS = ("B02", "B03", "B04", "B08")
NB = len(BANDS)
K = 256

# per-band (vegetation, soil, water, built) mean DNs — S2 L2A-ish
VEG = np.array([400, 600, 400, 3200], np.float32)
SOIL = np.array([1100, 1300, 1600, 2600], np.float32)
WATER = np.array([450, 500, 400, 200], np.float32)
BUILT = np.array([1600, 1700, 1900, 1500], np.float32)


class StackedSiamese(nn.Module):
    """One-input wrapper: (B, H, W, 2*NB) -> SiameseUNet(before, after).

    Lets the 8-band stacked pair ride the shared convergence harness and
    the tiled engine unchanged (scripts/predict.py's change mode splits
    the same way; run_local stacks the same 2C bands,
    utils/pc_tools.py:620-654)."""

    threshold: float = 0.5
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.core = SiameseUNet(
            filters=(32, 64, 128), factors=(2, 2, 2),
            threshold=self.threshold, dtype=self.dtype,
        )

    def __call__(self, x, train: bool = False):
        return self.core(x[..., :NB], x[..., NB:], train=train)


def _date_dn(rng, veg_frac, season):
    """(K, K, 4) DNs for one date: vegetation/soil mix at a seasonal
    vegetation level, with per-date radiometric gain/offset drift."""
    vf = np.clip(veg_frac * season, 0.0, 1.0)[..., None]
    dn = vf * VEG + (1.0 - vf) * SOIL
    gain = rng.uniform(0.85, 1.2)
    offset = rng.uniform(-80, 120)
    return dn * gain + offset


def make_chip(split: str, index: int):
    """Deterministic ((K,K,8) z-normed stacked pair, (K,K,1) change label)."""
    rng = np.random.default_rng(stable_seed(split, index))

    veg_frac = 0.5 + 0.5 * smooth_field(rng, K)
    # phenology confuser: the whole scene greens up/browns down between
    # dates — a large spectral change that must NOT be called change
    before = _date_dn(rng, veg_frac, season=rng.uniform(0.55, 1.0))
    after = _date_dn(rng, veg_frac, season=rng.uniform(0.25, 0.9))
    label = np.zeros((K, K), np.float32)

    # water body, constant in both dates (40%)
    if rng.random() < 0.4:
        cy, cx = rng.integers(30, K - 30, 2)
        r = rng.integers(12, 36)
        yy, xx = np.ogrid[:K, :K]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        w = WATER * rng.uniform(0.9, 1.1)
        before[blob] = w
        after[blob] = w

    def put_built(img, fy, fx, side, jitter):
        img[fy : fy + side, fx : fx + side] = BUILT * jitter + rng.normal(
            0, 40, (side, side, NB)
        )

    # pre-existing structure in BOTH dates = no change (50%)
    if rng.random() < 0.5:
        side = int(rng.integers(16, 48))
        fy, fx = (int(v) for v in rng.integers(4, K - 52, 2))
        j = rng.uniform(0.9, 1.1)
        put_built(before, fy, fx, side, j)
        put_built(after, fy, fx, side, j * rng.uniform(0.95, 1.05))

    # new construction in the AFTER date only = change (60%)
    if rng.random() < 0.6:
        side = int(rng.integers(24, 72))
        fy, fx = (int(v) for v in rng.integers(4, K - 76, 2))
        put_built(after, fy, fx, side, rng.uniform(0.9, 1.1))
        label[fy : fy + side, fx : fx + side] = 1.0

    before += rng.normal(0, 45, before.shape)
    after += rng.normal(0, 45, after.shape)

    # Train on EXACTLY the serving transform: run_local z-normalizes each
    # composite per-pixel ACROSS BANDS (normalize_dataArray(..., 'band'),
    # utils/pc_tools.py:90-107, :646-648) — which also absorbs the
    # per-date gain/offset drift. (The reference itself trains on /10000
    # chips but serves the band-normalized scene — a train/serve skew
    # this harness does not reproduce: a model fed its training transform
    # at serving is the behavior users need.)
    x = np.concatenate(
        [normalize_composite(before), normalize_composite(after)], axis=-1
    )
    return x.astype(np.float16), label[..., None].astype(np.uint8)


def scene_eval(model, variables, threshold, grid=4, seed=123):
    """The serving path end-to-end: item sets -> change_pair_composite ->
    tiled engines (hann chip grid AND whole-scene) -> IoU per mode."""
    rng = np.random.default_rng(seed)
    h = w = grid * K
    veg_frac = 0.5 + 0.5 * smooth_field(rng, h)
    label = np.zeros((h, w), np.float32)

    def items(season, farms, date):
        out = []
        for _ in range(3):
            dn = _date_dn(rng, veg_frac, season * rng.uniform(0.95, 1.05))
            dn = dn + rng.normal(0, 45, dn.shape)
            for (fy, fx, side) in farms:
                dn[fy : fy + side, fx : fx + side] = BUILT * rng.uniform(
                    0.9, 1.1
                ) + rng.normal(0, 40, (side, side, NB))
            # cloud-masked nodata patch (compositing must fill it)
            cy, cx = rng.integers(0, h - 64), rng.integers(0, w - 64)
            dn[cy : cy + 64, cx : cx + 64] = np.nan
            out.append({
                "datetime": date,
                "bands": {b: dn[..., i] for i, b in enumerate(BANDS)},
            })
        return out

    olds, news = [], []
    for _ in range(6):  # pre-existing structures
        side = int(rng.integers(16, 48))
        fy, fx = (int(v) for v in rng.integers(8, h - 56, 2))
        olds.append((fy, fx, side))
    for _ in range(8):  # new construction
        side = int(rng.integers(24, 72))
        fy, fx = (int(v) for v in rng.integers(8, h - 80, 2))
        news.append((fy, fx, side))
        label[fy : fy + side, fx : fx + side] = 1.0

    before_items = items(rng.uniform(0.55, 1.0), olds, "2021-06-01")
    after_items = items(rng.uniform(0.25, 0.9), olds + news, "2022-06-01")
    stack = change_pair_composite(before_items, after_items, BANDS)

    predict = lambda chips: model.apply(variables, chips)["probs"]
    want = label.astype(bool)
    out = {}
    for mode, kw in [
        ("hann", dict(blend="hann", index_mode="grid")),
        ("whole", dict(tile_mode="whole", whole_multiple=8)),
    ]:
        eng = TiledInferenceEngine(
            predict, kernel=K, buffer=128, batch_size=8, out_channels=1, **kw
        )
        prob = np.asarray(eng.predict_scene(jnp.asarray(stack)))[..., 0]
        pred = prob >= threshold
        tp = int((pred & want).sum())
        fp = int((pred & ~want).sum())
        fn = int((~pred & want).sum())
        out[mode] = round(tp / max(tp + fp + fn, 1), 4)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-size", type=int, default=400)
    ap.add_argument("--eval-size", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=9e-4)
    ap.add_argument("--pos-weight", type=float, default=4.0)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--out", default="runs/change_convergence.jsonl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scene-eval", action="store_true")
    args = ap.parse_args(argv)

    model = StackedSiamese(threshold=args.threshold)
    state = create_train_state(
        model, jax.random.key(args.seed), jnp.zeros((1, K, K, 2 * NB)),
        tx=optax.adam(args.lr),
    )
    loss_fn = lambda y, p: losses.weighted_bce(
        y, p, pos_weight=args.pos_weight, logits=True)
    train_step = make_train_step(loss_fn, pred_key="logits", num_classes=2)
    eval_step = make_eval_step(loss_fn, pred_key="logits", num_classes=2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    log = open(args.out, "a")

    print(f"change convergence: {args.train_size} pair chips x "
          f"{args.epochs} epochs, batch {args.batch_size}")
    state, best = run_convergence(
        state, train_step, eval_step, make_chip, args, log,
        keep_best_state=args.scene_eval)

    summary = {"final": {k: round(float(v), 4) for k, v in best.items()},
               "config": vars(args)}
    if args.scene_eval:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        iou = scene_eval(model, variables, args.threshold)
        print("SCENE_EVAL " + json.dumps(iou))
        log.write(json.dumps({"scene_eval_iou": iou}) + "\n")
        summary["scene_eval_iou"] = iou
    print("SUMMARY " + json.dumps(summary))
    log.write(json.dumps(summary) + "\n")
    log.close()


if __name__ == "__main__":
    main()
