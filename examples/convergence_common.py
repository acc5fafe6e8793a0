"""Shared plumbing for the convergence-evidence harnesses.

solar_convergence.py and parking_convergence.py differ in their chip
synthesizers, models and losses; everything else — stable seeding,
smooth background fields, prefetched batch streams, binary metrics, and
the epoch/eval/JSONL loop with device-side loss accumulation — lives
here once.
"""

import json
import time
import zlib

import numpy as np

import jax


def stable_seed(split: str, index: int, stride: int = 1_000_003) -> int:
    """Process-stable chip seed (str hash is salted per interpreter,
    which would give every run a different dataset)."""
    return (zlib.crc32(split.encode()) & 0xFFFF) * stride + index


def smooth_field(rng, k: int, scale: int = 16) -> np.ndarray:
    """(k, k) spatially correlated noise: bilinear-upsampled low-res normal."""
    low = rng.normal(size=(k // scale + 2, k // scale + 2)).astype(np.float32)
    idx = np.linspace(0, low.shape[0] - 1.001, k)
    yi, xi = np.meshgrid(idx, idx, indexing="ij")
    y0, x0 = yi.astype(int), xi.astype(int)
    fy, fx = yi - y0, xi - x0
    a = low[y0, x0] * (1 - fy) * (1 - fx) + low[y0 + 1, x0] * fy * (1 - fx)
    b = low[y0, x0 + 1] * (1 - fy) * fx + low[y0 + 1, x0 + 1] * fy * fx
    return a + b


# ---------------------------------------------------------------------------
# Shared landcover class signatures for the multi-head harnesses
# (hierarchical_convergence.py and hybrid_convergence.py build chips from the
# same palette so their evidence is comparable; importing them from either
# harness would execute that harness's import-time side effects).
# ---------------------------------------------------------------------------

PERIOD = 12.0  # seasonal period in observation steps

CLASSES = ["water", "tree", "grass", "crop", "impervious", "wetland"]
NCLASS = len(CLASSES)
SUBCLASSES = ["wet", "vegetation", "built"]
NSUB = len(SUBCLASSES)
# main -> coarse super-class (the hierarchical mid-depth head's target)
SUB_OF = np.array([0, 1, 1, 1, 2, 0], np.int32)

# per-class (R, G, B, N) reflectance means; grass (2) and crop (3) are
# IDENTICAL on purpose — only the timeseries separates them
SIGS = np.array([
    [0.10, 0.14, 0.20, 0.06],   # water
    [0.14, 0.24, 0.13, 0.58],   # tree
    [0.38, 0.48, 0.26, 0.58],   # grass
    [0.38, 0.48, 0.26, 0.58],   # crop (== grass in a single date)
    [0.56, 0.56, 0.56, 0.30],   # impervious
    [0.17, 0.26, 0.20, 0.42],   # wetland
], np.float32)
# seasonal NDVI-like amplitude per class: crop swings hard, grass a
# little, the rest are near-static
AMPS = np.array([0.00, 0.05, 0.08, 0.40, 0.00, 0.12], np.float32)


def chip_batches(make_chip, split, n, batch, rng, shuffle=True, prefetch=2):
    """Prefetched (x, y) device batches from a (split, index) chip fn."""
    from satellite_computervision_tpu.data.pipeline import prefetch_to_device

    def raw():
        order = np.arange(n)
        if shuffle:
            rng.shuffle(order)
        for i in range(0, n - batch + 1, batch):
            xs, ys = zip(*(make_chip(split, int(j)) for j in order[i : i + batch]))
            yield np.stack(xs), np.stack(ys)

    yield from prefetch_to_device(raw(), size=prefetch)


def binary_metrics(cm) -> dict:
    tn, fp, fn, tp = cm[0, 0], cm[0, 1], cm[1, 0], cm[1, 1]
    iou = tp / max(tp + fp + fn, 1)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    acc = (tp + tn) / max(cm.sum(), 1)
    return {"iou": iou, "f1": f1, "precision": prec, "recall": rec, "accuracy": acc}


def multiclass_metrics(cm, class_names=None) -> dict:
    """Per-class IoU + mean IoU + accuracy from an (C, C) confusion
    matrix (rows = truth). ``iou`` aliases ``mean_iou`` so the shared
    best-epoch tracking works unchanged."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    fp = cm.sum(axis=0) - tp
    fn = cm.sum(axis=1) - tp
    iou = tp / np.maximum(tp + fp + fn, 1)
    names = class_names or [f"c{i}" for i in range(cm.shape[0])]
    out = {
        "iou": float(iou.mean()),
        "mean_iou": float(iou.mean()),
        "accuracy": float(tp.sum() / max(cm.sum(), 1)),
    }
    out.update({f"iou_{n}": float(v) for n, v in zip(names, iou)})
    return out


def run_convergence(
    state,
    train_step,
    eval_step,
    make_chip,
    args,
    log,
    extra_record=None,
    num_classes=2,
    metrics_fn=None,
    keep_best_state=False,
):
    """The shared epoch loop: train (device-side loss accumulation — one
    host sync per epoch), eval to a confusion matrix, JSONL record per
    epoch, best-epoch tracking (on ``metrics_fn``'s ``iou`` key — mean
    IoU for :func:`multiclass_metrics`). Returns (state, best: dict).

    With ``keep_best_state=True`` the returned state is the BEST epoch's
    (host-side copy taken at each new best) rather than the last — the
    harness analog of the reference's ModelCheckpoint(save_best_only)
    callback (solar notebook cell 17), for scene evals that should score
    the model a user would actually keep."""
    metrics_fn = metrics_fn or binary_metrics
    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed + 1)
    best = None
    best_state = None
    for epoch in range(args.epochs):
        t0 = time.time()
        tloss, steps = None, 0
        for x, y in chip_batches(make_chip, "train", args.train_size,
                                 args.batch_size, rng):
            key, sub = jax.random.split(key)
            state, out = train_step(state, (x, y), sub)
            tloss = out["loss"] if tloss is None else tloss + out["loss"]
            steps += 1
        tloss = float(tloss) if steps else 0.0

        cm = np.zeros((num_classes, num_classes), np.float64)
        eloss, esteps = None, 0
        for x, y in chip_batches(make_chip, "eval", args.eval_size,
                                 args.batch_size, rng, shuffle=False):
            out = eval_step(state, (x, y))
            cm += np.asarray(out["cm"], np.float64)
            eloss = out["loss"] if eloss is None else eloss + out["loss"]
            esteps += 1
        eloss = float(eloss) if esteps else 0.0

        m = metrics_fn(cm)
        rec = {
            "epoch": epoch,
            "train_loss": tloss / max(steps, 1),
            "eval_loss": eloss / max(esteps, 1),
            **{k: round(float(v), 4) for k, v in m.items()},
            "secs": round(time.time() - t0, 1),
        }
        if extra_record:
            rec.update(extra_record)
        # >= so the first epoch always seeds a full-schema best record
        if best is None or m["iou"] >= best["iou"]:
            best = {**m, "epoch": epoch}
            if keep_best_state:
                best_state = jax.device_get(state)
        print(json.dumps(rec))
        log.write(json.dumps(rec) + "\n")
        log.flush()
    if keep_best_state and best_state is not None:
        state = jax.device_put(best_state)
    return state, best or {}
