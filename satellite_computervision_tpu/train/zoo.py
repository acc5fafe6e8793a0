"""Model-zoo registry: one place mapping every reference model family to a
builder, example inputs, and a default loss — so the training CLI and smoke
tests drive the full zoo, not just the U-Nets.

The reference's notebooks/Azure scripts instantiated each family ad hoc
(utils/model_tools.py:394-1051); the shipped snapshot has no driver for
siamese/LSTM/hybrid/ACNN beyond the builders, so these defaults come from
the builders' own signatures and the generator shapes that feed them
(utils/processing.py:456-1184).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from satellite_computervision_tpu.models import losses


@dataclasses.dataclass(frozen=True)
class Family:
    """One model family: how to build it, feed it, and train it.

    ``example_inputs(cfg)`` returns the positional input arrays for
    ``model.init``/apply (multi-input families return several);
    ``example_labels(cfg)`` the matching target structure;
    ``loss(cfg)`` -> (loss_fn, pred_key) where pred_key=None hands the whole
    output dict to loss_fn (multi-head families)."""

    name: str
    build: Callable
    example_inputs: Callable
    example_labels: Callable
    loss: Callable
    ref: str = ""


def _bce(cfg):
    pos = cfg.loss_kwargs.get("pos_weight", 1.0) if cfg else 1.0
    return (lambda y, p: losses.weighted_bce(y, p, pos_weight=pos, logits=True)), "logits"


def _wcce(cfg):
    n = cfg.num_classes if cfg else 8
    w = np.ones(n, np.float32)
    return (
        lambda y, p: losses.weighted_categorical_crossentropy(
            y, p, w, reduce_mean=True
        )
    ), "probs"


def _build_unet(cfg=None, **kw):
    from satellite_computervision_tpu.models import UNet

    n = cfg.num_classes if cfg else 1
    kw.setdefault("head", "sigmoid" if n == 1 else "softmax")
    kw.setdefault("threshold", cfg.threshold if cfg else 0.5)
    # from-scratch presets may carry the measured S2D stem default
    # (TrainConfig.space_to_depth); explicit kw always wins, and the
    # weight-import paths never route through cfg (keras_import infers
    # arch from the .h5 itself)
    kw.setdefault("space_to_depth", bool(getattr(cfg, "space_to_depth", False)))
    return UNet(n_classes=n, **kw)


def _build_deeplab(cfg=None, **kw):
    from satellite_computervision_tpu.models import DeepLabV3Plus

    n = cfg.num_classes if cfg else 1
    kw.setdefault("head", "sigmoid" if n == 1 else "softmax")
    kw.setdefault("threshold", cfg.threshold if cfg else 0.5)
    return DeepLabV3Plus(n_classes=n, **kw)


def _build_siamese(cfg=None, **kw):
    from satellite_computervision_tpu.models import SiameseUNet

    kw.setdefault("threshold", cfg.threshold if cfg else 0.5)
    return SiameseUNet(**kw)


def _build_lstm(cfg=None, **kw):
    from satellite_computervision_tpu.models import LSTMModel

    return LSTMModel(n_classes=cfg.num_classes if cfg else 1, **kw)


def _build_lstm_ae(cfg=None, **kw):
    from satellite_computervision_tpu.models import LSTMAutoencoder

    kw.setdefault("n_time", getattr(cfg, "n_time", 6) if cfg else 6)
    return LSTMAutoencoder(n_classes=cfg.num_classes if cfg else 1, **kw)


def _build_hybrid(cfg=None, **kw):
    from satellite_computervision_tpu.models import HybridUNetLSTM

    return HybridUNetLSTM(n_classes=cfg.num_classes if cfg else 8, **kw)


def _build_acnn(cfg=None, **kw):
    from satellite_computervision_tpu.models import ACNN

    return ACNN(n_classes=cfg.num_classes if cfg else 8, **kw)


def _build_hierarchical(cfg=None, **kw):
    from satellite_computervision_tpu.models import HierarchicalACNN

    n = cfg.num_classes if cfg else 8
    kw.setdefault("acnn_classes", n)
    kw.setdefault("sub_classes", max(2, n // 2))
    return HierarchicalACNN(n_classes=n, **kw)


def _img(cfg, k=None, c=None):
    k = k or (cfg.kernel_size if cfg else 32)
    c = c or (len(cfg.bands) if cfg else 4)
    return np.zeros((1, k, k, c), np.float32)


def _series(cfg, t=None, k=32, c=None):
    t = t or (getattr(cfg, "n_time", 6) if cfg else 6)
    c = c or (len(cfg.bands) if cfg else 6)
    return np.zeros((1, t, k, k, c), np.float32)


def _onehot_labels(cfg, k=None):
    n = cfg.num_classes if cfg else 8
    k = k or (cfg.kernel_size if cfg else 32)
    y = np.zeros((1, k, k, n), np.float32)
    y[..., 0] = 1.0
    return y


def _lstm_ae_loss(cfg=None):
    def loss_fn(y, out):
        temporal_y, single_y = y
        return losses.mse_4d(single_y, out["single"]) + losses.mse_4d(
            temporal_y.reshape((-1,) + temporal_y.shape[2:]),
            out["temporal"].reshape((-1,) + out["temporal"].shape[2:]),
        )

    return loss_fn, None


def _hierarchical_loss(cfg=None):
    n = cfg.num_classes if cfg else 8
    sub = max(2, n // 2)
    w_n, w_sub = np.ones(n, np.float32), np.ones(sub, np.float32)

    def loss_fn(y, out):
        y_main, y_sub = y
        wcce = losses.weighted_categorical_crossentropy
        return (
            wcce(y_main, out["lstm_probs"], w_n, reduce_mean=True)
            + wcce(y_main, out["acnn_probs"], w_n, reduce_mean=True)
            + wcce(y_sub, out["sub_probs"], w_sub, reduce_mean=True)
        )

    return loss_fn, None


FAMILIES = {
    "unet": Family(
        "unet", _build_unet,
        lambda cfg: (_img(cfg),),
        lambda cfg: np.zeros((1, cfg.kernel_size if cfg else 32,
                              cfg.kernel_size if cfg else 32,
                              max(1, cfg.num_classes if cfg else 1)), np.float32),
        _bce, ref="utils/model_tools.py:394-531",
    ),
    "deeplab": Family(
        "deeplab", _build_deeplab,
        lambda cfg: (_img(cfg, k=max(64, cfg.kernel_size if cfg else 64)),),
        lambda cfg: np.zeros((1, max(64, cfg.kernel_size if cfg else 64),
                              max(64, cfg.kernel_size if cfg else 64),
                              max(1, cfg.num_classes if cfg else 1)), np.float32),
        _bce, ref="README.md:8 (capability gap filled)",
    ),
    "siamese": Family(
        "siamese", _build_siamese,
        lambda cfg: (_img(cfg), _img(cfg)),
        lambda cfg: np.zeros((1, cfg.kernel_size if cfg else 32,
                              cfg.kernel_size if cfg else 32, 1), np.float32),
        _bce, ref="utils/model_tools.py:576-663",
    ),
    "convlstm": Family(
        "convlstm", _build_lstm,
        lambda cfg: (_series(cfg),),
        lambda cfg: np.zeros((1, 32, 32, max(1, cfg.num_classes if cfg else 1)),
                             np.float32),
        lambda cfg: ((lambda y, p: losses.mse_4d(y, p)), None),
        ref="utils/model_tools.py:666-808",
    ),
    "lstm_autoencoder": Family(
        "lstm_autoencoder", _build_lstm_ae,
        lambda cfg: (
            _series(cfg),
            # sin/cos harmonics concat at the single-step head: (B, H, W, 2)
            np.zeros((1, 32, 32, 2), np.float32),
        ),
        lambda cfg: (
            _series(cfg, c=max(1, cfg.num_classes if cfg else 1)),
            np.zeros((1, 32, 32, max(1, cfg.num_classes if cfg else 1)), np.float32),
        ),
        _lstm_ae_loss, ref="utils/model_tools.py:810-872",
    ),
    "hybrid": Family(
        "hybrid", _build_hybrid,
        lambda cfg: (_img(cfg), _series(cfg, k=32)),
        _onehot_labels,
        _wcce, ref="utils/model_tools.py:874-920",
    ),
    "acnn": Family(
        "acnn", _build_acnn,
        lambda cfg: (_img(cfg),),
        _onehot_labels,
        _wcce, ref="utils/model_tools.py:922-1014",
    ),
    "hierarchical": Family(
        "hierarchical", _build_hierarchical,
        lambda cfg: (_img(cfg), _series(cfg, k=cfg.kernel_size if cfg else 32)),
        lambda cfg: (
            _onehot_labels(cfg),
            np.zeros(_onehot_labels(cfg).shape[:-1]
                     + (max(2, (cfg.num_classes if cfg else 8) // 2),), np.float32),
        ),
        _hierarchical_loss, ref="utils/model_tools.py:1016-1051",
    ),
}


def get_family(name: str) -> Family:
    if name not in FAMILIES:
        raise KeyError(f"unknown model family {name!r}; choose from {sorted(FAMILIES)}")
    return FAMILIES[name]
