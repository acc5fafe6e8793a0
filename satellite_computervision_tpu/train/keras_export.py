"""Export trained weights to the reference's Keras ``.h5`` layout.

The inverse of :mod:`train.keras_import`, for every importable family:
U-Net, Siamese change-detection, LSTM, LSTM-autoencoder and hybrid.
Each exporter writes a flax params/batch_stats pair as a Keras-2
``save_weights``-format HDF5 file that

- :func:`train.keras_import.load_keras_unet_h5` reads back bit-for-bit
  (pure-numpy roundtrip, pinned in tests/test_keras_export.py), and
- a tf.keras reference model (utils/model_tools.py:321-531 architecture)
  loads with ``model.load_weights(path)`` — Keras' legacy-HDF5 loader
  matches layers topologically and expects each layer's ``weight_names``
  in trainable-then-non-trainable order, which is the order written here
  (opt-in exact-parity test under ``SCV_TF_PARITY=1``).

This completes the bidirectional weight bridge with the reference
ecosystem: published ``.h5`` artifacts import (keras_import), and models
trained here hand back to colleagues still running the TF/Keras stack.

Tensor conventions are the exact inverses documented in keras_import:
conv kernels HWIO pass through, ConvTranspose kernels are spatially
flipped and (in,out)->(out,in) transposed (an involution), BatchNorm
scale/bias/mean/var -> gamma/beta/moving_mean/moving_variance.
"""

from __future__ import annotations

import io
from typing import Dict, List, Tuple

import numpy as np

__all__ = [
    "export_keras_unet_h5",
    "export_keras_unet_h5_bytes",
    "export_keras_siamese_h5",
    "export_keras_siamese_h5_bytes",
    "export_keras_lstm_h5",
    "export_keras_lstm_autoencoder_h5",
    "export_keras_hybrid_h5",
]


def _np(a) -> np.ndarray:
    return np.asarray(a, np.float32)


class _Names:
    """Keras-style global auto-numbering: first instance bare, then _1…"""

    def __init__(self):
        self.counts: Dict[str, int] = {}

    def next(self, base: str) -> str:
        n = self.counts.get(base, 0)
        self.counts[base] = n + 1
        return base if n == 0 else f"{base}_{n}"


def _conv_weights(parent: str, p) -> List[Tuple[str, np.ndarray]]:
    out = [(f"{parent}/kernel:0", _np(p["kernel"]))]
    if "bias" in p:
        out.append((f"{parent}/bias:0", _np(p["bias"])))
    return out


def _conv_transpose_weights(parent: str, p) -> List[Tuple[str, np.ndarray]]:
    # inverse of keras_import._conv_transpose_params — the same flip +
    # (…, in, out) <-> (…, out, in) swap (it is its own inverse)
    k = _np(p["kernel"])[::-1, ::-1].transpose(0, 1, 3, 2).copy()
    out = [(f"{parent}/kernel:0", k)]
    if "bias" in p:
        out.append((f"{parent}/bias:0", _np(p["bias"])))
    return out


def _bn_weights(parent: str, p, s):
    trainable = [
        (f"{parent}/gamma:0", _np(p["scale"])),
        (f"{parent}/beta:0", _np(p["bias"])),
    ]
    stats = [
        (f"{parent}/moving_mean:0", _np(s["mean"])),
        (f"{parent}/moving_variance:0", _np(s["var"])),
    ]
    return trainable, stats


def _cba_block_weights(lname: str, names: _Names, p_block, s_block):
    """One ConvBlock (ConvBNAct_i subtrees) as a single Keras Layer group:
    weight_names trainable-first across the block (Keras `_legacy_weights`
    order), nested paths containing conv_batch_act so keras_import
    recognizes the group as an encoder/center block."""
    n_cba = len([k for k in p_block if k.startswith("ConvBNAct_")])
    if n_cba == 0:
        raise ValueError(
            f"{lname}: no ConvBNAct_* subtrees — not a UNet ConvBlock tree "
            "(fold_bn serving trees are not exportable; export the training "
            "checkpoint instead)"
        )
    trainable: List[Tuple[str, np.ndarray]] = []
    non_trainable: List[Tuple[str, np.ndarray]] = []
    inner_cb = names.next("conv_block")
    for i in range(n_cba):
        sub_p = p_block[f"ConvBNAct_{i}"]
        if "BatchNorm_0" not in sub_p:
            raise ValueError(
                f"{lname}/ConvBNAct_{i}: no BatchNorm_0 — fold_bn serving "
                "trees are not exportable; export the training checkpoint"
            )
        cba = names.next("conv_batch_act")
        conv = names.next("conv2d")
        bn = names.next("batch_normalization")
        pfx = f"{lname}/{inner_cb}/{cba}"
        trainable.extend(_conv_weights(f"{pfx}/{conv}", sub_p["Conv_0"]))
        bn_train, bn_stats = _bn_weights(
            f"{pfx}/{bn}", sub_p["BatchNorm_0"],
            s_block[f"ConvBNAct_{i}"]["BatchNorm_0"],
        )
        trainable.extend(bn_train)
        non_trainable.extend(bn_stats)
    return trainable + non_trainable


def export_keras_unet_h5(params, batch_stats, path_or_buf) -> None:
    """Write a ``models.UNet`` params/batch_stats pair as a reference-layout
    Keras ``.h5`` weights file.

    ``params``/``batch_stats`` are the UNet's variable subtrees (any
    ``convs_per_block``, any head — the head is architecture metadata, not
    weights). Raises ``ValueError`` for trees the reference architecture
    cannot represent: the space-to-depth stem (``stem_upsample``) and
    folded-BN serving trees.
    """
    params = dict(params)
    batch_stats = dict(batch_stats)
    if "stem_upsample" in params:
        raise ValueError(
            "space_to_depth UNets are a TPU architectural variant with no "
            "reference-Keras equivalent — train with space_to_depth=False "
            "to produce exportable weights"
        )
    enc_names = sorted(
        (k for k in params if k.startswith("EncoderBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    dec_names = sorted(
        (k for k in params if k.startswith("DecoderBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not enc_names or "ConvBlock_0" not in params or "head" not in params:
        raise ValueError(
            "not a UNet variable tree (need EncoderBlock_*, ConvBlock_0, head)"
        )
    if len(enc_names) != len(dec_names):
        raise ValueError(
            f"{len(enc_names)} encoder vs {len(dec_names)} decoder blocks"
        )

    names = _Names()
    layers: List[Tuple[str, List[Tuple[str, np.ndarray]]]] = []

    for enc in enc_names:
        lname = names.next("encoder_block")
        layers.append((
            lname,
            _cba_block_weights(
                lname, names,
                params[enc]["ConvBlock_0"],
                batch_stats.get(enc, {}).get("ConvBlock_0", {}),
            ),
        ))

    # center: the layer name itself must start with conv_block (that is how
    # keras_import tells it from the encoders); give it the next free one
    center_name = names.next("conv_block")
    layers.append((
        center_name,
        _cba_block_weights(
            center_name, names, params["ConvBlock_0"],
            batch_stats.get("ConvBlock_0", {}),
        ),
    ))

    for dec in dec_names:
        _append_decoder_layers(layers, names, dec, params[dec], batch_stats[dec])

    layers.append(("logits", _conv_weights("logits", params["head"])))
    _write_h5(layers, path_or_buf)


def _append_decoder_layers(layers, names: _Names, dec: str, p, s) -> None:
    """One functional decoder level (utils/model_tools.py:288-318) as flat
    Keras layers: conv2d_transpose, bn, (conv, bn) x2."""
    if "affine_0_scale" in p or "BatchNorm_0" not in p:
        raise ValueError(
            f"{dec}: folded-BN serving tree — export the training "
            "checkpoint instead"
        )
    ct = names.next("conv2d_transpose")
    layers.append((ct, _conv_transpose_weights(ct, p["ConvTranspose_0"])))
    for unit in range(3):  # bn, then (conv, bn) x2 per decoder level
        if unit > 0:
            conv = names.next("conv2d")
            layers.append((conv, _conv_weights(conv, p[f"Conv_{unit - 1}"])))
        bn = names.next("batch_normalization")
        bn_train, bn_stats = _bn_weights(
            bn, p[f"BatchNorm_{unit}"], s[f"BatchNorm_{unit}"]
        )
        layers.append((bn, bn_train + bn_stats))


def _write_h5(layers, path_or_buf) -> None:
    import h5py

    with h5py.File(path_or_buf, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, _ in layers])
        # Keras' legacy loader keys conversion behavior off these; 2.x +
        # tensorflow is the no-conversion path
        f.attrs["keras_version"] = np.bytes_(b"2.15.0")
        f.attrs["backend"] = np.bytes_(b"tensorflow")
        for lname, weights in layers:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array([w.encode() for w, _ in weights])
            for wname, arr in weights:
                g.create_dataset(wname, data=arr)


def export_keras_siamese_h5(params, batch_stats, path_or_buf) -> None:
    """Write a ``models.SiameseUNet`` params/batch_stats pair as a
    reference-layout Keras ``.h5`` weights file.

    Reference builder: get_siamese_layers / make_siamese_unet
    (utils/model_tools.py:576-663). Layer order mirrors the functional
    model's topology: shared ``encoder_{i}`` blocks, the shared ASPP
    Layer, then flat decoder levels and the sigmoid ``probs`` head. The
    ASPP Layer's weights follow Keras sublayer *creation* order — 1x1,
    fuse 1x1 (``cba3``; its twin ``cba2`` is never called so contributes
    no weights), then the dilated 3x3s (utils/model_tools.py:533-574) —
    whereas the flax ``blocks.ASPP`` orders them 1x1, d3, d6, d12, fuse;
    the reorder here is the inverse of load_keras_siamese_h5's
    shape-based assignment.
    """
    params = dict(params)
    batch_stats = dict(batch_stats)
    enc_names = sorted(
        (k for k in params if k.startswith("encoder_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    dec_names = sorted(
        (k for k in params if k.startswith("DecoderBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not enc_names or "aspp" not in params or "head" not in params:
        raise ValueError(
            "not a SiameseUNet variable tree (need encoder_*, aspp, head)"
        )
    if len(enc_names) != len(dec_names):
        raise ValueError(
            f"{len(enc_names)} encoder vs {len(dec_names)} decoder blocks"
        )

    names = _Names()
    layers: List[Tuple[str, List[Tuple[str, np.ndarray]]]] = []

    for enc in enc_names:
        lname = names.next("encoder_block")
        layers.append((
            lname,
            _cba_block_weights(
                lname, names,
                params[enc]["ConvBlock_0"],
                batch_stats.get(enc, {}).get("ConvBlock_0", {}),
            ),
        ))

    aspp_p = params["aspp"]
    aspp_s = batch_stats.get("aspp", {})
    n_cba = len([k for k in aspp_p if k.startswith("ConvBNAct_")])
    if n_cba != 5:
        raise ValueError(
            f"aspp: expected 5 ConvBNAct_* subtrees, got {n_cba} "
            "(folded trees are not exportable)"
        )
    trainable: List[Tuple[str, np.ndarray]] = []
    stats: List[Tuple[str, np.ndarray]] = []
    # flax order 0=1x1, 1..3=dilated 3x3s, 4=fuse -> reference creation
    # order 1x1, fuse, d3, d6, d12
    for idx in (0, 4, 1, 2, 3):
        sub_p = aspp_p[f"ConvBNAct_{idx}"]
        if "BatchNorm_0" not in sub_p:
            raise ValueError(
                f"aspp/ConvBNAct_{idx}: no BatchNorm_0 — folded trees are "
                "not exportable; export the training checkpoint"
            )
        cba = names.next("conv_batch_act")
        conv = names.next("conv2d")
        bn = names.next("batch_normalization")
        pfx = f"ASPP/{cba}"
        trainable.extend(_conv_weights(f"{pfx}/{conv}", sub_p["Conv_0"]))
        bn_train, bn_stats = _bn_weights(
            f"{pfx}/{bn}", sub_p["BatchNorm_0"],
            aspp_s[f"ConvBNAct_{idx}"]["BatchNorm_0"],
        )
        trainable.extend(bn_train)
        stats.extend(bn_stats)
    layers.append(("ASPP", trainable + stats))

    for dec in dec_names:
        _append_decoder_layers(layers, names, dec, params[dec], batch_stats[dec])

    layers.append(("probs", _conv_weights("probs", params["head"])))
    _write_h5(layers, path_or_buf)


def export_keras_siamese_h5_bytes(params, batch_stats) -> bytes:
    """In-memory variant of :func:`export_keras_siamese_h5`."""
    buf = io.BytesIO()
    export_keras_siamese_h5(params, batch_stats, buf)
    return buf.getvalue()


def _convlstm_weights(parent: str, p_tree) -> List[Tuple[str, np.ndarray]]:
    """Inverse of keras_import._assign_convlstm: our cell's input/recurrent
    conv pair as one Keras ConvLSTM2D unit. The cell adds the unit forget
    bias (+1) at runtime while Keras stores it in the bias tensor, so the
    forget quarter is shifted up by 1 on export."""
    cell = p_tree["cell"]
    rk = _np(cell["recurrent_conv"]["kernel"])
    feats = rk.shape[2]
    bias = _np(cell["input_conv"]["bias"]).copy()
    bias[feats : 2 * feats] += 1.0
    return [
        (f"{parent}/kernel:0", _np(cell["input_conv"]["kernel"])),
        (f"{parent}/recurrent_kernel:0", rk),
        (f"{parent}/bias:0", bias),
    ]


def _lstm_stack_layers(p, s):
    """build_lstm_layers / build_lstm_layers2 as the reference's four
    named layers (utils/model_tools.py:666-771): conv_lstm, batch_norm,
    dilated_conv_lstm, batch_norm2."""
    layer_names = (
        ("conv_lstm", "batch_norm"), ("dilated_conv_lstm", "batch_norm2"),
    )
    layers: List[Tuple[str, List[Tuple[str, np.ndarray]]]] = []
    for i, (lstm_name, bn_name) in enumerate(layer_names):
        if f"ConvLSTM_{i}" not in p or f"BatchNorm_{i}" not in p:
            raise ValueError(
                f"not an LSTM stack tree (need ConvLSTM_{i}/BatchNorm_{i})"
            )
        layers.append((lstm_name, _convlstm_weights(lstm_name, p[f"ConvLSTM_{i}"])))
        bn_train, bn_stats = _bn_weights(
            bn_name, p[f"BatchNorm_{i}"], s[f"BatchNorm_{i}"]
        )
        layers.append((bn_name, bn_train + bn_stats))
    return layers


def export_keras_lstm_h5(params, batch_stats, path_or_buf) -> None:
    """Write a ``models.LSTMModel`` params/batch_stats pair as a
    reference-layout Keras ``.h5`` (get_lstm_model,
    utils/model_tools.py:773-808): the named ConvLSTM stack then the 1x1
    head conv under the capped ReLU."""
    if "LSTMStack_0" not in params or "Conv_0" not in params:
        raise ValueError(
            "not an LSTMModel variable tree (need LSTMStack_0, Conv_0)"
        )
    layers = _lstm_stack_layers(
        params["LSTMStack_0"], batch_stats["LSTMStack_0"]
    )
    layers.append(("conv2d", _conv_weights("conv2d", params["Conv_0"])))
    _write_h5(layers, path_or_buf)


def export_keras_lstm_autoencoder_h5(params, batch_stats, path_or_buf) -> None:
    """Write a ``models.LSTMAutoencoder`` pair as a reference-layout Keras
    ``.h5`` (get_lstm_autoencoder, utils/model_tools.py:810-872): the
    residual encoder stack, the repeated-state ``lstm_decoder``, the
    TimeDistributed ``temporal_dense`` head and the ``single_dense``
    next-step head over encoded‖sincos."""
    need = {"LSTMStack2_0", "lstm_decoder", "temporal_dense", "single_dense"}
    missing = need - set(params)
    if missing:
        raise ValueError(
            f"not an LSTMAutoencoder variable tree (missing {sorted(missing)})"
        )
    layers = _lstm_stack_layers(
        params["LSTMStack2_0"], batch_stats["LSTMStack2_0"]
    )
    layers.append(
        ("lstm_decoder", _convlstm_weights("lstm_decoder", params["lstm_decoder"]))
    )
    # the reference wraps temporal_dense in TimeDistributed; weights live
    # under the wrapper layer with the inner conv's variable paths
    layers.append(
        ("time_distributed", _conv_weights("temporal_dense", params["temporal_dense"]))
    )
    layers.append(
        ("single_dense", _conv_weights("single_dense", params["single_dense"]))
    )
    _write_h5(layers, path_or_buf)


def export_keras_hybrid_h5(params, batch_stats, path_or_buf) -> None:
    """Write a ``models.HybridUNetLSTM`` pair as a reference-layout Keras
    ``.h5`` (get_hybrid_model, utils/model_tools.py:874-920): the U-Net
    trunk (encoder blocks, center conv_block, functional decoder levels),
    the 1x1 ``unet_dense``, the four named LSTM-stack layers, the 1x1
    ``lstm_dense`` and the fusing ``probabilities`` head. The unet dense
    conv is numbered before the lstm dense (Keras' global auto-name
    counter mirrors the builder's creation order), which is what
    load_keras_hybrid_h5 falls back on when both read equal widths."""
    need = {"unet", "LSTMStack_0", "unet_dense", "lstm_dense", "probabilities"}
    missing = need - set(params)
    if missing:
        raise ValueError(
            f"not a HybridUNetLSTM variable tree (missing {sorted(missing)})"
        )
    unet_p = dict(params["unet"])
    unet_s = dict(batch_stats["unet"])
    if "stem_upsample" in unet_p:
        raise ValueError(
            "space_to_depth trunks have no reference-Keras equivalent — "
            "train with space_to_depth=False to produce exportable weights"
        )
    enc_names = sorted(
        (k for k in unet_p if k.startswith("EncoderBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    dec_names = sorted(
        (k for k in unet_p if k.startswith("DecoderBlock_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if not enc_names or "ConvBlock_0" not in unet_p:
        raise ValueError("hybrid unet trunk: need EncoderBlock_*, ConvBlock_0")
    if len(enc_names) != len(dec_names):
        raise ValueError(
            f"{len(enc_names)} encoder vs {len(dec_names)} decoder blocks"
        )

    names = _Names()
    layers: List[Tuple[str, List[Tuple[str, np.ndarray]]]] = []
    for enc in enc_names:
        lname = names.next("encoder_block")
        layers.append((
            lname,
            _cba_block_weights(
                lname, names,
                unet_p[enc]["ConvBlock_0"],
                unet_s.get(enc, {}).get("ConvBlock_0", {}),
            ),
        ))
    center_name = names.next("conv_block")
    layers.append((
        center_name,
        _cba_block_weights(
            center_name, names, unet_p["ConvBlock_0"],
            unet_s.get("ConvBlock_0", {}),
        ),
    ))
    for dec in dec_names:
        _append_decoder_layers(layers, names, dec, unet_p[dec], unet_s[dec])

    unet_dense = names.next("conv2d")
    layers.append((unet_dense, _conv_weights(unet_dense, params["unet_dense"])))
    layers.extend(
        _lstm_stack_layers(params["LSTMStack_0"], batch_stats["LSTMStack_0"])
    )
    lstm_dense = names.next("conv2d")
    layers.append((lstm_dense, _conv_weights(lstm_dense, params["lstm_dense"])))
    layers.append(("probabilities", _conv_weights("probabilities", params["probabilities"])))
    _write_h5(layers, path_or_buf)


def export_keras_unet_h5_bytes(params, batch_stats) -> bytes:
    """In-memory variant: the ``.h5`` file as bytes (e.g. for blob upload
    via cloud.blob, the reference's model-artifact channel)."""
    buf = io.BytesIO()
    export_keras_unet_h5(params, batch_stats, buf)
    return buf.getvalue()
