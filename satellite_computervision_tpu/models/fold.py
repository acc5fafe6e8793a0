"""BatchNorm folding for inference serving.

At inference a BatchNorm is a constant per-channel affine
``y = (x - mean) / sqrt(var + eps) * gamma + beta``; when it directly
follows a conv, that affine folds into the conv's kernel and bias, so the
served program carries no BN ops at all. The reference serves Keras
models with live BN layers (utils/model_tools.py:174-186); this is the
standard deployment transform it never applied.

``fold_unet_variables`` maps a trained ``UNet`` params/batch_stats pair
onto the parameter structure of the same ``UNet`` built with
``fold_bn=True``:

- every ConvBNAct's BN folds into its conv (encoders, center, decoder
  tail convs);
- each DecoderBlock's post-concat BN has no single producing conv (it
  normalizes skip channels too), so it becomes a precomputed affine
  (``affine_0_scale``/``affine_0_bias``);
- the space-to-depth stem upsample's BN folds into the transpose conv.

Numerically identical to eval-mode BN (exactly: the same a*x+c per
channel, just reassociated into the conv weights).
"""

from __future__ import annotations

import numpy as np

import jax

_BN_EPS = 1e-3  # blocks.ConvBNAct / DecoderBlock epsilon (Keras default)


def _affine(bn_p, bn_s, eps=_BN_EPS):
    """BN -> (a, c) with y = a*x + c per channel."""
    g = np.asarray(bn_p["scale"], np.float64)
    b = np.asarray(bn_p["bias"], np.float64)
    m = np.asarray(bn_s["mean"], np.float64)
    v = np.asarray(bn_s["var"], np.float64)
    a = g / np.sqrt(v + eps)
    return a, b - m * a


def fold_conv_bn(conv_p, bn_p, bn_s, eps=_BN_EPS):
    """Fold a following BN into a conv's kernel (HWIO / HWIO-transpose —
    output channels last either way) and bias."""
    a, c = _affine(bn_p, bn_s, eps)
    kernel = np.asarray(conv_p["kernel"], np.float64) * a
    bias = np.asarray(conv_p.get("bias", np.zeros_like(c)), np.float64) * a + c
    return {
        "kernel": kernel.astype(np.float32),
        "bias": bias.astype(np.float32),
    }


def _fold_conv_block(p, s):
    """ConvBlock subtree: ConvBNAct_i -> folded Conv_0."""
    out = {}
    for name, sub in p.items():
        if not name.startswith("ConvBNAct_"):
            raise ValueError(f"unexpected ConvBlock child {name!r}")
        out[name] = {
            "Conv_0": fold_conv_bn(sub["Conv_0"], sub["BatchNorm_0"], s[name]["BatchNorm_0"])
        }
    return out


def _fold_decoder(p, s):
    a, c = _affine(p["BatchNorm_0"], s["BatchNorm_0"])
    out = {
        "ConvTranspose_0": {
            "kernel": np.asarray(p["ConvTranspose_0"]["kernel"], np.float32),
            "bias": np.asarray(p["ConvTranspose_0"]["bias"], np.float32),
        },
        "affine_0_scale": a.astype(np.float32),
        "affine_0_bias": c.astype(np.float32),
    }
    for i in range(2):
        out[f"Conv_{i}"] = fold_conv_bn(
            p[f"Conv_{i}"], p[f"BatchNorm_{i + 1}"], s[f"BatchNorm_{i + 1}"]
        )
    return out


def fold_unet_variables(model, variables):
    """(UNet, {params, batch_stats}) -> (UNet(fold_bn=True), {params}).

    The returned model/params pair produces bit-for-bit the same math as
    eval-mode ``model.apply(variables, x)`` with all BN ops removed.
    """
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    folded = {}
    for name, sub in params.items():
        if name.startswith("EncoderBlock_"):
            folded[name] = {
                "ConvBlock_0": _fold_conv_block(sub["ConvBlock_0"], stats[name]["ConvBlock_0"])
            }
        elif name == "ConvBlock_0":
            folded[name] = _fold_conv_block(sub, stats[name])
        elif name.startswith("DecoderBlock_"):
            folded[name] = _fold_decoder(sub, stats[name])
        elif name == "stem_upsample":
            folded[name] = fold_conv_bn(
                sub, params["stem_upsample_bn"], stats["stem_upsample_bn"]
            )
        elif name == "stem_upsample_bn":
            continue  # consumed by the stem_upsample fold
        elif name == "head":
            folded[name] = jax.tree_util.tree_map(np.asarray, sub)
        else:
            raise ValueError(f"fold_unet_variables: unexpected UNet child {name!r}")

    folded_model = model.clone(fold_bn=True)
    return folded_model, {"params": folded}
