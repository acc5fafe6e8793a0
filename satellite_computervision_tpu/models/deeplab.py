"""DeepLab v3+ with a ResNet backbone.

The reference README names a "Deeplab v3 + pretrained ResNet backbone" for
the parking-lot workload (README.md:8) but ships no builder — the closest
code is the ASPP layer (utils/model_tools.py:533-574). This module fills
that capability gap (BASELINE.json config #2) with a real DeepLab-v3+:

- ResNet-50/101 backbone at output stride 16 (stage 4 dilated 2),
- ASPP with rates (6, 12, 18) + image pooling,
- low-level (C2) decoder fusion, bilinear upsampling to input resolution.

``load_torch_resnet_weights`` maps a torchvision ResNet ``state_dict``
(supplied as a local file — there is no network egress here) onto the
backbone parameters for the "pretrained" part of the reference claim.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from satellite_computervision_tpu.models.blocks import ASPP


class BottleneckBlock(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        def batch_norm(y, name):
            return nn.BatchNorm(
                use_running_average=not train,
                axis_name=self.bn_axis_name if train else None,
                name=name,
                **bn,
            )(y)

        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(batch_norm(y, "bn1"))
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(batch_norm(y, "bn2"))
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = batch_norm(y, "bn3")

        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(residual)
            residual = batch_norm(residual, "downsample_bn")
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """ResNet-{50,101} feature extractor returning (C2, C5) at output
    stride (4, 16)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="stem_bn",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        c2 = None
        # Stage strides/dilations for output stride 16: stage 4 trades its
        # stride for dilation 2.
        plan = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 1, 2)]
        for stage, (feat, stride, dilation) in enumerate(plan):
            for block in range(self.stage_sizes[stage]):
                x = BottleneckBlock(
                    feat,
                    stride=stride if block == 0 else 1,
                    dilation=dilation,
                    dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name,
                    name=f"stage{stage + 1}_block{block}",
                )(x, train)
            if stage == 0:
                c2 = x
        return c2, x


class DeepLabV3Plus(nn.Module):
    n_classes: int
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    aspp_features: int = 256
    aspp_rates: Tuple[int, int, int] = (6, 12, 18)
    head: str = "sigmoid"
    threshold: float = 0.5
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        common = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = jnp.asarray(x, self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]

        c2, c5 = ResNetBackbone(self.stage_sizes, name="backbone", **common)(x, train)
        y = ASPP(
            self.aspp_features,
            rates=self.aspp_rates,
            image_pooling=True,
            name="aspp",
            **common,
        )(c5, train)

        y = jax.image.resize(
            y, (y.shape[0], c2.shape[1], c2.shape[2], y.shape[-1]), method="bilinear"
        )
        low = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype, name="low_proj")(c2)
        low = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="low_bn",
        )(low)
        low = nn.relu(low)

        y = jnp.concatenate([y, low], axis=-1)
        for i in range(2):
            y = nn.Conv(256, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"decoder_conv{i}")(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                axis_name=self.bn_axis_name if train else None,
                name=f"decoder_bn{i}",
            )(y)
            y = nn.relu(y)

        logits = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="head")(y)
        logits = jax.image.resize(
            logits, (logits.shape[0], in_h, in_w, self.n_classes), method="bilinear"
        ).astype(jnp.float32)

        if self.head == "softmax":
            probs = nn.softmax(logits, axis=-1)
            classes = jnp.argmax(probs, -1).astype(jnp.int32)
        else:
            probs = nn.sigmoid(logits)
            classes = (probs > self.threshold).astype(jnp.int32)
        return {"logits": logits, "probs": probs, "classes": classes}


def load_torch_resnet_weights(params, state_dict_path: str, batch_stats=None):
    """Copy a torchvision ResNet state_dict (.pth, loaded on CPU) onto the
    ``backbone`` subtree of a DeepLabV3Plus params/batch_stats pair.

    Maps conv kernels (torch OIHW -> flax HWIO) AND the BatchNorm tensors:
    ``bnX.weight/bias`` -> BN ``scale``/``bias`` in params, and
    ``bnX.running_mean/running_var`` -> ``mean``/``var`` in batch_stats
    (including ``downsample.1`` -> ``downsample_bn``). Without the running
    statistics a "pretrained" backbone would produce numerically wrong
    inference-mode activations.

    Only usable when a weights file is already present locally; returns
    updated ``(params, batch_stats)``. If ``batch_stats`` is None, only
    params are updated and ``(params, None)`` is returned.
    """
    import numpy as np
    import torch  # CPU-only in this image

    sd = torch.load(state_dict_path, map_location="cpu")
    params = jax.tree_util.tree_map(lambda a: a, params)  # structural copy
    if batch_stats is not None:
        batch_stats = jax.tree_util.tree_map(lambda a: a, batch_stats)

    def t_kernel(w):
        return np.transpose(w.numpy(), (2, 3, 1, 0))

    def copy_bn(param_tgt, stats_tgt, flax_name, torch_prefix):
        if f"{torch_prefix}.weight" in sd:
            param_tgt[flax_name]["scale"] = jnp.asarray(sd[f"{torch_prefix}.weight"].numpy())
            param_tgt[flax_name]["bias"] = jnp.asarray(sd[f"{torch_prefix}.bias"].numpy())
        if stats_tgt is not None and f"{torch_prefix}.running_mean" in sd:
            stats_tgt[flax_name]["mean"] = jnp.asarray(
                sd[f"{torch_prefix}.running_mean"].numpy()
            )
            stats_tgt[flax_name]["var"] = jnp.asarray(
                sd[f"{torch_prefix}.running_var"].numpy()
            )

    stage_names = ["layer1", "layer2", "layer3", "layer4"]
    backbone = params["backbone"]
    bb_stats = batch_stats["backbone"] if batch_stats is not None else None
    backbone["stem_conv"]["kernel"] = jnp.asarray(t_kernel(sd["conv1.weight"]))
    copy_bn(backbone, bb_stats, "stem_bn", "bn1")
    for si, layer in enumerate(stage_names):
        block = 0
        while f"{layer}.{block}.conv1.weight" in sd:
            name = f"stage{si + 1}_block{block}"
            tgt = backbone[name]
            stats = bb_stats[name] if bb_stats is not None else None
            for ci in (1, 2, 3):
                tgt[f"conv{ci}"]["kernel"] = jnp.asarray(
                    t_kernel(sd[f"{layer}.{block}.conv{ci}.weight"])
                )
                copy_bn(tgt, stats, f"bn{ci}", f"{layer}.{block}.bn{ci}")
            if f"{layer}.{block}.downsample.0.weight" in sd:
                tgt["downsample_conv"]["kernel"] = jnp.asarray(
                    t_kernel(sd[f"{layer}.{block}.downsample.0.weight"])
                )
                copy_bn(tgt, stats, "downsample_bn", f"{layer}.{block}.downsample.1")
            block += 1
    return params, batch_stats


def export_torch_resnet_weights(params, batch_stats, path: str):
    """Inverse of :func:`load_torch_resnet_weights`: write the ``backbone``
    subtree of a DeepLabV3Plus params/batch_stats pair as a torchvision-
    layout ResNet ``state_dict`` (.pth).

    Two uses: (a) publish a JAX-trained backbone to torch users in the
    format torchvision consumers already load, and (b) the warm-start
    workflow rehearsal — a backbone pretrained here round-trips through
    the exact file format a real torchvision checkpoint arrives in
    (README.md:8's "pretrained ResNet"), so ``scripts/train.py
    --torch-weights`` is exercised end-to-end without egress. Kernel
    layout flax HWIO -> torch OIHW; BN scale/bias -> weight/bias and
    mean/var -> running_mean/running_var (plus ``num_batches_tracked``
    zeros, which real torchvision files carry and the loader tolerates).
    """
    import numpy as np
    import torch  # CPU-only in this image

    def t_kernel(k):
        return torch.from_numpy(
            np.ascontiguousarray(np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1)))
        )

    sd = {}

    def t_vec(v):
        # np.array copy: jax buffers expose non-writable views that
        # torch.from_numpy warns about
        return torch.from_numpy(np.array(v, np.float32))

    def put_bn(param_src, stats_src, flax_name, torch_prefix):
        sd[f"{torch_prefix}.weight"] = t_vec(param_src[flax_name]["scale"])
        sd[f"{torch_prefix}.bias"] = t_vec(param_src[flax_name]["bias"])
        sd[f"{torch_prefix}.running_mean"] = t_vec(stats_src[flax_name]["mean"])
        sd[f"{torch_prefix}.running_var"] = t_vec(stats_src[flax_name]["var"])
        sd[f"{torch_prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)

    backbone = params["backbone"]
    bb_stats = batch_stats["backbone"]
    sd["conv1.weight"] = t_kernel(backbone["stem_conv"]["kernel"])
    put_bn(backbone, bb_stats, "stem_bn", "bn1")
    for si, layer in enumerate(["layer1", "layer2", "layer3", "layer4"]):
        block = 0
        while f"stage{si + 1}_block{block}" in backbone:
            name = f"stage{si + 1}_block{block}"
            src, stats = backbone[name], bb_stats[name]
            for ci in (1, 2, 3):
                sd[f"{layer}.{block}.conv{ci}.weight"] = t_kernel(
                    src[f"conv{ci}"]["kernel"])
                put_bn(src, stats, f"bn{ci}", f"{layer}.{block}.bn{ci}")
            if "downsample_conv" in src:
                sd[f"{layer}.{block}.downsample.0.weight"] = t_kernel(
                    src["downsample_conv"]["kernel"])
                put_bn(src, stats, "downsample_bn", f"{layer}.{block}.downsample.1")
            block += 1
    torch.save(sd, path)
    return sd
