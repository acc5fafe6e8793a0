"""DeepLab torch-weight mapping against a synthetic torchvision state_dict."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from satellite_computervision_tpu.models import DeepLabV3Plus
from satellite_computervision_tpu.models.deeplab import load_torch_resnet_weights


def _synthetic_resnet_state_dict(stage_sizes=(1, 1, 1, 1)):
    """Minimal torchvision-shaped ResNet state_dict (conv weights only)."""
    g = torch.Generator().manual_seed(0)
    sd = {"conv1.weight": torch.randn(64, 3, 7, 7, generator=g)}
    in_ch = 64
    for si, (layer, blocks) in enumerate(zip(["layer1", "layer2", "layer3", "layer4"], stage_sizes)):
        feat = 64 * (2**si)
        for b in range(blocks):
            sd[f"{layer}.{b}.conv1.weight"] = torch.randn(feat, in_ch, 1, 1, generator=g)
            sd[f"{layer}.{b}.conv2.weight"] = torch.randn(feat, feat, 3, 3, generator=g)
            sd[f"{layer}.{b}.conv3.weight"] = torch.randn(feat * 4, feat, 1, 1, generator=g)
            if b == 0:
                sd[f"{layer}.{b}.downsample.0.weight"] = torch.randn(
                    feat * 4, in_ch, 1, 1, generator=g
                )
            in_ch = feat * 4
    return sd


def test_torch_resnet_weight_mapping(tmp_path):
    model = DeepLabV3Plus(n_classes=1, stage_sizes=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    params = jax.device_get(variables["params"])

    sd = _synthetic_resnet_state_dict()
    path = str(tmp_path / "resnet.pth")
    torch.save(sd, path)

    loaded = load_torch_resnet_weights(params, path)

    # stem kernel transposed OIHW -> HWIO
    want_stem = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stem_conv"]["kernel"]), want_stem, rtol=1e-6
    )
    # a mid-stage conv and a downsample projection land in the right slots
    want_c2 = sd["layer3.0.conv2.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stage3_block0"]["conv2"]["kernel"]), want_c2, rtol=1e-6
    )
    want_ds = sd["layer4.0.downsample.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["backbone"]["stage4_block0"]["downsample_conv"]["kernel"]),
        want_ds, rtol=1e-6,
    )

    # the model still applies with loaded weights
    out = model.apply({"params": loaded, "batch_stats": variables["batch_stats"]}, x)
    assert out["probs"].shape == (1, 64, 64, 1)
