"""Siamese U-Net with ASPP for change detection.

Reference: get_siamese_layers / make_siamese_unet
(utils/model_tools.py:576-663). A weight-shared encoder tower runs over the
before/after images; each level's skip is concat([enc_before, enc_after]);
a shared ASPP processes both bottlenecks whose outputs concatenate into the
decoder input; sigmoid head emits change probability.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from satellite_computervision_tpu.models.blocks import ASPP, DecoderBlock, EncoderBlock


class SiameseUNet(nn.Module):
    filters: Sequence[int] = (32, 64, 128)
    factors: Sequence[int] = (2, 2, 2)
    threshold: float = 0.5
    output_bias: Optional[float] = None
    # 2 = the documented reference intent; 1 = the shipped architecture
    # (conv_block double-call bug) — required for Keras .h5 import
    convs_per_block: int = 2
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, before, after, train: bool = False):
        if len(self.filters) != len(self.factors):
            raise ValueError("filters and factors must be the same length")
        common = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        a = jnp.asarray(after, self.dtype)
        b = jnp.asarray(before, self.dtype)

        skips = []
        for i, (feat, factor) in enumerate(zip(self.filters, self.factors)):
            encoder = EncoderBlock(
                feat, pool=(factor, factor), n_convs=self.convs_per_block,
                name=f"encoder_{i}", **common,
            )
            # One module instance applied to both towers = shared weights
            # (the reference reuses one Keras encoder_block the same way,
            # utils/model_tools.py:605-614).
            a, skip_a = encoder(a, train)
            b, skip_b = encoder(b, train)
            skips.append(jnp.concatenate([skip_b, skip_a], axis=-1))

        aspp = ASPP(self.filters[-1] * 2, name="aspp", **common)
        aspp_a = aspp(a, train)
        aspp_b = aspp(b, train)
        x = jnp.concatenate([aspp_b, aspp_a], axis=-1)

        for feat, factor, skip in zip(
            reversed(self.filters), reversed(self.factors), reversed(skips)
        ):
            x = DecoderBlock(feat, up=(factor, factor), **common)(x, skip, train)

        bias_init = (
            nn.initializers.constant(self.output_bias)
            if self.output_bias is not None
            else nn.initializers.zeros_init()
        )
        logits = nn.Conv(1, (1, 1), bias_init=bias_init, dtype=self.dtype, name="head")(x)
        logits = logits.astype(jnp.float32)
        probs = nn.sigmoid(logits)
        classes = (probs > self.threshold).astype(jnp.int32)
        return {"logits": logits, "probs": probs, "classes": classes}
