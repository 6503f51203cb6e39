"""MobileNetV2 classifier + Discriminator (NHWC, flax).

TPU-native equivalents of the reference's full MobileNetV2 classifier
(reference: mobilenetv2.py:226-314) and the GAN Discriminator built on it
(reference: models.py:368-388).  The discriminator is disabled in the
reference's training loop at HEAD (train.py:63-64,160-188) but is part of the
capability surface (SURVEY.md §2.2), so both are implemented and tested.

Faithful quirks preserved:
  * the stem is the reference's ``conv_3x3_bn`` which — despite the name —
    has no BatchNorm (mobilenetv2.py:38-43);
  * the Discriminator replaces the stem's *Hardswish* (index [1] of the
    2-element stem Sequential) with InstanceNorm2d(32), and the head's BN
    with InstanceNorm (models.py:374-375);
  * head = 1x1 conv + BN + Dropout(0.2) + Hardswish (conv_1x1_bn,
    mobilenetv2.py:46-53), global average pool, Linear classifier.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.blocks import (
    ConvStem,
    InvertedResidual,
    hard_swish,
    he_normal_ref,
    make_divisible,
)
from ..ops.stats import instance_norm

# (t, c, n, s) inverted-residual settings (mobilenetv2.py:230-239).
_MOBILENETV2_CFGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    """Full classifier (reference: mobilenetv2.py:226-314).

    ``stem_instance_norm`` / ``head_instance_norm`` express the
    Discriminator's norm swaps (reference models.py:374-375): when
    ``stem_instance_norm`` is set, the stem's Hardswish is *replaced* by a
    non-affine InstanceNorm (that is literally what the reference's
    ``features[0][1] = InstanceNorm2d(32)`` does to the [conv, hardswish]
    Sequential).
    """

    num_classes: int = 1000
    width_mult: float = 1.0
    stem_instance_norm: bool = False
    head_instance_norm: bool = False
    extra_feature_dropout: bool = False
    # Reference rate is 0.2 (conv_1x1_bn, mobilenetv2.py:46-53); 0.0 gives a
    # deterministic forward for torch-fidelity tests.
    dropout_rate: float = 0.2

    def setup(self):
        divisor = 4 if self.width_mult == 0.1 else 8
        input_channel = make_divisible(32 * self.width_mult, divisor)
        blocks = []
        self._stem_channels = input_channel
        for t, c, n, s in _MOBILENETV2_CFGS:
            output_channel = make_divisible(c * self.width_mult, divisor)
            for i in range(n):
                blocks.append(
                    InvertedResidual(
                        input_channel, output_channel, s if i == 0 else 1, t
                    )
                )
                input_channel = output_channel
        self.blocks = blocks
        self._last_channel = (
            make_divisible(1280 * self.width_mult, divisor)
            if self.width_mult > 1.0
            else 1280
        )
        self.stem_conv = nn.Conv(
            self._stem_channels, (3, 3), strides=(2, 2),
            padding="VALID", use_bias=False,
            kernel_init=he_normal_ref(3, self._stem_channels),
        )
        self.head_conv = nn.Conv(
            self._last_channel, (1, 1), use_bias=False,
            kernel_init=he_normal_ref(1, self._last_channel),
        )
        from ..ops.norm import BatchNorm2D

        self.head_bn = BatchNorm2D()
        self.classifier = nn.Dense(
            self.num_classes, kernel_init=nn.initializers.normal(stddev=0.01)
        )
        self.feature_dropout = nn.Dropout(self.dropout_rate)
        self.head_dropout = nn.Dropout(self.dropout_rate)

    def _stem(self, x, train):
        # conv_3x3_bn stem: reflect pad + stride-2 conv + Hardswish
        # (mobilenetv2.py:38-43,244); Discriminator swaps the Hardswish for
        # InstanceNorm (models.py:374).
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = self.stem_conv(x)
        if self.stem_instance_norm:
            x = instance_norm(x)
        else:
            x = hard_swish(x)
        return x

    def features(self, x, out_layers: Sequence[int] = (), train: bool = True):
        """Tapped feature maps (reference forward, mobilenetv2.py:261-290).

        Layer index 0 is the stem, 1..17 the inverted-residual blocks,
        matching the reference's ``features`` ModuleList indexing.
        """
        outs = []
        x = self._stem(x, train)
        if 0 in out_layers:
            outs.append(x)
        for i, block in enumerate(self.blocks):
            x = block(x, train=train)
            if (i + 1) in out_layers:
                outs.append(x)
        return outs, x

    def __call__(self, x, out_layers: Sequence[int] = (), train: bool = True):
        outs, _ = self.features(x, out_layers, train)
        return outs

    def predict_class(self, x, train: bool = True, dropout_rng=None):
        """Full classification head (reference: mobilenetv2.py:292-300)."""
        _, x = self.features(x, (), train)
        if self.extra_feature_dropout:
            # Discriminator appends Dropout(0.2) to features (models.py:377).
            x = self.feature_dropout(x, deterministic=not train)
        x = self.head_conv(x)
        if self.head_instance_norm:
            x = instance_norm(x)
        else:
            x = self.head_bn(x, use_batch_stats=train, update_stats=train)
        x = self.head_dropout(x, deterministic=not train)
        x = hard_swish(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return self.classifier(x)


class Discriminator(nn.Module):
    """MobileNetV2(num_classes=1) discriminator with instance-norm swaps and
    sigmoid output (reference: models.py:368-388)."""

    dropout_rate: float = 0.2

    def setup(self):
        self.mobnet = MobileNetV2(
            num_classes=1,
            stem_instance_norm=True,
            head_instance_norm=True,
            extra_feature_dropout=True,
            dropout_rate=self.dropout_rate,
        )

    def __call__(self, x, train: bool = True):
        logits = self.mobnet.predict_class(x, train=train)
        return nn.sigmoid(logits)
