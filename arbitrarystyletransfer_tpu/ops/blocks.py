"""Conv building blocks (NHWC, flax.linen).

TPU-native equivalents of the reference's MobileNetV2-style blocks
(reference: mobilenetv2.py).  Everything is NHWC — the TPU-native conv
layout — and expressed as pure flax modules so the whole model is a pytree
of parameters usable under jit/pjit.

Blocks implemented (reference locations):
  - ``make_divisible``   (mobilenetv2.py:18-35)
  - ``hard_swish`` / ``h_sigmoid`` (mobilenetv2.py:55-61)
  - ``ConvStem``  = conv_3x3_bn: reflect-padded 3x3 conv + Hardswish, and —
    despite the reference name — *no* BatchNorm (mobilenetv2.py:38-43, the
    BN line is commented out there).
  - ``SELayer``   squeeze-and-excitation with a Hardtanh(0,1) gate
    (mobilenetv2.py:63-81)
  - ``DepthWiseConv`` the workhorse inverted-residual block with SE, both
    expand paths, reflect padding, and the use_norm/use_identity switches
    (mobilenetv2.py:95-181)
  - ``InvertedResidual`` vanilla MobileNetV2 block (mobilenetv2.py:183-221)

Initialization follows the reference's He-normal scheme
(mobilenetv2.py:168-181): conv kernels ~ N(0, sqrt(2/(k*k*c_out))), linear
weights ~ N(0, 0.01), zero biases, BN scale 1 / bias 0.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def make_divisible(v: float, divisor: int, min_value: int | None = None) -> int:
    """Round channel count to a multiple of ``divisor`` (mobilenetv2.py:18-35)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * relu6(x + 3) / 6 — torch nn.Hardswish."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def h_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 6 (mobilenetv2.py:55-61)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def hardtanh01(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Hardtanh(0.0, 1.0)."""
    return jnp.clip(x, 0.0, 1.0)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection-pad the spatial dims of an NHWC tensor."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def he_normal_ref(kernel_size: int, c_out: int):
    """Reference init: N(0, sqrt(2 / (k*k*c_out))) (mobilenetv2.py:171-173)."""
    std = math.sqrt(2.0 / (kernel_size * kernel_size * c_out))
    return nn.initializers.normal(stddev=std)


_linear_init = nn.initializers.normal(stddev=0.01)  # mobilenetv2.py:179-181


class DepthwiseConv2D(nn.Module):
    """Depthwise kxk conv over a pre-padded NHWC input, two lowering
    strategies:

      * ``impl="conv"``: XLA grouped convolution.
      * ``impl="shifts"``: unrolled sum of k^2 shifted elementwise
        multiplies — pure VPU work that XLA fuses with surrounding
        elementwise ops (no grouped-conv materialization boundary).  On
        high-resolution, low-channel tensors (the decoder tail) the conv's
        lane padding (C -> 128) makes bandwidth the bottleneck, and fusion
        wins.

    Both strategies share one parameter layout (torch/flax HWIO (k,k,1,C)),
    so the choice is a runtime/config concern, not a checkpoint concern.
    """

    ch: int
    kernel_size: int
    stride: int = 1
    impl: str = "conv"
    dtype: Any = None

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kernel = self.param(
            "kernel", he_normal_ref(k, self.ch), (k, k, 1, self.ch)
        )
        dtype = self.dtype or xp.dtype
        xp = xp.astype(dtype)
        kernel = kernel.astype(dtype)
        if self.impl == "shifts":
            # Any stride: strided slices select each tap's window directly.
            s = self.stride
            out_h = (xp.shape[1] - k) // s + 1
            out_w = (xp.shape[2] - k) // s + 1
            acc = None
            for di in range(k):
                for dj in range(k):
                    window = jax.lax.slice(
                        xp,
                        (0, di, dj, 0),
                        (
                            xp.shape[0],
                            di + (out_h - 1) * s + 1,
                            dj + (out_w - 1) * s + 1,
                            self.ch,
                        ),
                        (1, s, s, 1),
                    )
                    term = window * kernel[di, dj, 0]
                    acc = term if acc is None else acc + term
            return acc
        return jax.lax.conv_general_dilated(
            xp, kernel,
            (self.stride, self.stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.ch,
        )


class ConvStem(nn.Module):
    """conv_3x3_bn: reflect-pad 3x3 conv (no bias, no norm) + Hardswish.

    Reference: mobilenetv2.py:38-43 (BatchNorm commented out at HEAD).
    """

    c_out: int
    stride: int = 1
    dtype: Any = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = reflect_pad(x, 1)
        x = nn.Conv(
            self.c_out,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=False,
            kernel_init=he_normal_ref(3, self.c_out),
            dtype=self.dtype,
        )(x)
        return hard_swish(x)


class SELayer(nn.Module):
    """Squeeze-and-excitation with a Hardtanh(0,1) gate.

    Reference: mobilenetv2.py:63-81 — global avg-pool, Linear down to
    make_divisible(c//reduction, 8), ReLU, Linear up, Hardtanh(0,1),
    channelwise multiply.
    """

    channel: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = make_divisible(self.channel // self.reduction, 8)
        # Squeeze reduction in float32 for stable statistics.
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        y = nn.Dense(hidden, kernel_init=_linear_init, dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channel, kernel_init=_linear_init, dtype=self.dtype)(y)
        y = hardtanh01(y)
        return x * y[:, None, None, :]


class DepthWiseConv(nn.Module):
    """MobileNetV2 inverted-residual block with SE (the workhorse block).

    Reference: mobilenetv2.py:95-181.  Two paths:
      expand_ratio == 1:  reflect-pad -> depthwise kxk -> [BN] -> Hardswish
                          -> SE -> pointwise 1x1 -> [BN]
      expand_ratio  > 1:  pointwise expand 1x1 -> [BN] -> Hardswish ->
                          reflect-padded depthwise kxk (stride s) -> [BN] ->
                          Hardswish -> SE -> pointwise project 1x1 -> [BN]
    Residual identity add iff stride==1 and c_in==c_out and use_identity
    (mobilenetv2.py:99,161-162).  ``use_norm`` toggles every BatchNorm
    (True in the encoder, False in the decoder).
    """

    c_in: int
    c_out: int
    stride: int = 1
    expand_ratio: float = 1
    kernel_size: int = 3
    use_norm: bool = False
    use_identity: bool = True
    dtype: Any = None
    dw_impl: str = "conv"  # depthwise lowering, see DepthwiseConv2D

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        use_batch_stats: bool | None = None,
    ) -> jnp.ndarray:
        """``train`` gates running-stat updates; ``use_batch_stats`` picks the
        BN normalizer (defaults to ``train``, i.e. torch semantics).  See
        ops/norm.py for why they are decoupled."""
        from .norm import BatchNorm2D

        hidden = round(self.c_in * self.expand_ratio)
        identity = (
            self.stride == 1 and self.c_in == self.c_out and self.use_identity
        )
        org_x = x
        ubs = self.use_batch_stats_default(train, use_batch_stats)

        def bn(h):
            # torch BatchNorm2d defaults: momentum 0.1, eps 1e-5.
            return BatchNorm2D()(h, use_batch_stats=ubs, update_stats=train)

        def dw_conv(h, ch):
            h = reflect_pad(h, (k - 1) // 2)
            return DepthwiseConv2D(
                ch, k, self.stride, impl=self.dw_impl, dtype=self.dtype
            )(h)

        def pw_conv(h, ch):
            return nn.Conv(
                ch,
                (1, 1),
                use_bias=False,
                kernel_init=he_normal_ref(1, ch),
                dtype=self.dtype,
            )(h)

        k = self.kernel_size
        if self.expand_ratio == 1:
            # dw: the reference reflect-pads by 1 explicitly (its expand==1
            # path is only ever instantiated with kernel_size=3);
            # reflect padding on both paths (mobilenetv2.py:105,135).
            x = dw_conv(x, hidden)
            if self.use_norm:
                x = bn(x)
            x = hard_swish(x)
            x = SELayer(hidden, dtype=self.dtype)(x)
            x = pw_conv(x, self.c_out)  # pw-linear
            if self.use_norm:
                x = bn(x)
        else:
            x = pw_conv(x, hidden)  # pw expand
            if self.use_norm:
                x = bn(x)
            x = hard_swish(x)
            x = dw_conv(x, hidden)
            if self.use_norm:
                x = bn(x)
            x = hard_swish(x)
            x = SELayer(hidden, dtype=self.dtype)(x)
            x = pw_conv(x, self.c_out)  # pw-linear project
            if self.use_norm:
                x = bn(x)

        if identity:
            x = x + org_x.astype(x.dtype)
        return x

    @staticmethod
    def use_batch_stats_default(train: bool, use_batch_stats: bool | None) -> bool:
        return train if use_batch_stats is None else use_batch_stats


class Reshape(nn.Module):
    """Learned pos-enc + raw channel-to-space x2 reshape (vestigial).

    Reference: mobilenetv2.py:83-93 — unused there (only referenced from
    commented code at mobilenetv2.py:129-132) but part of the capability
    surface.  The reference adds a learned (1, 4C, 1, 1) positional
    encoding and then does a *raw row-major view* of the NCHW tensor
    (B, 4C, H, W) -> (B, C, 2H, 2W) — NOT a pixel shuffle: each group of 4
    input planes is flattened end-to-end into one double-size plane.  This
    reproduces that exact element mapping from NHWC by round-tripping
    through the NCHW order.
    """

    num_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c4 = x.shape
        assert c4 == self.num_channels * 4, (c4, self.num_channels)
        pos_enc = self.param(
            "pos_enc", nn.initializers.normal(stddev=1.0), (c4,)
        )
        x = x + pos_enc
        x = x.transpose(0, 3, 1, 2)  # -> NCHW
        x = x.reshape(b, self.num_channels, h * 2, w * 2)
        return x.transpose(0, 2, 3, 1)  # -> NHWC


class InvertedResidual(nn.Module):
    """Vanilla MobileNetV2 block: BN always on, no SE, Hardswish.

    Used only by the MobileNetV2 classifier / Discriminator
    (reference: mobilenetv2.py:183-221).  ``norm`` selects "batch" or
    "instance" so the Discriminator's norm swaps (models.py:374-375) are
    expressible.
    """

    c_in: int
    c_out: int
    stride: int
    expand_ratio: float

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        use_batch_stats: bool | None = None,
    ) -> jnp.ndarray:
        from .norm import BatchNorm2D

        assert self.stride in (1, 2)
        hidden = round(self.c_in * self.expand_ratio)
        identity = self.stride == 1 and self.c_in == self.c_out
        org_x = x
        ubs = DepthWiseConv.use_batch_stats_default(train, use_batch_stats)

        def bn(h):
            return BatchNorm2D()(h, use_batch_stats=ubs, update_stats=train)

        if self.expand_ratio != 1:
            x = nn.Conv(
                hidden, (1, 1), use_bias=False,
                kernel_init=he_normal_ref(1, hidden),
            )(x)
            x = bn(x)
            x = hard_swish(x)
        # dw (zero padding, like the reference's plain Conv2d padding=1)
        x = nn.Conv(
            hidden,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            feature_group_count=hidden,
            use_bias=False,
            kernel_init=he_normal_ref(3, hidden),
        )(x)
        x = bn(x)
        x = hard_swish(x)
        # pw-linear
        x = nn.Conv(
            self.c_out, (1, 1), use_bias=False,
            kernel_init=he_normal_ref(1, self.c_out),
        )(x)
        x = bn(x)

        if identity:
            x = x + org_x
        return x
