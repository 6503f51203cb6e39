"""Mirrored upsampling decoder (NHWC, flax).

TPU-native equivalent of the reference Decoder (reference: models.py:242-320):
14 DecoderBlocks built from decoder_conv_shapes[:-1] — DepthWiseConv blocks
with *no* BatchNorm — upsampling (nearest x2 followed by a smoothing
DepthWiseConv) exactly where channel width changes within the first 9 blocks
(reference condition ``c_in != c_out and i + 6 < len(shapes)``,
models.py:284), i.e. blocks 2 (128->96), 4 (96->80), 7 (80->40) for a total
x8 upsample mirroring the encoder.  Output head: reflect-pad + 3x3 conv to
RGB; the Hardtanh(0,1) clamp is applied only when ``exporting`` —
during training the output is unclamped and an out-of-range penalty in the
loss handles it (reference: models.py:304,315-316; train.py:259).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.blocks import DepthWiseConv, reflect_pad


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 spatial upsample of an NHWC tensor.

    Implemented as two axis repeats — exactly nearest x2, and cheaper for XLA
    to fuse than a general-purpose resize.
    """
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class DecoderBlock(nn.Module):
    """One decoder block (reference: models.py:242-272)."""

    c_in: int
    c_out: int
    stride: int
    kernel_size: int = 3
    upsample: bool = False
    expand_ratio: int = 6
    dtype: object = None
    dw_impl: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = DepthWiseConv(
            self.c_in, self.c_out, self.stride, self.expand_ratio,
            kernel_size=self.kernel_size, use_norm=False, dtype=self.dtype,
            dw_impl=self.dw_impl,
        )(x, train=False)
        if self.upsample:
            x = nearest_upsample_2x(x)
            # Smoothing conv after the nearest upsample (models.py:253).
            x = DepthWiseConv(
                self.c_out, self.c_out, 1, 1, use_norm=False,
                dtype=self.dtype, dw_impl=self.dw_impl,
            )(x, train=False)
        return x


class Decoder(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        shapes = self.cfg.decoder_conv_shapes
        dtype = self.cfg.jnp_compute_dtype()
        blocks = []
        for i, shape in enumerate(shapes[:-1]):
            should_upsample = shape[0] != shape[1] and i + 6 < len(shapes)
            blocks.append(
                DecoderBlock(
                    shape[0], shape[1], shape[2],
                    kernel_size=shape[3],
                    expand_ratio=shape[4],
                    upsample=should_upsample,
                    dtype=dtype,
                    dw_impl=self.cfg.depthwise_impl,
                )
            )
        self.decoder_blocks = blocks
        # Image-output conv (reference models.py:300-301): 3x3, with bias.
        self.img_out = nn.Conv(shapes[-1][1], (3, 3), padding="VALID", dtype=dtype)

    def __call__(self, x: jnp.ndarray, exporting: bool = False) -> jnp.ndarray:
        for block in self.decoder_blocks:
            x = block(x)
        x = reflect_pad(x, 1)
        x = self.img_out(x).astype(jnp.float32)  # image space back in f32
        if exporting:
            x = jnp.clip(x, 0.0, 1.0)  # Hardtanh(0,1), export only
        return x
