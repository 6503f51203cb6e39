"""Trainable lightweight encoder (NHWC, flax).

TPU-native equivalent of the reference Encoder (reference: models.py:140-184):
15 blocks — a reflect-padded conv stem followed by 14 MobileNetV2-style
inverted-residual DepthWiseConv blocks with BatchNorm — with stride-2 at
blocks 2, 4 and 7 for a total x8 downsample.  Feature taps are taken at the
block indices in ``out_layers`` (normally (12, 14), both 128-channel maps at
1/8 resolution).

The reference constructs its final block from leftover loop variables
(models.py:154), which resolves to DepthWiseConv(128,128,1,EXPAND_RATIO=3,k=3)
— coincidentally the intended last shape-table row; here the last row is used
directly with expand_ratio=cfg.expand_ratio and kernel 3 (SURVEY.md defect 6).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.blocks import ConvStem, DepthWiseConv


class Encoder(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        shapes = self.cfg.enc_conv_shapes
        dtype = self.cfg.jnp_compute_dtype()
        dw_impl = self.cfg.depthwise_impl
        blocks = [ConvStem(shapes[0][1], stride=shapes[0][2], dtype=dtype)]
        for c_in, c_out, stride, k, t in shapes[1:-1]:
            blocks.append(
                DepthWiseConv(
                    c_in, c_out, stride, t, kernel_size=k, use_norm=True,
                    dtype=dtype, dw_impl=dw_impl,
                )
            )
        # Final block (reference models.py:154; see module docstring).
        c_in, c_out, stride, _, _ = shapes[-1]
        blocks.append(
            DepthWiseConv(
                c_in, c_out, stride, self.cfg.expand_ratio,
                kernel_size=3, use_norm=True, dtype=dtype, dw_impl=dw_impl,
            )
        )
        self.mob_net = blocks

    def __call__(
        self,
        x: jnp.ndarray,
        out_layers: Sequence[int] = (),
        auto_enc: bool = False,
        train: bool = True,
        use_batch_stats: bool | None = None,
    ):
        """Run the block stack (reference: models.py:158-184).

        Args:
          x: NHWC image batch in [0, 1].
          out_layers: block indices whose outputs to return.
          auto_enc: if True, return only the final feature map.
          train: gates BatchNorm running-stat updates.
          use_batch_stats: BN normalizer override (None = follow ``train``);
            see ops/norm.py.
        """
        if auto_enc:
            for block in self.mob_net:
                x = _apply(block, x, train, use_batch_stats)
            return x
        outs = []
        for i, block in enumerate(self.mob_net):
            x = _apply(block, x, train, use_batch_stats)
            if i in out_layers:
                outs.append(x)
        return outs


def _apply(block, x, train, use_batch_stats):
    if isinstance(block, DepthWiseConv):
        return block(x, train=train, use_batch_stats=use_batch_stats)
    return block(x)
