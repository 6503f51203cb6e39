"""Stage-1 pretraining autoencoder (reference: models.py:322-338).

Encoder -> concat of the two tapped 128-channel maps (256 channels) ->
``ada_out`` DepthWiseConv(256->128) bottleneck fuse -> Decoder.  The trained
encoder/ada_out/decoder parameters warm-start the AST model
(reference: train.py:135-144).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.blocks import DepthWiseConv
from .decoder import Decoder
from .encoder import Encoder


class AutoEncoder(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        # 256 -> 128 bottleneck fuse (reference models.py:326).
        self.ada_out = DepthWiseConv(
            self.cfg.enc_out_channels * 2,
            self.cfg.enc_out_channels,
            1,
            self.cfg.expand_ratio,
            use_norm=False,
            use_identity=False,
            dtype=self.cfg.jnp_compute_dtype(),
            dw_impl=self.cfg.depthwise_impl,
        )
        self.decoder = Decoder(self.cfg)

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        taps = self.encoder(
            x, out_layers=self.cfg.enc_out_layers, train=train,
            use_batch_stats=None if train else not self.cfg.encoder_eval_stats,
        )
        fused = self.ada_out(jnp.concatenate(taps, axis=-1), train=False)
        return self.decoder(fused)

    def encode_latent(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Final-block latent (reference Encoder auto_enc=True path,
        models.py:168-171; used by get_distr/interpolate,
        train_autoencoder.py:150-179)."""
        return self.encoder(
            x, auto_enc=True, train=train,
            use_batch_stats=None if train else not self.cfg.encoder_eval_stats,
        )

    def decode_latent(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)
