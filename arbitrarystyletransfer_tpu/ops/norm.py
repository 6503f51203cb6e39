"""BatchNorm with decoupled stat-source and stat-update control.

torch ``nn.BatchNorm2d`` (the reference's norm, mobilenetv2.py:108 etc.)
couples three things to train/eval mode: which statistics normalize (batch
vs running), whether running stats update, and nothing else.  The AST
training step needs them decoupled (SURVEY.md §2.2 encode semantics +
robustness):

  * training passes: normalize by batch stats, update running stats;
  * the detached encode / inference passes: EITHER running averages
    (reference parity — ``encoder_eval_stats=True``) OR batch statistics
    without updating (robust default — see ModelConfig.encoder_eval_stats
    for why running averages can amplify dead channels into overflow).

``use_batch_stats`` picks the normalizer; ``update_stats`` gates the
running-average write (only effective when the 'batch_stats' collection is
mutable in the enclosing apply).  Semantics match torch: biased variance
normalizes, the *unbiased* batch variance feeds the running average,
momentum 0.1 (torch convention: new = (1-m)*old + m*batch).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class BatchNorm2D(nn.Module):
    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        use_batch_stats: bool,
        update_stats: bool,
    ) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # statistics and normalization in f32
        if use_batch_stats:
            mean = jnp.mean(x, axis=(0, 1, 2))
            var = jnp.var(x, axis=(0, 1, 2))  # biased, normalizes
            if update_stats and not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * jax.lax.stop_gradient(mean)
                ra_var.value = (1 - m) * ra_var.value + m * jax.lax.stop_gradient(unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        return ((x - mean) * inv * scale + bias).astype(in_dtype)
