"""AdaAttN: attention-weighted adaptive instance normalization (NHWC).

TPU-native equivalent of the reference's core stylization op
(reference: models.py:70-115):

  q = W_q(IN(content)), k = W_k(IN(style)), v = W_v(style)   [1x1 convs]
  A = softmax(q k^T)            (no 1/sqrt(d) scaling — match the reference)
  mean = A v
  std  = sqrt(relu(A v^2 - mean^2))
  out  = std * IN(content) + mean

The attention is over HW_content x HW_style spatial positions at 1/8
resolution — the memory hot spot at large image sizes (SURVEY.md §5).  Two
compute paths:

  * ``use_pallas=False``: plain einsum chain.  XLA maps the three matmuls to
    the MXU but materializes the (HW_c, HW_s) attention matrix in HBM.
  * ``use_pallas=True``: a fused flash-style Pallas kernel that streams over
    style positions computing the softmax normalizer, A·v and A·v^2 in one
    pass — O(HW_c * C) memory instead of O(HW_c * HW_s).  The first and
    second value moments are concatenated channel-wise so a single MXU
    matmul per tile produces both reductions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stats import instance_norm, safe_sqrt


def adaattn_statistics(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Attention-weighted per-position style mean/std.

    Args:
      q: (B, Nc, C) queries from the (instance-normed) content map.
      k: (B, Ns, C) keys from the (instance-normed) style map.
      v: (B, Ns, C) values from the raw style map.

    Returns:
      (mean, std), each (B, Nc, C).

    Reference math: models.py:92-103.  Note: unscaled logits (the reference
    applies softmax directly to q k^T).
    """
    logits = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1)
    # Concatenate v and v^2 so one matmul yields both weighted moments.
    # v is squared in f32 (bf16 squaring would lose half the mantissa).
    v = v.astype(jnp.float32)
    v_cat = jnp.concatenate([v, jnp.square(v)], axis=-1)  # (B, Ns, 2C)
    moments = jnp.einsum(
        "bnm,bmc->bnc", attn, v_cat, preferred_element_type=jnp.float32
    )
    c = v.shape[-1]
    mean = moments[..., :c]
    ev2 = moments[..., c:]
    # sqrt(relu(.)) like the reference, but with a zero gradient at the
    # clipped region (torch would emit NaN there; see stats.safe_sqrt).
    std = safe_sqrt(ev2 - jnp.square(mean))
    return mean, std


class AdaAttN(nn.Module):
    """Attention-based adaptive instance norm (reference: models.py:70-115)."""

    inp_size: int
    use_pallas: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, content_map: jnp.ndarray, style_map: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = content_map.shape
        _, sh, sw, _ = style_map.shape
        assert c == self.inp_size

        normed_content = instance_norm(content_map)
        q = nn.Conv(
            self.inp_size, (1, 1), use_bias=False, name="W_q", dtype=self.dtype
        )(normed_content)
        k = nn.Conv(
            self.inp_size, (1, 1), use_bias=False, name="W_k", dtype=self.dtype
        )(instance_norm(style_map))
        v = nn.Conv(
            self.inp_size, (1, 1), use_bias=False, name="W_v", dtype=self.dtype
        )(style_map)

        q = q.reshape(b, h * w, c)
        k = k.reshape(b, sh * sw, c)
        v = v.reshape(b, sh * sw, c)

        if self.use_pallas:
            from ..ops.pallas.adaattn_kernel import adaattn_statistics_pallas

            mean, std = adaattn_statistics_pallas(q, k, v)
        else:
            mean, std = adaattn_statistics(q, k, v)

        mean = mean.reshape(b, h, w, c)
        std = std.reshape(b, h, w, c)
        return std * normed_content + mean


class AdaIN(nn.Module):
    """Classic adaptive instance normalization (reference: models.py:37-51).

    Unused in the reference's active forward path but part of the capability
    surface.  The reference has a latent unpack-order bug at models.py:44
    (``style_std, style_mean = channel_stats(...)`` against a (mean, std)
    return); this implements the *intended* semantics (SURVEY.md defect 3).
    """

    @nn.compact
    def __call__(self, content_map: jnp.ndarray, style_map: jnp.ndarray) -> jnp.ndarray:
        from ..ops.stats import channel_stats

        style_mean, style_std = channel_stats(style_map)
        content_mean, content_std = channel_stats(content_map)
        normalized = (content_map - content_mean) / content_std
        return normalized * style_std + style_mean
