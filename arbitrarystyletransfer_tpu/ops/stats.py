"""Per-channel spatial statistics primitives (NHWC).

TPU-native equivalents of the reference's stat helpers:
  - ``channel_stats``     (reference: model_util.py:3-8)
  - ``calc_mean_std``     (reference: models.py:54-62)
  - ``mean_variance_norm``(reference: models.py:64-68)
  - instance norm as used by ``nn.InstanceNorm2d`` (reference: models.py:78-80)

The two stat flavors intentionally differ, exactly as in the reference:
``channel_stats`` uses the unbiased (ddof=1) std with no epsilon, while
``calc_mean_std`` adds eps=1e-5 to the unbiased variance before the sqrt.
Both must be preserved as-is for loss parity (SURVEY.md §7 "hard parts").

All functions take NHWC arrays and reduce over the spatial axes (1, 2).
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero (not NaN) gradient at x <= 0.

    Forward-identical to ``sqrt(max(x, 0))``.  ``sqrt`` has an infinite
    derivative at 0; a degenerate input (e.g. a dead-ReLU constant channel
    with zero variance) would otherwise poison the whole gradient with NaNs.
    The double-``where`` keeps the backward pass clean without shifting the
    forward value by an epsilon.
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def channel_stats(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(N, C) spatial mean and unbiased std, keepdims.

    Equivalent of reference model_util.py:3-8 (torch ``.mean``/``.std`` over
    dims (2,3); torch ``.std`` defaults to the unbiased estimator).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    n = x.shape[1] * x.shape[2]
    var = jnp.sum(jnp.square(x - mean), axis=(1, 2), keepdims=True) / (n - 1)
    std = safe_sqrt(var)
    return mean, std


def calc_mean_std(x: jnp.ndarray, eps: float = 1e-5) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(N, C) spatial mean and eps-stabilized unbiased std, keepdims.

    Equivalent of reference models.py:54-62 (``var(dim=2) + eps`` then sqrt;
    torch ``.var`` defaults to unbiased).
    """
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True, ddof=1)
    std = jnp.sqrt(var + eps)
    return mean, std


def mean_variance_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize to zero mean / unit std per (N, C) over spatial dims.

    Equivalent of reference models.py:64-68.
    """
    mean, std = calc_mean_std(x)
    return (x - mean) / std


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Non-affine instance normalization over spatial dims (NHWC).

    Matches torch ``nn.InstanceNorm2d`` defaults (affine=False, eps=1e-5,
    biased variance) used inside AdaAttN (reference: models.py:78-80, 87-88,
    115).  Statistics are always computed in float32.
    """
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)  # biased, like InstanceNorm2d
    return (x - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
