"""Differentiable sRGB <-> CIELAB color conversions (NHWC).

TPU-native equivalent of the reference's color utilities
(reference: model_util.py:13-140).  Vestigial in the reference's active
training path (only referenced from commented-out LAB-space experiments) but
part of the capability surface, so kept as a first-class utility.

All functions take/return NHWC float arrays; channels are the last axis
(the reference is NCHW with channel math at dim 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Host (numpy) constants: module import must not allocate device arrays
# (backend init at import time breaks jax-free worker processes and
# platform selection done after import).
_RGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)

_XYZ2RGB = np.array(
    [
        [3.24048134, -1.53715152, -0.49853633],
        [-0.96925495, 1.87599, 0.04155593],
        [0.05564664, -0.20404134, 1.05731107],
    ]
)

_WHITE = np.array([0.95047, 1.0, 1.08883])


def rgb2xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB in [0,1] -> XYZ (reference: model_util.py:13-35)."""
    mask = (rgb > 0.04045).astype(rgb.dtype)
    lin = (((rgb + 0.055) / 1.055) ** 2.4) * mask + rgb / 12.92 * (1 - mask)
    return jnp.einsum("...c,dc->...d", lin, _RGB2XYZ.astype(rgb.dtype))


def xyz2rgb(xyz: jnp.ndarray) -> jnp.ndarray:
    """XYZ -> sRGB (reference: model_util.py:38-59)."""
    rgb = jnp.einsum("...c,dc->...d", xyz, _XYZ2RGB.astype(xyz.dtype))
    rgb = jnp.maximum(rgb, 0.0)  # guard small negatives -> NaN under **(1/2.4)
    mask = (rgb > 0.0031308).astype(rgb.dtype)
    return (1.055 * (rgb ** (1.0 / 2.4)) - 0.055) * mask + 12.92 * rgb * (1 - mask)


def xyz2lab(xyz: jnp.ndarray) -> jnp.ndarray:
    """XYZ -> CIELAB (reference: model_util.py:65-88)."""
    scaled = xyz / _WHITE.astype(xyz.dtype)
    mask = (scaled > 0.008856).astype(xyz.dtype)
    f = (scaled ** (1.0 / 3.0)) * mask + (7.787 * scaled + 16.0 / 116.0) * (1 - mask)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([l, a, b], axis=-1)


def lab2xyz(lab: jnp.ndarray) -> jnp.ndarray:
    """CIELAB -> XYZ (reference: model_util.py:90-115)."""
    y = (lab[..., 0] + 16.0) / 116.0
    x = lab[..., 1] / 500.0 + y
    z = jnp.maximum(y - lab[..., 2] / 200.0, 0.0)
    f = jnp.stack([x, y, z], axis=-1)
    mask = (f > 0.2068966).astype(lab.dtype)
    out = (f**3.0) * mask + (f - 16.0 / 116.0) / 7.787 * (1 - mask)
    return out * _WHITE.astype(lab.dtype)


def rgb2lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB [0,1] -> LAB rescaled to roughly [0,1]
    (reference: model_util.py:117-128: ``(lab/100 + 1) / 2``)."""
    lab = xyz2lab(rgb2xyz(rgb))
    return (lab / 100.0 + 1.0) / 2.0


def lab2rgb(lab_rs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb2lab` (reference: model_util.py:130-140)."""
    lab = (lab_rs * 2.0 - 1.0) * 100.0
    return xyz2rgb(lab2xyz(lab))
