"""Frozen VGG-19 perceptual-loss network (NHWC, flax).

TPU-native equivalent of the reference PretrainedEncoder
(reference: models.py:186-240): an ImageNet-normalization front layer, the
torchvision VGG-19 ``features`` stack with layers renamed ``conv_i``/
``relu_i``/``pool_i`` while walking (conv index ``i`` increments on each
conv), and early exit once the requested tap layers are collected.  Default
taps are ['conv_1','conv_3','conv_5','conv_9','conv_13','relu_15']
(models.py:187) — feature widths 64, 128, 256, 512, 512, 512.  ``conv_i``
taps are taken *before* the ReLU, ``relu_15`` after, exactly as in the
reference's walk.

Pretrained weights: the reference downloads torchvision's ImageNet weights
(models.py:192).  This build cannot download; use
:func:`load_torch_vgg19_state_dict` to import a torchvision
``vgg19(pretrained=True).features`` state dict (``.pth`` via torch, or an
``.npz`` export) into the flax parameter tree.  Without a weight file the
network runs with seeded He-normal init — still a valid (random-projection)
perceptual loss for tests, but not ImageNet-pretrained; pass a weight file
for reference-parity loss curves.
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import VGG_CONTENT_LAYERS

# torchvision vgg19 'features' configuration:
# 64,64,M, 128,128,M, 256x4,M, 512x4,M, 512x4,M
_VGG19_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def vgg_layer_names():
    """The named layer walk (conv_i / relu_i / pool_i), reference order."""
    names = []
    i = 0
    for v in _VGG19_CFG:
        if v == "M":
            names.append(f"pool_{i}")
        else:
            i += 1
            names.append(f"conv_{i}")
            names.append(f"relu_{i}")
    return names


class VGG19Features(nn.Module):
    """VGG-19 feature taps with early exit (reference: models.py:230-240)."""

    content_layers: Sequence[str] = VGG_CONTENT_LAYERS

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        wanted = set(self.content_layers)
        # ImageNet normalization front layer (reference models.py:189-196).
        mean = jnp.asarray(_IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(_IMAGENET_STD, dtype=x.dtype)
        x = (x - mean) / std

        outs = []
        i = 0
        for v in _VGG19_CFG:
            if v == "M":
                name = f"pool_{i}"
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                i += 1
                name = f"conv_{i}"
                x = nn.Conv(
                    v, (3, 3), padding=((1, 1), (1, 1)), name=name,
                    kernel_init=nn.initializers.he_normal(),
                )(x)
                if name in wanted:
                    outs.append(x)
                name = f"relu_{i}"
                x = nn.relu(x)
            if name in wanted:
                outs.append(x)
            if len(outs) == len(wanted):
                # Static early exit: the graph is truncated at trace time,
                # exactly like the reference's runtime break.
                return outs
        return outs


def load_torch_vgg19_state_dict(path: str):
    """Import torchvision vgg19 features weights into a flax param dict.

    Accepts either a torch ``.pth`` state dict (keys ``features.N.weight``/
    ``.bias`` or bare ``N.weight``) or an ``.npz`` with the same keys.
    Torch conv kernels are OIHW; flax wants HWIO.

    Returns a dict suitable as ``{'params': <returned>}`` for
    :class:`VGG19Features`.
    """
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch  # cpu torch is available in this image

        sd = torch.load(path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        raw = {k: v.numpy() for k, v in sd.items()}

    # Normalize key prefixes to bare feature indices.
    cleaned = {}
    for k, v in raw.items():
        kk = k
        for prefix in ("features.", "module.features.", "_vgg_layers."):
            if kk.startswith(prefix):
                kk = kk[len(prefix):]
        cleaned[kk] = v

    # Walk the cfg to map torch sequential indices -> conv_i names.
    params = {}
    seq_idx = 0
    conv_i = 0
    for v in _VGG19_CFG:
        if v == "M":
            seq_idx += 1  # pool
            continue
        conv_i += 1
        w_key, b_key = f"{seq_idx}.weight", f"{seq_idx}.bias"
        if w_key not in cleaned:
            raise KeyError(f"missing {w_key} in vgg weight file {path}")
        w = np.asarray(cleaned[w_key])  # (O, I, H, W)
        b = np.asarray(cleaned[b_key])
        params[f"conv_{conv_i}"] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # HWIO
            "bias": jnp.asarray(b),
        }
        seq_idx += 2  # conv + relu

    return params


def find_vgg_weights(search_paths: Sequence[str] = ()) -> str | None:
    """Locate a VGG-19 weight file if one is available locally."""
    candidates = list(search_paths) + [
        os.environ.get("VGG19_WEIGHTS", ""),
        "weights/vgg19_features.npz",
        "weights/vgg19.pth",
        os.path.expanduser("~/.cache/torch/hub/checkpoints/vgg19-dcbb9e9d.pth"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None
