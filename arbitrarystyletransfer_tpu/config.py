"""Configuration layer.

TPU-native dataclass configs reproducing every knob of the reference's config
module (reference: conf.py:1-131) and the CLI defaults of the two training
drivers (reference: train.py:405-437, train_autoencoder.py:249-264).

The reference exposes these as star-imported module globals; here they are
immutable dataclasses so that configs are hashable (usable as static args to
``jax.jit``) and explicit.  All layout is NHWC (TPU-native conv layout).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Architecture tables (reference: conf.py:75-109)
# ---------------------------------------------------------------------------

# (c_in, c_out, stride, kernel_size, expand_ratio) per encoder block.
# Block 0 is the stem conv (conv_3x3_bn); blocks 1..13 are inverted-residual
# DepthWiseConv blocks; block 14 is appended after the loop with
# expand_ratio=EXPAND_RATIO (reference: models.py:145-154).
ENC_CONV_SHAPES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (3, 16, 1, 3, 1),
    (16, 16, 1, 3, 6),
    (16, 24, 2, 3, 6),
    (24, 24, 1, 3, 6),
    (24, 40, 2, 5, 6),
    (40, 40, 1, 5, 4),
    (40, 40, 1, 5, 4),
    (40, 80, 2, 3, 4),
    (80, 80, 1, 3, 4),
    (80, 80, 1, 3, 4),
    (80, 96, 1, 5, 4),
    (96, 96, 1, 5, 3),
    (96, 128, 1, 3, 3),
    (128, 128, 1, 3, 3),
    (128, 128, 1, 3, 3),
)

# (c_in, c_out, stride, kernel_size, expand_ratio); final row is the
# (in_ch, out_ch) of the 3x3 image-output conv (reference: conf.py:93-109).
DECODER_CONV_SHAPES: Tuple[Tuple[int, ...], ...] = (
    (128, 128, 1, 3, 3),
    (128, 128, 1, 3, 3),
    (128, 96, 1, 3, 3),
    (96, 96, 1, 5, 3),
    (96, 80, 1, 5, 4),
    (80, 80, 1, 3, 4),
    (80, 80, 1, 3, 4),
    (80, 40, 1, 3, 4),
    (40, 40, 1, 5, 4),
    (40, 40, 1, 5, 4),
    (40, 24, 1, 5, 6),
    (24, 24, 1, 3, 6),
    (24, 16, 1, 3, 6),
    (16, 16, 1, 3, 6),
    (16, 3, 1),
)

EXPAND_RATIO = 3  # reference: conf.py:71
ENC_OUT_LAYERS: Tuple[int, ...] = (12, 14)  # reference: conf.py:112
ENC_OUT_CHANNELS = 128  # reference: conf.py:113

# Multi-resolution training sizes (reference: conf.py:4).
IMG_SIZES: Tuple[int, ...] = (96, 128, 160)

# Inference resolution knob, device-conditional like the reference
# (conf.py:8: ``imsize = 320 if torch.cuda.is_available() else 128``):
# 320 with an accelerator attached, 128 on a CPU-only host.  Resolved
# lazily so importing config never initializes a JAX backend (the data
# workers stay jax-free, see the package __init__).
IMSIZE = 320


def default_imsize() -> int:
    """320 when an accelerator (TPU/GPU) is attached, 128 on CPU-only —
    the reference's device-conditional ``imsize`` (conf.py:8)."""
    try:
        import jax

        backend = jax.default_backend()
    except Exception:
        return 128
    return IMSIZE if backend not in ("cpu", "") else 128

# VGG-19 perceptual-loss tap layers (reference: models.py:187).
VGG_CONTENT_LAYERS: Tuple[str, ...] = (
    "conv_1", "conv_3", "conv_5", "conv_9", "conv_13", "relu_15",
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture config (hashable; safe as a jit static arg)."""

    enc_conv_shapes: Tuple[Tuple[int, int, int, int, int], ...] = ENC_CONV_SHAPES
    decoder_conv_shapes: Tuple[Tuple[int, ...], ...] = DECODER_CONV_SHAPES
    expand_ratio: int = EXPAND_RATIO
    enc_out_layers: Tuple[int, ...] = ENC_OUT_LAYERS
    enc_out_channels: int = ENC_OUT_CHANNELS
    vgg_content_layers: Tuple[str, ...] = VGG_CONTENT_LAYERS
    # Use the fused Pallas AdaAttN attention-statistics kernel on TPU.
    use_pallas_adaattn: bool = False
    # BatchNorm statistics for "eval-mode" encoder passes (the detached
    # encode, stylize/export inference, AE eval).  The reference uses
    # running averages there (enc.eval(), models.py:539-547) — but dead
    # channels collapse running variance toward zero during training, and
    # eval-mode normalization then amplifies inputs by up to 1/sqrt(eps)
    # ~ 316x per BN layer, compounding across ~40 BN layers into overflow
    # (observed: the encoder emits 1e13+ activations and AST training NaNs).
    # False (default): normalize those passes with batch statistics —
    # numerically robust, and consistent with what the decoder saw during
    # training.  True: strict reference parity (running averages).
    encoder_eval_stats: bool = False
    # Compute dtype for the conv path (params are always float32).
    # "bfloat16" engages the MXU's native dtype: ~2x matmul throughput and
    # half the HBM traffic; normalization statistics, softmax, and losses
    # stay float32.
    compute_dtype: str = "float32"
    # Depthwise conv lowering: "conv" (XLA grouped conv) or "shifts"
    # (unrolled shifted multiplies, fuses on the VPU — faster for the
    # high-resolution low-channel decoder tail).  See blocks.DepthwiseConv2D.
    depthwise_impl: str = "conv"

    def jnp_compute_dtype(self):
        """None for float32 (flax default promotion), else the jnp dtype."""
        if self.compute_dtype in ("float32", None):
            return None
        import jax.numpy as jnp

        return jnp.dtype(self.compute_dtype)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset locations + sampling (reference: conf.py:121-122).

    The reference hardcodes machine-local directory lists; here they are
    config fields with the same list-of-directories semantics.
    """

    content_dirs: Tuple[str, ...] = ("temp_dataset/content/",)
    style_dirs: Tuple[str, ...] = ("temp_dataset/style/",)
    img_sizes: Tuple[int, ...] = IMG_SIZES
    num_workers: int = 4
    prefetch: int = 4


@dataclasses.dataclass(frozen=True)
class ASTTrainConfig:
    """Stage-2 AST training flags (reference: train.py:405-437)."""

    train_iter: int = 2_048_000
    batch_size: int = 8
    lr: float = 2e-4
    dis_lr: float = 1e-5
    dis_lam: float = 1e-3
    # Opt-in adversarial training (the reference's GAN experiment is
    # disabled at HEAD, train.py:63-64,160-204; this flag enables the
    # intended end-to-end path: discriminator step + dis_lam-weighted
    # generator fooling loss + discriminator checkpointing).
    use_dis: bool = False
    # Discriminator Adam moments (reference: train.py:64, commented).
    dis_adam_b1: float = 0.5
    dis_adam_b2: float = 0.99
    content_lam: float = 1.25
    org_img_lam: float = 0.5
    style_lam: float = 0.5
    tv_lam: float = 0.0006
    lf_lam: float = 1.0
    r1_lam: float = 5.0
    save_dir: str = "models/ast/"
    ae_model: str = "models/auto_encoder/ae"
    load: bool = False
    recon_lam: float = 100.0
    perp_lam: float = 0.01
    # Adam moments (reference: train.py:61).
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-5
    grad_clip_norm: float = 2.0  # reference: train.py:292
    # Fixed inner weights of the loss assembly (reference: train.py:258-271).
    pixel_content_weight: float = 0.1
    pixel_style_weight: float = 1.0
    hist_lam: float = 1e-5
    out_of_range_lam: float = 1e8
    identity_mse_weight: float = 100.0
    save_every: int = 32  # reference: train.py:313
    log_every: int = 8  # reference: train.py:294


@dataclasses.dataclass(frozen=True)
class AETrainConfig:
    """Stage-1 autoencoder pretraining flags
    (reference: train_autoencoder.py:249-264)."""

    train_iter: int = 8192
    batch_size: int = 16
    lr: float = 2e-4
    save_dir: str = "models/auto_encoder/"
    load: bool = False
    recon_lam: float = 100.0
    perp_lam: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    adam_eps: float = 1e-7
    grad_clip_norm: float = 10.0  # reference: train_autoencoder.py:143
    save_every: int = 32  # reference: train_autoencoder.py:92
    validate_every: int = 64  # reference: train_autoencoder.py:103
    ae_imsize: int = 256  # fixed AE training resolution
