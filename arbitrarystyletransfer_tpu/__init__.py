"""TPU-native arbitrary style transfer framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
rwickman/ArbitraryStyleTransfer (see SURVEY.md): a MobileNetV2-style
lightweight encoder, AdaAttN attention-based adaptive instance normalization,
a mirrored upsampling decoder, VGG-19 perceptual losses, a two-stage training
pipeline (autoencoder pretraining -> AST training with warm-start), a
multi-resolution augmented data pipeline, and alpha-interpolated stylization
inference — designed NHWC/SPMD-first for TPU rather than ported from PyTorch.
"""

from . import config, losses
from .config import (
    AETrainConfig,
    ASTTrainConfig,
    DataConfig,
    ModelConfig,
)

__version__ = "0.1.0"
