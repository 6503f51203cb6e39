"""TPU-native arbitrary style transfer framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
rwickman/ArbitraryStyleTransfer (see SURVEY.md): a MobileNetV2-style
lightweight encoder, AdaAttN attention-based adaptive instance normalization,
a mirrored upsampling decoder, VGG-19 perceptual losses, a two-stage training
pipeline (autoencoder pretraining -> AST training with warm-start), a
multi-resolution augmented data pipeline, and alpha-interpolated stylization
inference — designed NHWC/SPMD-first for TPU rather than ported from PyTorch.

Submodules load lazily (PEP 562): importing the package does NOT import
jax.  Data-loader worker processes (data/pipeline.py, spawn context)
import ``arbitrarystyletransfer_tpu.data.pipeline`` and must stay
jax-free — a jax import there would initialize a TPU client per worker.
"""

import importlib

__version__ = "0.1.0"

_LAZY_ATTRS = {
    "config": ".config",
    "losses": ".losses",
    "engine": ".engine",
    "infer": ".infer",
    "data": ".data",
    "models": ".models",
    "ops": ".ops",
    "parallel": ".parallel",
    "train": ".train",
    "utils": ".utils",
    "AETrainConfig": ".config",
    "ASTTrainConfig": ".config",
    "DataConfig": ".config",
    "ModelConfig": ".config",
}


def __getattr__(name):
    target = _LAZY_ATTRS.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    module = importlib.import_module(target, __name__)
    if target == ".config" and name != "config":
        return getattr(module, name)
    return module


def __dir__():
    return sorted(set(globals()) | set(_LAZY_ATTRS))
