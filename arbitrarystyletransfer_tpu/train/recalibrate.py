"""Post-training BatchNorm recalibration: make default-trained checkpoints
servable by the fused inference engine.

Training defaults to ``ModelConfig.encoder_eval_stats=False`` (batch-stats
inference — see the config docstring for why eval-stats training can
overflow), so a normally-trained checkpoint's BN *running averages* are
whatever the momentum-0.1 EMA happened to land on, never validated, and the
fused engine — which folds running statistics into conv weights
(engine.py) — refuses them (infer.py).

This module rebuilds those running statistics from real data, the standard
BN-recalibration recipe: run the encoder in train mode (batch statistics
normalize, so every layer sees exactly the activations the batch-stats
inference graph produces) over N batches, recover each batch's raw moments,
and write their *average* into the running-stat tree (expected-value
estimation instead of an EMA tail).  After recalibration, eval-stats
normalization matches batch-stats normalization up to batch sampling noise,
and the fused engine serves the checkpoint with the reference's eval-mode
encode semantics (reference: models.py:539-547, ``enc.eval()``).

Only the encoder is recalibrated: it is the only BN-bearing module in the
stylize path (the decoder and ada_out run ``use_norm=False``,
conf.py:93-109 / models.py:281-293).
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.encoder import Encoder
from ..ops.norm import BatchNorm2D


# One constant, one meaning: a checkpoint whose eval-stats encoding drifts
# more than this (relative Frobenius at the deepest tap, eval_stats_drift)
# from the batch-stats encoding is NOT considered eval-stable, and the
# folded fused engine should not silently claim to reproduce the
# training-validated graph.  ~0.1 is the measured boundary below which the
# two graphs are interchangeable up to batch-sampling noise; infer.py uses
# this same constant for its serving guard.
EVAL_DRIFT_SAFE = 0.1


def _invert_ema(new, old, momentum: float):
    """Recover the raw per-batch moment from one EMA update.

    ops/norm.py updates ``ra = (1-m)*ra + m*batch`` (torch convention,
    m=0.1), so ``batch = (new - (1-m)*old) / m`` — exact inversion, no
    module surgery needed.
    """
    return (new - (1.0 - momentum) * old) / momentum


def make_batch_moments_fn(cfg: ModelConfig = ModelConfig()):
    """Jitted (enc_params, enc_stats, x) -> per-batch BN moment tree.

    The forward runs train-mode (batch statistics normalize AND running
    stats update); the EMA writes are inverted back to the raw batch
    moments.  ``enc_stats`` only seeds the inversion — the result is
    independent of it.
    """
    enc = Encoder(cfg)
    momentum = BatchNorm2D.momentum

    @jax.jit
    def batch_moments(enc_params, enc_stats, x):
        _, mutated = enc.apply(
            {"params": enc_params, "batch_stats": enc_stats},
            x, auto_enc=True, train=True, mutable=["batch_stats"],
        )
        return jax.tree.map(
            functools.partial(_invert_ema, momentum=momentum),
            mutated["batch_stats"], enc_stats,
        )

    return batch_moments


def _floor_variances(stats_tree, rel_floor: float):
    """Clamp each BN site's running variances to ``rel_floor`` times the
    site's channel-mean variance.

    Eval-stats normalization multiplies a channel by rsqrt(var + eps) — up
    to ~316x when a dead channel's variance collapses toward zero.  That
    gain compounds exponentially across the encoder's ~40 BN layers, which
    is exactly the overflow mode that makes raw running averages unservable
    (see ModelConfig.encoder_eval_stats).  A dead channel carries no
    information, so bounding its amplification (to ~sqrt(1/rel_floor) of
    the layer's typical gain) costs nothing and makes the folded engine
    robust to imperfectly-trained checkpoints.
    """
    def clamp(path, leaf):
        if getattr(path[-1], "key", None) != "var":
            return leaf
        return jnp.maximum(leaf, rel_floor * jnp.mean(leaf))

    return jax.tree_util.tree_map_with_path(clamp, stats_tree)


def recalibrate_encoder_stats(
    enc_params,
    enc_stats,
    batches: Iterable[np.ndarray],
    cfg: ModelConfig = ModelConfig(),
    var_floor_rel: float = 1e-3,
):
    """Rebuild the encoder's BN running statistics from data batches
    (expected-value recalibration: the average of per-batch moments).

    IMPORTANT LIMIT — what recalibration can and cannot do.  Perfect
    moment estimates make eval-stats normalization match batch-stats
    normalization *in distribution*, but the residual (batch-sampling
    noise) is then propagated through the eval graph LINEARLY: unlike
    batch mode, eval mode never renormalizes a perturbation away.  On a
    checkpoint whose BN chain has Jacobian gain > 1, that residual
    compounds exponentially regardless of how the running statistics were
    estimated (measured on a random-init encoder: perfectly-recalibrated
    eval activations reach 1e23 by block 14; a self-consistent fixed-point
    iteration diverges too — eval-stability is a property of the WEIGHTS,
    not the statistics).  Use :func:`eval_stats_drift` to validate a
    recalibrated checkpoint before serving it through the folded engine;
    checkpoints trained with ``encoder_eval_stats=True`` (reference
    parity, models.py:539-547) exercise the eval graph during training and
    are the always-safe route.

    Args:
      enc_params: the ``params["enc"]`` subtree of an AST/AutoEncoder
        checkpoint.
      enc_stats: the matching ``batch_stats["enc"]`` subtree (shape
        template; its values do not influence the result).
      batches: NHWC image batches in [0, 1] — content AND style images,
        since the encoder serves both at inference.  More batches = less
        sampling noise; ~16+ recommended for serving.
      cfg: the ModelConfig the checkpoint was trained under.
      var_floor_rel: relative variance floor per BN site (see
        ``_floor_variances``); 0 disables flooring.

    Returns:
      A new ``batch_stats["enc"]`` tree whose running mean/var are the
      average of the per-batch moments (mean of unbiased variances for
      ``var``, matching what the EMA would converge to).
    """
    batch_moments = make_batch_moments_fn(cfg)
    total = None
    n = 0
    for x in batches:
        moments = batch_moments(enc_params, enc_stats, jnp.asarray(x))
        total = moments if total is None else jax.tree.map(
            jnp.add, total, moments
        )
        n += 1
    if n == 0:
        raise ValueError("recalibration needs at least one batch")
    mean_tree = jax.tree.map(lambda s: s / n, total)
    if var_floor_rel:
        mean_tree = _floor_variances(mean_tree, var_floor_rel)
    return mean_tree


def eval_stats_drift(
    enc_params,
    enc_stats,
    batches: Iterable[np.ndarray],
    cfg: ModelConfig = ModelConfig(),
) -> float:
    """Serving-safety diagnostic: how far the eval-stats encoder drifts
    from the batch-stats encoder on held-out batches.

    Returns the mean over batches of
    ``||taps_eval - taps_batch||_F / ||taps_batch||_F`` at the deepest tap.
    ``EVAL_DRIFT_SAFE`` (0.1) or below: the checkpoint is eval-stable and
    the folded engine is a faithful drop-in.  >> 1 (or non-finite): the BN
    chain amplifies the eval/batch residual — serve with the flax
    batch-stats graph instead, or train with ``encoder_eval_stats=True``.
    For an unbiased reading, pass batches HELD OUT from the recalibration
    set (infer.py's serving route does this automatically).
    """
    enc = Encoder(cfg)
    taps = (cfg.enc_out_layers[-1],)

    @jax.jit
    def both(x):
        e = enc.apply(
            {"params": enc_params, "batch_stats": enc_stats},
            x, out_layers=taps, train=False, use_batch_stats=False,
        )[0]
        b = enc.apply(
            {"params": enc_params, "batch_stats": enc_stats},
            x, out_layers=taps, train=False, use_batch_stats=True,
        )[0]
        num = jnp.linalg.norm((e - b).ravel())
        den = jnp.linalg.norm(b.ravel())
        return num / (den + 1e-12)

    vals = [float(both(jnp.asarray(x))) for x in batches]
    if not vals:
        raise ValueError("drift check needs at least one batch")
    return float(np.mean(vals))


def recalibrate_variables(
    variables: dict,
    batches: Iterable[np.ndarray],
    cfg: ModelConfig = ModelConfig(),
) -> dict:
    """Full-variables convenience wrapper: returns a copy of ``variables``
    with ``batch_stats["enc"]`` recalibrated from ``batches``."""
    new_stats = dict(variables["batch_stats"])
    new_stats["enc"] = recalibrate_encoder_stats(
        variables["params"]["enc"], variables["batch_stats"]["enc"],
        batches, cfg,
    )
    out = dict(variables)
    out["batch_stats"] = new_stats
    return out
