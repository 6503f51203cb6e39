"""Optional adversarial (discriminator) training step.

The reference's GAN experiment is fully commented out at HEAD
(train.py:63-64,160-188; models.py:368-388) but is part of the capability
surface (SURVEY.md §2.2, §2.5).  This module provides the intended logic as
a jittable step:

  * real samples are the content images, labels smoothed to 1 - 0.2
    (train.py:176);
  * fake samples are the (stopped-gradient) stylized images, labels 0
    (train.py:177-180);
  * an R1 gradient penalty on the real batch every ``r1_every`` iterations
    (train.py:164-173), with lax.cond keeping the step a single compiled
    executable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ASTTrainConfig
from ..losses import discriminator_loss, r1_loss
from ..models.mobilenetv2 import Discriminator
from .state import TrainState, global_grad_norm


def discriminator_loss_terms(
    disc: Discriminator,
    cfg: ASTTrainConfig,
    params,
    batch_stats,
    real_imgs,
    fake_imgs,
    rng,
    step,
    r1_every: int = 8,
):
    """The discriminator objective (reference: train.py:160-188, intended):
    label-smoothed BCE on real content images + BCE-zero on stopped-gradient
    stylized fakes + an R1 penalty every ``r1_every`` steps (lax.cond keeps
    it one executable).  Returns (total, aux)."""

    def apply(x, rng_key):
        # Train-mode normalization; running-stat updates are discarded in
        # this optional path (the discriminator is vestigial in the
        # reference, SURVEY.md §2.2).
        out, _ = disc.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=True, rngs={"dropout": rng_key},
            mutable=["batch_stats"],
        )
        return out

    rng_t, rng_f, rng_r1 = jax.random.split(rng, 3)
    b = real_imgs.shape[0]
    pred_real = apply(real_imgs, rng_t)
    true_loss = discriminator_loss(pred_real, jnp.full((b, 1), 1.0 - 0.2))
    pred_fake = apply(jax.lax.stop_gradient(fake_imgs), rng_f)
    fake_loss = discriminator_loss(pred_fake, jnp.zeros((b, 1)))

    apply_r1 = (step + 1) % r1_every == 0
    r1 = jax.lax.cond(
        apply_r1,
        lambda x: r1_loss(lambda im: apply(im, rng_r1), x, cfg.r1_lam),
        lambda x: jnp.zeros((), real_imgs.dtype),
        real_imgs,
    )
    total = true_loss + fake_loss + r1
    return total, {
        "dis_loss": total,
        "true_loss": true_loss,
        "fake_loss": fake_loss,
        "r1_loss": r1,
    }


def make_discriminator_train_step(
    disc: Discriminator, cfg: ASTTrainConfig, r1_every: int = 8
):
    def train_step(state: TrainState, real_imgs, fake_imgs, rng):
        def loss_fn(params):
            return discriminator_loss_terms(
                disc, cfg, params, state.batch_stats, real_imgs, fake_imgs,
                rng, state.step, r1_every,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        aux["grad_norm"] = global_grad_norm(grads)
        return state.apply_gradients(grads), aux

    return jax.jit(train_step, donate_argnums=(0,))


def generator_adversarial_loss(disc, disc_vars, stylized_imgs, rng):
    """Generator-side fooling loss (reference: train.py:202-204):
    BCE(D(t_cs), ones)."""
    pred, _ = disc.apply(
        disc_vars, stylized_imgs, train=True, rngs={"dropout": rng},
        mutable=["batch_stats"],
    )
    return discriminator_loss(pred, jnp.ones((stylized_imgs.shape[0], 1)))
