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
from ..losses import discriminator_loss
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
    it one executable).

    torch-parity details (pinned by tests/test_gan_fidelity.py):
      * the r1 iteration reuses the TRUE pass's predictions for the penalty
        — the reference runs ONE real forward, not a separate r1 forward
        (train.py:164-173);
      * BatchNorm running statistics update through the real-then-fake
        forward sequence exactly as torch train-mode does; the updated
        tree is returned for the caller to persist.

    Returns ``(total, (aux, new_batch_stats))``.
    """

    def apply(x, rng_key, stats):
        out, mutated = disc.apply(
            {"params": params, "batch_stats": stats},
            x, train=True, rngs={"dropout": rng_key},
            mutable=["batch_stats"],
        )
        return out, mutated["batch_stats"]

    rng_t, rng_f = jax.random.split(rng)
    b = real_imgs.shape[0]

    def true_pass_plain(x):
        pred, stats = apply(x, rng_t, batch_stats)
        return pred, stats, jnp.zeros((), jnp.float32)

    def true_pass_r1(x):
        # One real forward serving both the BCE term and the R1 penalty
        # (reference: `dis_true = self.dis(real_sample)` with
        # requires_grad, then r1_loss(dis_true, real_sample)).
        def summed(im):
            pred, stats = apply(im, rng_t, batch_stats)
            return jnp.sum(pred), (pred, stats)

        grad_real, (pred, stats) = jax.grad(summed, has_aux=True)(x)
        per_sample = jnp.sum(
            jnp.square(grad_real.reshape(grad_real.shape[0], -1)), axis=1
        )
        r1 = (cfg.r1_lam * jnp.mean(per_sample)).astype(jnp.float32)
        return pred, stats, r1

    apply_r1 = (step + 1) % r1_every == 0
    pred_real, stats_after_real, r1 = jax.lax.cond(
        apply_r1, true_pass_r1, true_pass_plain, real_imgs
    )
    true_loss = discriminator_loss(pred_real, jnp.full((b, 1), 1.0 - 0.2))
    pred_fake, new_stats = apply(
        jax.lax.stop_gradient(fake_imgs), rng_f, stats_after_real
    )
    fake_loss = discriminator_loss(pred_fake, jnp.zeros((b, 1)))

    total = true_loss + fake_loss + r1
    aux = {
        "dis_loss": total,
        "true_loss": true_loss,
        "fake_loss": fake_loss,
        "r1_loss": r1,
    }
    return total, (aux, new_stats)


def make_discriminator_train_step(
    disc: Discriminator, cfg: ASTTrainConfig, r1_every: int = 8
):
    def train_step(state: TrainState, real_imgs, fake_imgs, rng):
        def loss_fn(params):
            return discriminator_loss_terms(
                disc, cfg, params, state.batch_stats, real_imgs, fake_imgs,
                rng, state.step, r1_every,
            )

        (_, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        aux["grad_norm"] = global_grad_norm(grads)
        state = state.apply_gradients(grads)
        return state.replace(batch_stats=new_stats), aux

    return jax.jit(train_step, donate_argnums=(0,))


def generator_adversarial_loss(disc, disc_vars, stylized_imgs, rng):
    """Generator-side fooling loss (reference: train.py:202-204):
    BCE(D(t_cs), ones)."""
    pred, _ = disc.apply(
        disc_vars, stylized_imgs, train=True, rngs={"dropout": rng},
        mutable=["batch_stats"],
    )
    return discriminator_loss(pred, jnp.ones((stylized_imgs.shape[0], 1)))
