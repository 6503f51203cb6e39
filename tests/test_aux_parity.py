"""Capability-parity tests for the auxiliary surface: GAN step, r1 loss,
alt soft histogram, gaussian-noise augmentation, AE latent utilities."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import torch

from arbitrarystyletransfer_tpu import losses
from arbitrarystyletransfer_tpu.config import ASTTrainConfig
from arbitrarystyletransfer_tpu.data.pipeline import add_gaussian_noise
from arbitrarystyletransfer_tpu.models import Discriminator
from arbitrarystyletransfer_tpu.train.gan import (
    generator_adversarial_loss,
    make_discriminator_train_step,
)
from arbitrarystyletransfer_tpu.train.state import create_train_state, make_optimizer


class TestR1Loss:
    def test_matches_torch_formula(self):
        # D(x) = sum of squares => grad = 2x; r1 = lam * mean_b(sum(4 x^2)).
        x = np.random.default_rng(0).normal(0, 1, (3, 4, 4, 3)).astype(np.float32)

        def disc(v):
            return jnp.sum(jnp.square(v), axis=(1, 2, 3), keepdims=False)[:, None]

        ours = float(losses.r1_loss(disc, jnp.asarray(x), r1_lam=5.0))
        t = torch.tensor(x, requires_grad=True)
        pred = (t**2).sum(dim=(1, 2, 3), keepdim=False)[:, None]
        grad = torch.autograd.grad(pred.sum(), t, create_graph=True)[0]
        ref = 5.0 * grad.pow(2).reshape(3, -1).sum(1).mean()
        assert abs(ours - ref.item()) < 1e-2 * max(1.0, abs(ref.item()))


class TestDiscriminatorStep:
    def test_runs_and_updates(self):
        disc = Discriminator()
        x = jnp.zeros((2, 64, 64, 3))
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        cfg = ASTTrainConfig()
        tx = make_optimizer(cfg.dis_lr, 0.5, 0.99, 1e-8)
        state = create_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )
        step = make_discriminator_train_step(disc, cfg, r1_every=2)
        rng = jax.random.PRNGKey(1)
        real = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        fake = jnp.asarray(
            np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
        )
        state, aux = step(state, real, fake, rng)
        assert np.isfinite(float(aux["dis_loss"]))
        assert float(aux["r1_loss"]) == 0.0  # step 1: no r1
        state, aux = step(state, real, fake, rng)
        assert float(aux["r1_loss"]) != 0.0  # step 2: r1 applied
        assert np.isfinite(float(aux["grad_norm"]))

    def test_generator_adversarial_loss(self):
        disc = Discriminator()
        x = jnp.full((2, 64, 64, 3), 0.5)
        variables = disc.init(jax.random.PRNGKey(0), x, train=False)
        val = generator_adversarial_loss(
            disc, variables, x, jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(val))


class TestAltHistogram:
    def test_soft_histogram_alt_shape(self):
        x = jnp.asarray(
            np.random.default_rng(0).uniform(0, 1, (2, 255)), jnp.float32
        )
        h = losses.soft_histogram_alt(x)
        assert np.isfinite(np.asarray(h)).all()


class TestGaussianNoise:
    def test_fires_above_p_and_clips(self):
        x = np.full((8, 8, 3), 0.99, np.float32)
        # p=0 => always fires (reference semantics: random() > p)
        out = add_gaussian_noise(x, random.Random(0), std=0.5, p=0.0)
        assert out.max() <= 1.0 and out.min() >= 0.0
        assert not np.allclose(out, x)
        # p=1 => never fires
        out2 = add_gaussian_noise(x, random.Random(0), std=0.5, p=1.0)
        np.testing.assert_array_equal(out2, x)
