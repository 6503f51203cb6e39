"""GAN-path fidelity vs the intended torch reference semantics.

The reference's adversarial experiment is commented out at HEAD
(train.py:160-188; models.py:368-388) but is part of the capability
surface; the rebuild provides the INTENDED logic in train/gan.py.  These
tests pin that path against a torch replica of the reference Discriminator
(tests/torch_reference.py) the same way test_fidelity.py pins the main
objective (VERDICT r3 item 7):

  * train-mode forward parity: the flax Discriminator and the torch
    replica (identical ported weights, dropout 0) agree on predictions;
  * loss-term parity: label-smoothed BCE-real + BCE-zero-fake + R1
    (train.py:33-37,164-188) agree on both the r1 and the non-r1 iteration;
  * BatchNorm running statistics advance through the real-then-fake
    forward sequence exactly as torch train-mode does.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from arbitrarystyletransfer_tpu.config import ASTTrainConfig
from arbitrarystyletransfer_tpu.losses import discriminator_loss
from arbitrarystyletransfer_tpu.models.mobilenetv2 import Discriminator
from arbitrarystyletransfer_tpu.train.gan import discriminator_loss_terms

import torch_reference as tref

pytestmark = [pytest.mark.slow, pytest.mark.fidelity]

# 64px: the MobileNetV2 head sees 2x2 spatial maps — torch
# InstanceNorm2d requires >1 spatial element in train mode.
S = 64
B = 4


@pytest.fixture(scope="module")
def ported():
    """(flax disc, params, batch_stats, torch replica) with identical
    weights and dropout disabled (deterministic train-mode forward)."""
    disc = Discriminator(dropout_rate=0.0)
    z = jnp.zeros((1, S, S, 3))
    variables = disc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        z, train=True,
    )
    tdis = tref.Discriminator(dropout=0.0)
    tref.port_discriminator(
        tdis, variables["params"], variables["batch_stats"]
    )
    tdis.train()
    return disc, variables["params"], variables["batch_stats"], tdis


def _batch(rng, n=B):
    return rng.uniform(0.0, 1.0, (n, S, S, 3)).astype(np.float32)


def _nchw(x):
    return torch.tensor(np.transpose(x, (0, 3, 1, 2)))


def test_train_mode_forward_parity(ported, rng):
    disc, params, stats, tdis = ported
    x = _batch(rng)
    out, _ = disc.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    with torch.no_grad():
        tout = tdis(_nchw(x))
    np.testing.assert_allclose(
        np.asarray(out), tout.numpy(), rtol=2e-3, atol=2e-4
    )


def _torch_loss_terms(tdis, cfg, real, fake, r1_iter: bool):
    """The reference discriminator objective, intended semantics
    (train.py:164-188 with R1_LAM from train.py:33)."""
    b = real.shape[0]
    real_t = _nchw(real)
    if r1_iter:
        real_t.requires_grad = True
        dis_true = tdis(real_t)
        grad_real = torch.autograd.grad(
            outputs=dis_true.sum(), inputs=real_t, create_graph=True
        )[0]
        r1 = cfg.r1_lam * grad_real.pow(2).reshape(b, -1).sum(1).mean()
    else:
        dis_true = tdis(real_t)
        r1 = torch.zeros(())
    true_loss = torch.nn.functional.binary_cross_entropy(
        dis_true, torch.ones(b, 1) - 0.2
    )
    dis_fake = tdis(_nchw(fake).detach())
    fake_loss = torch.nn.functional.binary_cross_entropy(
        dis_fake, torch.zeros(b, 1)
    )
    return {
        "true_loss": float(true_loss),
        "fake_loss": float(fake_loss),
        "r1_loss": float(r1),
        "dis_loss": float(true_loss + fake_loss + r1),
    }


@pytest.mark.parametrize("r1_iter", [False, True])
def test_loss_term_parity(ported, rng, r1_iter):
    disc, params, stats, tdis = ported
    cfg = ASTTrainConfig()
    real, fake = _batch(rng), _batch(rng)
    # step chosen so (step + 1) % 8 == 0 exactly on the r1 iteration
    step = 7 if r1_iter else 3
    _, (aux, _) = discriminator_loss_terms(
        disc, cfg, params, stats, jnp.asarray(real), jnp.asarray(fake),
        jax.random.PRNGKey(3), jnp.asarray(step),
    )
    want = _torch_loss_terms(tdis, cfg, real, fake, r1_iter)
    for k, v in want.items():
        got = float(aux[k])
        np.testing.assert_allclose(got, v, rtol=5e-3, atol=1e-4), k


def test_bn_running_stats_advance_like_torch(ported, rng):
    """After one real-then-fake forward pair, every BN running mean/var in
    the returned tree matches the torch replica's (momentum-0.1 EMA through
    the same forward sequence, train.py:174-180 ordering)."""
    disc, params, stats, tdis = ported
    # The module-scoped torch replica is mutable: earlier tests' train-mode
    # forwards advance its BN running stats in place.  Re-port the pristine
    # tree so both sides start from the same statistics.
    tref.port_discriminator(tdis, params, stats)
    tdis.train()
    cfg = ASTTrainConfig()
    real, fake = _batch(rng), _batch(rng)
    _, (_, new_stats) = discriminator_loss_terms(
        disc, cfg, params, stats, jnp.asarray(real), jnp.asarray(fake),
        jax.random.PRNGKey(3), jnp.asarray(3),
    )
    # torch side: same two train-mode forwards
    with torch.no_grad():
        tdis(_nchw(real))
        tdis(_nchw(fake))

    mp = new_stats["mobnet"]
    for i in range(17):
        tb = tdis.features[1 + i]
        bns = [m for m in tb.conv if isinstance(m, torch.nn.BatchNorm2d)]
        fsb = mp[f"blocks_{i}"]
        for j, bn in enumerate(bns):
            np.testing.assert_allclose(
                np.asarray(fsb[f"BatchNorm2D_{j}"]["mean"]),
                bn.running_mean.numpy(), rtol=1e-3, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(fsb[f"BatchNorm2D_{j}"]["var"]),
                bn.running_var.numpy(), rtol=1e-3, atol=1e-5,
            )


def test_loss_pieces_match_reference_formulas(rng):
    """discriminator_loss == F.binary_cross_entropy on arbitrary sigmoid
    outputs/labels (reference losses.py:142-143)."""
    out = rng.uniform(0.02, 0.98, (B, 1)).astype(np.float32)
    lab = np.full((B, 1), 0.8, np.float32)
    got = float(discriminator_loss(jnp.asarray(out), jnp.asarray(lab)))
    want = float(torch.nn.functional.binary_cross_entropy(
        torch.tensor(out), torch.tensor(lab)
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)
