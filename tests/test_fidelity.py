"""Loss-curve fidelity vs the repaired torch reference.

BASELINE.md target 3: "loss curves matching the (repaired) reference within
float tolerance".  These tests port identical initial weights into
tests/torch_reference.py (the intended reference semantics reconstructed in
torch, SURVEY.md "Known defects" repaired), run both training loops on
identical synthetic data with identical optimizers (Adam + global-norm
clip), and assert the per-step loss trajectories match — pinning not just
the loss pieces (tests/test_stats_losses.py does that) but the assembled
optimization dynamics: model forward, BatchNorm semantics, the 6-tap VGG
perceptual losses, gradient flow, clipping, and the Adam update.

Reference train loops: train.py:216-300 (AST), train_autoencoder.py:114-148
(AE).  ``encoder_eval_stats=True`` for strict reference parity (eval-mode
encoder passes use BN running averages).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from arbitrarystyletransfer_tpu.config import (
    AETrainConfig,
    ASTTrainConfig,
    DECODER_CONV_SHAPES,
    ENC_CONV_SHAPES,
    EXPAND_RATIO,
    ModelConfig,
)
from arbitrarystyletransfer_tpu.models import AST, AutoEncoder, VGG19Features
from arbitrarystyletransfer_tpu.models.vgg import load_torch_vgg19_state_dict
from arbitrarystyletransfer_tpu.train import (
    create_train_state,
    make_ae_train_step,
    make_ast_train_step,
    make_optimizer,
)

import torch_reference as tref
from test_vgg_import import TAPS, _torch_taps, _torch_vgg19_features


pytestmark = [pytest.mark.slow, pytest.mark.fidelity]

S = 32
BATCH = 4
STRICT_CFG = ModelConfig(encoder_eval_stats=True)


def _data(seed, n_batches, paired=False):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        c = rng.uniform(0, 1, (BATCH, S, S, 3)).astype(np.float32)
        if paired:
            s = rng.uniform(0, 1, (BATCH, S, S, 3)).astype(np.float32)
            out.append((c, s))
        else:
            out.append(c)
    return out


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()


@pytest.fixture(scope="module")
def shared_vgg(tmp_path_factory):
    """One random-init torchvision-layout VGG-19 shared by both sides."""
    features = _torch_vgg19_features(seed=11)
    path = str(tmp_path_factory.mktemp("vgg") / "vgg19.pth")
    torch.save(features.state_dict(), path)
    flax_params = load_torch_vgg19_state_dict(path)
    return features, flax_params


class TestForwardParity:
    def test_autoencoder_forward_matches(self, rng):
        ae = AutoEncoder(STRICT_CFG)
        x = rng.uniform(0, 1, (BATCH, S, S, 3)).astype(np.float32)
        variables = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                            train=False)
        recon, _ = ae.apply(variables, jnp.asarray(x), train=True,
                            mutable=["batch_stats"])

        tae = tref.AutoEncoder(ENC_CONV_SHAPES, DECODER_CONV_SHAPES, EXPAND_RATIO)
        tref.port_autoencoder(tae, variables["params"], variables["batch_stats"])
        tae.train()
        with torch.no_grad():
            trecon = tae(_nchw(x))
        np.testing.assert_allclose(
            np.asarray(recon),
            trecon.permute(0, 2, 3, 1).numpy(),
            rtol=1e-4, atol=1e-5,
        )

    def test_ast_forward_matches(self, rng):
        ast = AST(STRICT_CFG)
        c = rng.uniform(0, 1, (BATCH, S, S, 3)).astype(np.float32)
        s = rng.uniform(0, 1, (BATCH, S, S, 3)).astype(np.float32)
        z = jnp.zeros((1, S, S, 3))
        variables = ast.init(jax.random.PRNGKey(0), z, z, train=False)
        (t_cs, (sm1, sm2), org_out), _ = ast.apply(
            variables, jnp.asarray(c), jnp.asarray(s), 1.0, train=True,
            mutable=["batch_stats"],
        )

        tast = tref.AST(ENC_CONV_SHAPES, DECODER_CONV_SHAPES, EXPAND_RATIO)
        tref.port_ast(tast, variables["params"], variables["batch_stats"])
        tast.train()
        with torch.no_grad():
            tt_cs, (tsm1, _), torg = tast(_nchw(c), _nchw(s), 1.0)
        np.testing.assert_allclose(
            np.asarray(sm1), tsm1.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(t_cs), tt_cs.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(org_out), torg.permute(0, 2, 3, 1).numpy(),
            rtol=1e-3, atol=1e-5,
        )


class TestLossCurveFidelity:
    def test_ae_training_curve_matches(self, shared_vgg):
        """~20 AE steps, per-step losses within float tolerance
        (reference loop: train_autoencoder.py:114-148)."""
        t_features, flax_vgg_params = shared_vgg
        cfg = AETrainConfig()
        n_steps = 20
        data = _data(7, n_steps)

        # --- TPU build side -------------------------------------------------
        ae = AutoEncoder(STRICT_CFG)
        variables = ae.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)),
                            train=False)
        # Host snapshot: the jitted step donates its state, deleting the
        # original device buffers.
        init_params = jax.tree.map(np.asarray, variables["params"])
        init_stats = jax.tree.map(np.asarray, variables["batch_stats"])
        vgg = VGG19Features(TAPS)
        tx = make_optimizer(cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
                            cfg.grad_clip_norm)
        state = create_train_state(
            variables["params"], variables["batch_stats"], tx
        )
        step = make_ae_train_step(ae, vgg, cfg)
        jax_losses = []
        for batch in data:
            state, aux, _ = step(state, flax_vgg_params, jnp.asarray(batch))
            jax_losses.append(float(aux["loss"]))

        # --- torch repaired-reference side ----------------------------------
        tae = tref.AutoEncoder(ENC_CONV_SHAPES, DECODER_CONV_SHAPES, EXPAND_RATIO)
        tref.port_autoencoder(tae, init_params, init_stats)
        tae.train()
        opt = torch.optim.Adam(tae.parameters(), lr=cfg.lr,
                               betas=(cfg.adam_b1, cfg.adam_b2),
                               eps=cfg.adam_eps)
        torch_losses = []
        for batch in data:
            x = _nchw(batch)
            recon = tae(x)
            recon_loss = torch.nn.functional.huber_loss(recon, x)
            taps_x = _torch_taps(t_features, x)
            taps_r = _torch_taps(t_features, recon)
            perp = sum(
                torch.nn.functional.huber_loss(r, x_.detach())
                for r, x_ in zip(taps_r, taps_x)
            )
            loss = cfg.recon_lam * recon_loss + cfg.perp_lam * perp
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tae.parameters(), cfg.grad_clip_norm)
            opt.step()
            torch_losses.append(float(loss))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
        # The curve moved — the comparison is not vacuous.
        assert abs(torch_losses[-1] - torch_losses[0]) > 1e-3

    def test_ast_training_curve_matches(self, shared_vgg):
        """~10 AST steps of the FULL Stage-2 objective, per-step losses and
        aux terms within float tolerance (reference loop: train.py:216-300)."""
        t_features, flax_vgg_params = shared_vgg
        cfg = ASTTrainConfig()
        n_steps = 10
        data = _data(13, n_steps, paired=True)

        # --- TPU build side -------------------------------------------------
        ast = AST(STRICT_CFG)
        z = jnp.zeros((1, S, S, 3))
        variables = ast.init(jax.random.PRNGKey(0), z, z, train=False)
        init_params = jax.tree.map(np.asarray, variables["params"])
        init_stats = jax.tree.map(np.asarray, variables["batch_stats"])
        vgg = VGG19Features(TAPS)
        tx = make_optimizer(cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
                            cfg.grad_clip_norm)
        state = create_train_state(
            variables["params"], variables["batch_stats"], tx
        )
        step = make_ast_train_step(ast, vgg, cfg)
        jax_hist = []
        for c, s in data:
            state, aux = step(state, flax_vgg_params, jnp.asarray(c),
                              jnp.asarray(s))
            jax_hist.append({k: float(aux[k]) for k in
                             ("content_loss", "style_loss", "lf_loss",
                              "tv_loss", "org_img_loss", "loss")})

        # --- torch repaired-reference side ----------------------------------
        tast = tref.AST(ENC_CONV_SHAPES, DECODER_CONV_SHAPES, EXPAND_RATIO)
        tref.port_ast(tast, init_params, init_stats)
        tast.train()
        opt = torch.optim.Adam(tast.parameters(), lr=cfg.lr,
                               betas=(cfg.adam_b1, cfg.adam_b2),
                               eps=cfg.adam_eps)

        def vgg_taps_fn(img):
            return _torch_taps(t_features, img)

        torch_hist = []
        for c, s in data:
            total, aux = tref.ast_loss(
                cfg, tast, vgg_taps_fn, _nchw(c), _nchw(s), 1.0
            )
            opt.zero_grad()
            total.backward()
            torch.nn.utils.clip_grad_norm_(tast.parameters(),
                                           cfg.grad_clip_norm)
            opt.step()
            torch_hist.append({k: float(v) for k, v in aux.items()})

        for key in ("content_loss", "style_loss", "lf_loss", "org_img_loss",
                    "loss"):
            # atol floor: lf_loss is ~1e-15 at init (the near-zero decoder
            # cascade, see ops/blocks SE init) — pure float noise there.
            np.testing.assert_allclose(
                [h[key] for h in jax_hist],
                [h[key] for h in torch_hist],
                rtol=5e-3, atol=1e-9, err_msg=key,
            )
        # tv_loss is tiny early in training; compare absolutely.
        np.testing.assert_allclose(
            [h["tv_loss"] for h in jax_hist],
            [h["tv_loss"] for h in torch_hist],
            rtol=5e-2, atol=1e-5, err_msg="tv_loss",
        )
        assert abs(torch_hist[-1]["loss"] - torch_hist[0]["loss"]) > 1e-3
