"""Training-layer tests: jitted AE/AST steps over the virtual 8-device CPU
mesh, loss decrease on the reconstruction config (BASELINE.json config 1),
checkpoint round-trip, and the AE->AST warm-start transplant."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arbitrarystyletransfer_tpu.config import AETrainConfig, ASTTrainConfig, ModelConfig
from arbitrarystyletransfer_tpu.models import AST, AutoEncoder, VGG19Features
from arbitrarystyletransfer_tpu.parallel import create_mesh, replicate, shard_batch
from arbitrarystyletransfer_tpu.train import (
    checkpoint as ckpt,
    create_train_state,
    make_ae_train_step,
    make_ast_train_step,
    make_optimizer,
    make_stylize_fn,
)


pytestmark = pytest.mark.slow

S = 32  # tiny resolution: encoder /8 -> 4x4 taps; VGG taps down to 2x2


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


@pytest.fixture(scope="module")
def vgg_setup():
    vgg = VGG19Features()
    params = vgg.init(jax.random.PRNGKey(1), jnp.zeros((1, S, S, 3)))["params"]
    return vgg, params


def _batch(rng, n=8):
    return rng.uniform(0.0, 1.0, (n, S, S, 3)).astype(np.float32)


class TestAETrainStep:
    @pytest.fixture(scope="class")
    def ae_state(self):
        ae = AutoEncoder()
        variables = ae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False
        )
        cfg = AETrainConfig()
        tx = make_optimizer(
            cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps, cfg.grad_clip_norm
        )
        return ae, create_train_state(
            variables["params"], variables["batch_stats"], tx
        )

    def test_loss_decreases_and_stats_update(self, ae_state, vgg_setup, mesh, rng):
        ae, state = ae_state
        vgg, vgg_params = vgg_setup
        cfg = AETrainConfig()
        step = make_ae_train_step(ae, vgg, cfg)
        stats_before = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        state = replicate(mesh, state)
        vgg_params = replicate(mesh, vgg_params)
        batch = shard_batch(mesh, _batch(rng))
        losses = []
        for _ in range(12):
            state, aux, _ = step(state, vgg_params, batch)
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 12
        # BatchNorm running stats were updated by the train-mode passes.
        stats_after = np.asarray(jax.tree.leaves(state.batch_stats)[0])
        assert not np.allclose(stats_before, stats_after)


class TestASTTrainStep:
    @pytest.fixture(scope="class")
    def ast_state(self):
        ast = AST()
        z = jnp.zeros((1, S, S, 3))
        variables = ast.init(jax.random.PRNGKey(0), z, z, train=False)
        cfg = ASTTrainConfig()
        tx = make_optimizer(
            cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps, cfg.grad_clip_norm
        )
        state = create_train_state(
            variables["params"], variables["batch_stats"], tx
        )
        # Materialize to host so each test gets fresh device buffers
        # (donated steps would otherwise delete shared fixture arrays).
        return ast, jax.tree.map(np.asarray, state)

    def test_step_runs_and_is_finite(self, ast_state, vgg_setup, mesh, rng):
        ast, state = ast_state
        vgg, vgg_params = vgg_setup
        step = make_ast_train_step(ast, vgg, ASTTrainConfig())
        state = replicate(mesh, state)
        content = shard_batch(mesh, _batch(rng))
        style = shard_batch(mesh, _batch(rng))
        state, aux = step(state, replicate(mesh, vgg_params), content, style)
        for k in ("content_loss", "style_loss", "lf_loss", "tv_loss",
                  "org_img_loss", "loss", "grad_norm"):
            assert np.isfinite(float(aux[k])), (k, aux[k])
        assert int(state.step) == 1

    def test_stylize_fn(self, ast_state, mesh, rng):
        ast, state = ast_state
        stylize = make_stylize_fn(ast)
        c = jnp.asarray(_batch(rng, 1))
        s = jnp.asarray(_batch(rng, 1))
        out = stylize(replicate(mesh, state), c, s, 0.5)
        assert out.shape == (1, S, S, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestGANEndToEnd:
    """Opt-in adversarial path (--use_dis): generator fooling loss +
    discriminator step + discriminator checkpointing, end to end
    (reference: train.py:160-204, the commented GAN experiment)."""

    def test_both_losses_move_and_dis_checkpoints(self, tmp_path, rng):
        from arbitrarystyletransfer_tpu.train.ast_trainer import ASTTrainer

        def data_iter():
            while True:
                yield _batch(rng, 8), _batch(rng, 8)

        cfg = ASTTrainConfig(
            use_dis=True, save_dir=str(tmp_path), save_every=4, log_every=2,
            ae_model="",
        )
        trainer = ASTTrainer(cfg, data_iter(), seed=0)
        assert trainer.disc is not None and trainer.dis_state is not None
        aux = trainer.train(num_iters=4, log_fn=lambda *_: None)
        assert np.isfinite(float(aux["gen_adv_loss"]))
        assert np.isfinite(float(aux["dis_loss"]))
        # Both networks actually updated.
        assert int(trainer.state.step) == 4
        assert int(trainer.dis_state.step) == 4
        # dis_loss history recorded and moving.
        dl = trainer.train_dict["dis_loss"]
        assert len(dl) == 4 and len(set(dl)) > 1
        # Discriminator checkpoint written alongside the AST one.
        assert ckpt.checkpoint_exists(trainer.save_file)
        assert ckpt.checkpoint_exists(trainer.dis_save_file)
        # Reload round-trips the discriminator state.
        cfg2 = ASTTrainConfig(
            use_dis=True, save_dir=str(tmp_path), load=True, ae_model="",
        )
        trainer2 = ASTTrainer(cfg2, data_iter(), seed=0)
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(trainer.dis_state.params)[0]),
            np.asarray(jax.tree.leaves(trainer2.dis_state.params)[0]),
        )


class TestFiniteGuard:
    """Every-step non-finite protection (reference train.py:292
    error_if_nonfinite): a NaN gradient must apply NO update, and the
    trainer loop must raise at its next drain."""

    def test_apply_gradients_if_finite_skips_nan(self):
        from arbitrarystyletransfer_tpu.train.state import (
            apply_gradients_if_finite,
        )

        tx = make_optimizer(1e-2, 0.9, 0.999, 1e-8, 1.0)
        params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
        state = create_train_state(params, {}, tx)

        good = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.5)}
        state2, gn, ok = jax.jit(apply_gradients_if_finite)(state, good)
        assert bool(ok) and np.isfinite(float(gn))
        assert not np.allclose(np.asarray(state2.params["w"]), 1.0)
        assert int(state2.step) == 1

        bad = {"w": jnp.full((4, 4), np.nan), "b": jnp.full((4,), 0.5)}
        state3, gn, ok = jax.jit(apply_gradients_if_finite)(state2, bad)
        assert not bool(ok)
        # No leaf of params/opt_state/step moved.
        for a, b in zip(jax.tree.leaves(state2.params), jax.tree.leaves(state3.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state2.opt_state), jax.tree.leaves(state3.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(state3.step) == 1

    def test_ae_step_nan_batch_applies_no_update(self, vgg_setup, mesh, rng):
        ae = AutoEncoder()
        variables = ae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False
        )
        cfg = AETrainConfig()
        tx = make_optimizer(
            cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps, cfg.grad_clip_norm
        )
        state = create_train_state(
            variables["params"], variables["batch_stats"], tx
        )
        params_before = jax.tree.map(np.asarray, state.params)
        vgg, vgg_params = vgg_setup
        step = make_ae_train_step(ae, vgg, cfg)
        state = replicate(mesh, state)
        poisoned = _batch(rng)
        poisoned[0, 0, 0, 0] = np.nan
        state, aux, _ = step(
            state, replicate(mesh, vgg_params), shard_batch(mesh, poisoned)
        )
        assert not bool(aux["finite"])
        for a, b in zip(
            jax.tree.leaves(params_before), jax.tree.leaves(state.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trainer_drain_raises_on_nonfinite(self):
        from arbitrarystyletransfer_tpu.train.ast_trainer import ASTTrainer

        trainer = ASTTrainer.__new__(ASTTrainer)  # drain logic only
        trainer.train_dict = {k: [] for k in (
            "content_loss", "style_loss", "lf_loss", "tv_loss", "org_img_loss"
        )}
        trainer._history_keys = tuple(trainer.train_dict)
        good = {k: jnp.asarray(1.0) for k in trainer.train_dict}
        good.update(finite=jnp.asarray(True), grad_norm=jnp.asarray(1.0))
        bad = dict(good, finite=jnp.asarray(False), grad_norm=jnp.asarray(np.nan))
        with pytest.raises(FloatingPointError, match="iter 2"):
            trainer._drain_aux([good, bad], first_iter=1)
        # The good step before the poisoned one was still recorded.
        assert len(trainer.train_dict["content_loss"]) == 1


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        ae = AutoEncoder()
        variables = ae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False
        )
        tx = make_optimizer(1e-3, 0.9, 0.99, 1e-7, 10.0)
        state = create_train_state(
            variables["params"], variables["batch_stats"], tx
        )
        path = str(tmp_path / "ae_ckpt")
        ckpt.save_checkpoint(path, state)
        assert ckpt.checkpoint_exists(path)

        # Restore into a differently-initialized state.
        variables2 = ae.init(
            jax.random.PRNGKey(7), jnp.zeros((1, S, S, 3)), train=False
        )
        state2 = create_train_state(
            variables2["params"], variables2["batch_stats"], tx
        )
        restored = ckpt.restore_checkpoint(path, state2)
        l1 = jax.tree.leaves(state.params)[0]
        l2 = jax.tree.leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    def test_history_roundtrip(self, tmp_path):
        hist = {"train_loss": [1.0, 0.5], "val_loss": [], "perp_loss": [0.1]}
        p = str(tmp_path / "train_dict.json")
        ckpt.save_history(p, hist)
        assert ckpt.load_history(p) == hist


class TestTransplant:
    def test_ae_to_ast_maps_submodules(self):
        ae = AutoEncoder()
        ast = AST()
        z = jnp.zeros((1, S, S, 3))
        ae_vars = ae.init(jax.random.PRNGKey(3), z, train=False)
        ast_vars = ast.init(jax.random.PRNGKey(4), z, z, train=False)

        new_params, new_stats = ckpt.transplant_ae_to_ast(
            ae_vars["params"], ae_vars["batch_stats"],
            ast_vars["params"], ast_vars["batch_stats"],
        )
        # Transplanted submodules match the AE exactly...
        for ae_key, ast_key in (("encoder", "enc"), ("ada_out", "ada_out"),
                                ("decoder", "dec")):
            a = jax.tree.leaves(ae_vars["params"][ae_key])
            b = jax.tree.leaves(new_params[ast_key])
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # ...while the AdaAttN modules keep their fresh init.
        for x, y in zip(
            jax.tree.leaves(ast_vars["params"]["ada_att_1"]),
            jax.tree.leaves(new_params["ada_att_1"]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_transplanted_ast_runs(self):
        ae = AutoEncoder()
        ast = AST()
        z = jnp.zeros((1, S, S, 3))
        ae_vars = ae.init(jax.random.PRNGKey(3), z, train=False)
        ast_vars = ast.init(jax.random.PRNGKey(4), z, z, train=False)
        new_params, new_stats = ckpt.transplant_ae_to_ast(
            ae_vars["params"], ae_vars["batch_stats"],
            ast_vars["params"], ast_vars["batch_stats"],
        )
        out = ast.apply(
            {"params": new_params, "batch_stats": new_stats},
            z, z, method=AST.export,
        )
        assert out.shape == (1, S, S, 3)
