"""Stage-1 autoencoder reconstruction pretraining.

TPU-native equivalent of the reference AutoencoderTrainer
(reference: train_autoencoder.py:17-179):

  loss = recon_lam(100) * Huber(recon, x)
       + perp_lam(0.01) * sum_i Huber(VGG_i(recon), stop_grad(VGG_i(x)))

Adam(2e-4, betas (0.9, 0.99), eps 1e-7), global-norm clip 10.0, save every
32 iters, single-batch L1 validation every 64 (train_autoencoder.py:74-104),
JSON loss history with the reference's key contract
{train_loss, val_loss, perp_loss}.

Design: one jitted pure train step over a data-parallel mesh — batch sharded
on the leading axis, state replicated, gradient all-reduce inserted by XLA.
The two VGG passes (x and recon) are batched into one 2B forward for MXU
efficiency.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AETrainConfig, ModelConfig
from ..losses import huber_loss
from ..models.autoencoder import AutoEncoder
from ..models.vgg import VGG19Features, find_vgg_weights, load_torch_vgg19_state_dict
from ..parallel import batch_sharding, create_mesh, replicate, shard_batch
from . import checkpoint as ckpt
from .state import (
    TrainState,
    apply_gradients_if_finite,
    create_train_state,
    make_optimizer,
    select_tree,
)


def make_ae_train_step(ae: AutoEncoder, vgg: VGG19Features, cfg: AETrainConfig):
    """Build the jitted AE train step (pure function of state + batch)."""

    def train_step(state: TrainState, vgg_params, batch):
        def loss_fn(params):
            recon, mutated = ae.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
            )
            recon_loss = huber_loss(recon, batch)
            # One 2B-batch VGG pass instead of two B-batch passes.
            both = jnp.concatenate([batch, recon], axis=0)
            taps = vgg.apply({"params": vgg_params}, both)
            b = batch.shape[0]
            perp_loss = 0.0
            for tap in taps:
                content_map = jax.lax.stop_gradient(tap[:b])
                recon_map = tap[b:]
                perp_loss += huber_loss(recon_map, content_map)
            total = cfg.recon_lam * recon_loss + cfg.perp_lam * perp_loss
            aux = {
                "train_loss": recon_loss,
                "perp_loss": perp_loss,
                "loss": total,
            }
            return total, (aux, mutated["batch_stats"], recon)

        (_, (aux, new_stats, recon)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        # In-step finite guard: non-finite gradients apply no update (see
        # state.apply_gradients_if_finite; reference train_autoencoder.py:143
        # clips without error_if_nonfinite, but a skipped update dominates a
        # silently-poisoned one).
        state, grad_norm, ok = apply_gradients_if_finite(state, grads)
        aux["grad_norm"] = grad_norm
        aux["finite"] = ok
        # Gate running stats on the same flag — a skipped step is a full
        # no-op (no BN-stat poisoning from a NaN forward).
        state = state.replace(
            batch_stats=select_tree(ok, new_stats, state.batch_stats)
        )
        return state, aux, recon

    return jax.jit(train_step, donate_argnums=(0,))


def make_ae_eval_step(ae: AutoEncoder):
    def eval_step(state: TrainState, batch):
        recon = ae.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )
        return jnp.mean(jnp.abs(batch - recon))

    return jax.jit(eval_step)


class AutoencoderTrainer:
    """Driver mirroring the reference trainer's __init__/train/save/load
    surface (train_autoencoder.py:17-148)."""

    def __init__(
        self,
        cfg: AETrainConfig,
        content_iter: Iterator[np.ndarray],
        val_loader: Iterator[np.ndarray] | None = None,
        model_cfg: ModelConfig = ModelConfig(),
        mesh=None,
        seed: int = 0,
        vgg_weights: str | None = None,
    ):
        self.cfg = cfg
        self.content_iter = content_iter
        self.val_loader = val_loader
        self.mesh = mesh if mesh is not None else create_mesh()

        self.model = AutoEncoder(model_cfg)
        self.vgg = VGG19Features(model_cfg.vgg_content_layers)

        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, cfg.ae_imsize, cfg.ae_imsize, 3), jnp.float32)
        variables = self.model.init(rng, dummy, train=False)
        tx = make_optimizer(
            cfg.lr, cfg.adam_b1, cfg.adam_b2, cfg.adam_eps, cfg.grad_clip_norm
        )
        state = create_train_state(
            variables["params"], variables.get("batch_stats", {}), tx
        )

        vgg_path = vgg_weights or find_vgg_weights()
        if vgg_path:
            vgg_params = load_torch_vgg19_state_dict(vgg_path)
        else:
            # Loud fallback (see ASTTrainer; scripts/export_vgg19_weights.py
            # is the acquisition path for the real ImageNet weights).
            print(
                "WARNING: no VGG-19 weight file found — perceptual losses "
                "use seeded random init (see scripts/export_vgg19_weights.py)"
            )
            vgg_params = self.vgg.init(jax.random.PRNGKey(1), dummy)["params"]

        # Replicate over the mesh; XLA all-reduces grads over its data axis.
        self.state = replicate(self.mesh, state)
        self.vgg_params = replicate(self.mesh, vgg_params)

        self.train_step = make_ae_train_step(self.model, self.vgg, cfg)
        self.eval_step = make_ae_eval_step(self.model)

        self.save_file = os.path.join(cfg.save_dir, "ae")
        self.train_dict_file = os.path.join(cfg.save_dir, "train_dict.json")
        self.train_dict = {"train_loss": [], "val_loss": [], "perp_loss": []}

        if cfg.load:
            self.load()

        self.num_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )

    # -- persistence (reference: train_autoencoder.py:46-72) ---------------

    def save(self):
        ckpt.save_checkpoint(self.save_file, self.state)
        ckpt.save_history(self.train_dict_file, self.train_dict)

    def load(self):
        self.state = ckpt.restore_checkpoint(self.save_file, self.state)
        if os.path.exists(self.train_dict_file):
            self.train_dict = ckpt.load_history(self.train_dict_file)

    # -- validation (reference: train_autoencoder.py:74-86) ----------------

    def validate(self):
        if self.val_loader is None:
            return None
        val_imgs = shard_batch(self.mesh, np.asarray(next(self.val_loader)))
        val_l1 = float(self.eval_step(self.state, val_imgs))
        # Reference divides the already-mean L1 by the batch size
        # (train_autoencoder.py:84); preserved for history-curve parity.
        self.train_dict["val_loss"].append(val_l1 / val_imgs.shape[0])
        return val_l1

    # -- latent utilities (reference: train_autoencoder.py:150-179) --------

    def get_distr(self, num_samples: int = 16):
        """Mean latent over ``num_samples`` batches (reference get_distr,
        train_autoencoder.py:150-166): sum of per-image final-block latents
        divided by batch_size * num_samples, then summed over the batch
        axis — preserved verbatim for parity."""
        encode = jax.jit(
            lambda state, x: self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x, train=False, method=type(self.model).encode_latent,
            )
        )
        enc_sum = None
        for _ in range(num_samples):
            batch = shard_batch(self.mesh, np.asarray(next(self.content_iter)))
            z = encode(self.state, batch)
            s = jnp.sum(z, axis=0)
            enc_sum = s if enc_sum is None else enc_sum + s
        return jnp.sum(enc_sum / (self.cfg.batch_size * num_samples), axis=0)

    def interpolate(self, img_1, img_2, alpha: float = 0.5):
        """Latent interpolation demo (reference: train_autoencoder.py:168-179):
        decode(alpha * enc(img_1) + (1 - alpha) * enc(img_2))."""
        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        z1 = self.model.apply(
            variables, jnp.asarray(img_1), train=False,
            method=type(self.model).encode_latent,
        )
        z2 = self.model.apply(
            variables, jnp.asarray(img_2), train=False,
            method=type(self.model).encode_latent,
        )
        z = alpha * z1 + (1.0 - alpha) * z2
        return self.model.apply(
            variables, z, method=type(self.model).decode_latent
        )

    # -- main loop (reference: train_autoencoder.py:88-148) ----------------

    def _drain_aux(self, pending, first_iter):
        """One host sync for all buffered per-step aux (see
        ASTTrainer._drain_aux for rationale); raises on any buffered
        non-finite gradient — whose update was already skipped in-step."""
        if not pending:
            return
        drained = jax.device_get(pending)
        pending.clear()
        for i, a in enumerate(drained):
            if not bool(a["finite"]):
                raise FloatingPointError(
                    f"non-finite gradient norm at iter {first_iter + i}: "
                    f"{a['grad_norm']} (update was skipped, not applied)"
                )
            self.train_dict["train_loss"].append(float(a["train_loss"]))
            self.train_dict["perp_loss"].append(float(a["perp_loss"]))
        return drained[-1]

    def train(self, num_iters: int | None = None, log_fn=print):
        cfg = self.cfg
        iters = num_iters if num_iters is not None else cfg.train_iter
        log_fn(f"NUM AutoEncoder PARAMETERS: {self.num_params}")
        last_aux = None
        pending = []
        drained_through = 0
        for cur_iter in range(iters):
            batch = shard_batch(self.mesh, np.asarray(next(self.content_iter)))
            self.state, aux, _ = self.train_step(
                self.state, self.vgg_params, batch
            )
            last_aux = aux
            pending.append(aux)

            if (cur_iter + 1) % cfg.save_every == 0 or cur_iter + 1 == iters:
                last = self._drain_aux(pending, drained_through + 1)
                drained_through = cur_iter + 1
                log_fn(
                    f"iter {cur_iter + 1}: recon_loss "
                    f"{float(last['train_loss']) * cfg.recon_lam:.6f} "
                    f"perp_loss {float(last['perp_loss']) * cfg.perp_lam:.6f}"
                )
            if (cur_iter + 1) % cfg.save_every == 0 or cur_iter + 1 == iters:
                # End-of-run save is additive to the reference's every-32
                # cadence (train_autoencoder.py:92-104): short runs still
                # produce a loadable checkpoint.
                self.save()
                if (cur_iter + 1) % cfg.validate_every == 0:
                    self.validate()
        return last_aux
