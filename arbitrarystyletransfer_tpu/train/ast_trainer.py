"""Stage-2 AST training: the full loss assembly + trainer driver.

TPU-native equivalent of the reference ASTTrainer (reference:
train.py:50-395), with the loss assembly reproduced term-for-term
(train.py:216-283; SURVEY.md §2.3):

  L = content_lam(1.25) * L_content
    + style_lam(0.5)    * L_style
    + lf_lam(1.0)       * L_localfeat
    + tv_lam(0.0006)    * TV(t_cs)
    + 1e-5 * EMD-hist(t_cs, style)
    + org_img_lam(0.5)  * L_identity
    + 1e8 * huber(t_cs, clip(stop_grad(t_cs), 0, 1))

where (with the 6 VGG taps of stylized/content/style/identity images):
  L_content  = sum_i huber(mvn(t_cs_map_i), mvn(sg(content_map_i)))
             + 0.1 * huber(mvn(t_cs), mvn(content))           [pixel space]
  L_style    = sum_i w_i * style_loss(t_cs_map_i, sg(style_map_i))
               with w = 1.0 except 0.75 (5th tap) and 0.5 (last)
             + 1.0 * style_loss(t_cs, style)                  [pixel space]
  L_identity = sum_i huber(org_out_map_i, sg(content_map_i))
             + 100 * MSE(content, org_out)
  L_localfeat= sum_i huber(mvn(t_i), mvn(sg(enc(t_cs)_i)))

Design notes (TPU-first):
  * one jitted step per (H, W) resolution bucket — the loader picks the
    bucket per batch, XLA caches one executable per static shape;
  * the four VGG passes are fused into a single 4B-batch forward;
  * the whole step (model fwd, 4-way VGG, loss, bwd, Adam) is one XLA
    program over a data-parallel mesh — gradients ride an ICI all-reduce;
  * BatchNorm semantics mirror the reference exactly: the detached encode
    runs with running averages (eval), the content-identity pass and the
    re-encode of the stylized image run in train mode and update the
    running stats (models.py:539-547, train.py:198).
"""

from __future__ import annotations

import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ASTTrainConfig, ModelConfig
from ..losses import (
    compute_hist_loss,
    compute_style_loss,
    huber_loss,
    tv_loss,
)
from ..models.ast import AST
from ..models.autoencoder import AutoEncoder
from ..models.vgg import VGG19Features, find_vgg_weights, load_torch_vgg19_state_dict
from ..ops.stats import mean_variance_norm
from ..parallel import create_mesh, replicate, shard_batch
from . import checkpoint as ckpt
from .state import TrainState, create_train_state, global_grad_norm, make_optimizer

TRAIN_DICT_KEYS = ("content_loss", "style_loss", "lf_loss", "tv_loss", "org_img_loss")


def make_ast_train_step(
    ast: AST, vgg: VGG19Features, cfg: ASTTrainConfig, debug_stats: bool = False
):
    """Build the jitted AST train step.

    ``debug_stats`` adds tensor-range diagnostics to the aux dict (the
    reference prints the same stats every 32 iters, train.py:334-336).
    """

    def train_step(state: TrainState, vgg_params, content, style):
        def loss_fn(params):
            model_vars = {"params": params, "batch_stats": state.batch_stats}
            (t_cs, (sm1, sm2), org_out), mutated = ast.apply(
                model_vars, content, style, 1.0, train=True,
                mutable=["batch_stats"],
            )
            # Re-encode the stylized image through the (train-mode) encoder;
            # gradients do not flow through this pass (the reference detaches
            # its outputs, train.py:198,277) but BN stats update.
            enc_stylized, mutated = ast.apply(
                {"params": params, "batch_stats": mutated["batch_stats"]},
                jax.lax.stop_gradient(t_cs),
                train=True,
                method=AST.reencode,
                mutable=["batch_stats"],
            )

            # One 4B-batch VGG pass: [content, style, t_cs, org_out].
            b = content.shape[0]
            stacked = jnp.concatenate([content, style, t_cs, org_out], axis=0)
            taps = vgg.apply({"params": vgg_params}, stacked)

            content_loss = 0.0
            style_loss = 0.0
            org_img_loss = 0.0
            n_taps = len(taps)
            for i, tap in enumerate(taps):
                content_map = jax.lax.stop_gradient(tap[:b])
                style_map = jax.lax.stop_gradient(tap[b : 2 * b])
                t_cs_map = tap[2 * b : 3 * b]
                org_out_map = tap[3 * b :]

                content_loss += huber_loss(
                    mean_variance_norm(t_cs_map), mean_variance_norm(content_map)
                )
                if i == n_taps - 1:
                    style_weight = 0.5
                elif i == n_taps - 2:
                    style_weight = 0.75
                else:
                    style_weight = 1.0
                style_loss += style_weight * compute_style_loss(t_cs_map, style_map)
                org_img_loss += huber_loss(org_out_map, content_map)

            # Pixel-space terms (train.py:258-271).
            content_loss += (
                huber_loss(mean_variance_norm(t_cs), mean_variance_norm(content))
                * cfg.pixel_content_weight
            )
            out_of_range_loss = (
                huber_loss(t_cs, jnp.clip(jax.lax.stop_gradient(t_cs), 0.0, 1.0))
                * cfg.out_of_range_lam
            )
            hist_loss = compute_hist_loss(t_cs, style) * cfg.hist_lam
            org_img_loss += (
                jnp.mean(jnp.square(content - org_out)) * cfg.identity_mse_weight
            )
            org_img_loss = org_img_loss * cfg.org_img_lam
            style_loss += compute_style_loss(t_cs, style) * cfg.pixel_style_weight

            # Local-feature loss: pre-decoder stylized maps vs the re-encoded
            # stylized image's own features (train.py:274-277).
            local_f_loss = 0.0
            for t_map, enc_map in zip((sm1, sm2), enc_stylized):
                local_f_loss += huber_loss(
                    mean_variance_norm(t_map),
                    mean_variance_norm(jax.lax.stop_gradient(enc_map)),
                )

            cur_tv_loss = tv_loss(t_cs)
            total = (
                cfg.content_lam * content_loss
                + cfg.style_lam * style_loss
                + cfg.lf_lam * local_f_loss
                + cfg.tv_lam * cur_tv_loss
                + hist_loss
                + org_img_loss
                + out_of_range_loss
            )
            aux = {
                "content_loss": content_loss,
                "style_loss": style_loss,
                "lf_loss": local_f_loss,
                "tv_loss": cur_tv_loss,
                "org_img_loss": org_img_loss,
                "hist_loss": hist_loss,
                "out_of_range_loss": out_of_range_loss,
                "loss": total,
            }
            if debug_stats:
                aux.update(
                    t_cs_min=jnp.min(t_cs), t_cs_max=jnp.max(t_cs),
                    sm1_max=jnp.max(jnp.abs(sm1)),
                    sm2_max=jnp.max(jnp.abs(sm2)),
                    enc_styl_max=jnp.max(jnp.abs(enc_stylized[1])),
                    org_out_min=jnp.min(org_out), org_out_max=jnp.max(org_out),
                )
            return total, (aux, mutated["batch_stats"])

        (_, (aux, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        aux["grad_norm"] = global_grad_norm(grads)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_stats)
        return state, aux

    return jax.jit(train_step, donate_argnums=(0,))


def make_stylize_fn(ast: AST):
    """Jitted alpha-interpolated inference (the preview/serve path,
    train.py:380-391)."""

    def stylize(state: TrainState, content, style, alpha):
        return ast.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            content, style, alpha,
            method=AST.stylize,
        )

    return jax.jit(stylize)


class ASTTrainer:
    """Driver mirroring the reference ASTTrainer surface
    (train.py:50-144): builds AST + frozen VGG, warm-starts from the
    Stage-1 AE checkpoint unless resuming, trains with the full loss
    assembly, saves model+optimizer+history every ``save_every`` iters, and
    renders alpha-{0, 0.5, 1} previews to files instead of a GUI."""

    def __init__(
        self,
        cfg: ASTTrainConfig,
        content_iter: Iterator[tuple[np.ndarray, np.ndarray]],
        model_cfg: ModelConfig = ModelConfig(),
        mesh=None,
        seed: int = 0,
        vgg_weights: str | None = None,
        preview_dir: str | None = None,
    ):
        self.cfg = cfg
        self.content_iter = content_iter
        self.mesh = mesh if mesh is not None else create_mesh()
        self.preview_dir = preview_dir

        self.ast = AST(model_cfg)
        self.vgg = VGG19Features(model_cfg.vgg_content_layers)

        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
        variables = self.ast.init(rng, dummy, dummy, train=False)
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
            vgg_params = self.vgg.init(jax.random.PRNGKey(1), dummy)["params"]

        self.state = replicate(self.mesh, state)
        self.vgg_params = replicate(self.mesh, vgg_params)

        self.train_step = make_ast_train_step(self.ast, self.vgg, cfg)
        self.stylize_fn = make_stylize_fn(self.ast)

        self.save_file = os.path.join(cfg.save_dir, "ast")
        self.train_dict_file = os.path.join(cfg.save_dir, "ast_train_dict.json")
        self.train_dict = {k: [] for k in TRAIN_DICT_KEYS}

        if cfg.load:
            self.load()
        elif cfg.ae_model and ckpt.checkpoint_exists(cfg.ae_model):
            self.load_ae(cfg.ae_model, model_cfg, seed)

        self.num_params = sum(
            int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params)
        )

    # -- persistence (reference: train.py:103-144) -------------------------

    def save(self):
        ckpt.save_checkpoint(self.save_file, self.state)
        ckpt.save_history(self.train_dict_file, self.train_dict)

    def load(self):
        self.state = ckpt.restore_checkpoint(self.save_file, self.state)
        if os.path.exists(self.train_dict_file):
            self.train_dict = ckpt.load_history(self.train_dict_file)

    def load_ae(self, ae_path: str, model_cfg: ModelConfig, seed: int = 0):
        """Warm-start enc/ada_out/dec from the Stage-1 AE checkpoint
        (reference: train.py:135-144)."""
        ae = AutoEncoder(model_cfg)
        dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
        ae_vars = ae.init(jax.random.PRNGKey(seed), dummy, train=False)
        ae_tx = make_optimizer(2e-4, 0.9, 0.99, 1e-7, 10.0)
        ae_state = create_train_state(
            ae_vars["params"], ae_vars.get("batch_stats", {}), ae_tx
        )
        ae_state = ckpt.restore_checkpoint(ae_path, ae_state)
        new_params, new_stats = ckpt.transplant_ae_to_ast(
            ae_state.params, ae_state.batch_stats,
            self.state.params, self.state.batch_stats,
        )
        # Fresh optimizer state over the transplanted params.
        self.state = self.state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=self.state.tx.init(new_params),
        )
        self.state = replicate(self.mesh, self.state)

    # -- previews (reference: train.py:380-395, GUI -> files) --------------

    def render_previews(self, content: np.ndarray, style: np.ndarray, step: int):
        if self.preview_dir is None:
            return
        os.makedirs(self.preview_dir, exist_ok=True)
        from PIL import Image

        c = jnp.asarray(content[:1])
        s = jnp.asarray(style[:1])
        panels = [np.asarray(c[0]), np.asarray(s[0])]
        for alpha in (0.0, 0.5, 1.0):
            out = self.stylize_fn(self.state, c, s, alpha)
            panels.append(np.asarray(out[0]))
        strip = np.concatenate(panels, axis=1)
        img = Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8))
        img.save(os.path.join(self.preview_dir, f"preview_{step:08d}.png"))

    # -- main loop (reference: train.py:146-395) ---------------------------

    def train(self, num_iters: int | None = None, log_fn=print):
        cfg = self.cfg
        iters = num_iters if num_iters is not None else cfg.train_iter
        log_fn(f"NUM AST PARAMETERS: {self.num_params}")
        last_aux = None
        for j in range(iters):
            content, style = next(self.content_iter)
            content = shard_batch(self.mesh, np.asarray(content))
            style = shard_batch(self.mesh, np.asarray(style))
            self.state, aux = self.train_step(
                self.state, self.vgg_params, content, style
            )
            last_aux = aux
            for k in TRAIN_DICT_KEYS:
                self.train_dict[k].append(float(aux[k]))

            if (j + 1) % cfg.log_every == 0:
                gn = float(aux["grad_norm"])
                if not np.isfinite(gn):
                    # error_if_nonfinite parity (train.py:292).
                    raise FloatingPointError(
                        f"non-finite gradient norm at iter {j + 1}: {gn}"
                    )
                log_fn(f"iter {j + 1}: " + " ".join(
                    f"{k}={float(aux[k]):.5f}" for k in TRAIN_DICT_KEYS
                ))
            if (j + 1) % cfg.save_every == 0:
                self.save()
                self.render_previews(np.asarray(content), np.asarray(style), j + 1)
        return last_aux
