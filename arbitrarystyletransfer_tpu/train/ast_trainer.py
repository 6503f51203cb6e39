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
from .state import (
    TrainState,
    apply_gradients_if_finite,
    create_train_state,
    make_optimizer,
    select_tree,
)

TRAIN_DICT_KEYS = ("content_loss", "style_loss", "lf_loss", "tv_loss", "org_img_loss")


def make_ast_train_step(
    ast: AST,
    vgg: VGG19Features,
    cfg: ASTTrainConfig,
    debug_stats: bool = False,
    disc=None,
):
    """Build the jitted AST train step.

    ``debug_stats`` adds tensor-range diagnostics to the aux dict (the
    reference prints the same stats every 32 iters, train.py:334-336).

    With ``disc`` (a Discriminator module) the step becomes the opt-in
    adversarial variant (reference: train.py:160-204, the commented GAN
    experiment, intended semantics): signature
    ``step(state, dis_state, vgg_params, content, style, rng) ->
    (state, dis_state, aux)``; the generator objective gains
    ``dis_lam * BCE(D(t_cs), 1)`` and the discriminator trains on
    (real=content, fake=sg(t_cs)) with label smoothing and R1-every-8.
    Both updates use the *pre-step* discriminator parameters (simultaneous
    gradient descent) so the whole thing stays one XLA program.
    """

    def build_loss_fn(state: TrainState, vgg_params, content, style,
                      dis_state=None, rng=None):
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
            gen_adv_loss = None
            if dis_state is not None:
                # Generator fooling loss (reference train.py:202-204):
                # BCE(D(t_cs), 1), weighted by dis_lam.
                from .gan import generator_adversarial_loss

                gen_adv_loss = generator_adversarial_loss(
                    disc,
                    {"params": dis_state.params,
                     "batch_stats": dis_state.batch_stats},
                    t_cs,
                    rng,
                )
                total = total + cfg.dis_lam * gen_adv_loss
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
            if gen_adv_loss is not None:
                aux["gen_adv_loss"] = gen_adv_loss
            if debug_stats:
                aux.update(
                    t_cs_min=jnp.min(t_cs), t_cs_max=jnp.max(t_cs),
                    sm1_max=jnp.max(jnp.abs(sm1)),
                    sm2_max=jnp.max(jnp.abs(sm2)),
                    enc_styl_max=jnp.max(jnp.abs(enc_stylized[1])),
                    org_out_min=jnp.min(org_out), org_out_max=jnp.max(org_out),
                )
            return total, (aux, mutated["batch_stats"], t_cs)

        return loss_fn

    def grad_layer_stats(grads):
        # Per-parameter |grad| means, keyed by the flattened param path —
        # the reference prints exactly this for every named parameter every
        # 8 iters (train.py:294-298).  Stays on-device inside aux; the
        # trainer drains and prints it at log boundaries.
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        return {
            "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path):
                jnp.mean(jnp.abs(g))
            for path, g in flat
        }

    def train_step(state: TrainState, vgg_params, content, style):
        loss_fn = build_loss_fn(state, vgg_params, content, style)
        (_, (aux, new_stats, _)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if debug_stats:
            aux["grad_absmean"] = grad_layer_stats(grads)
        # In-step finite guard (error_if_nonfinite parity, train.py:292):
        # a non-finite gradient applies NO update; the host raises at the
        # next log-boundary drain.
        state, grad_norm, ok = apply_gradients_if_finite(state, grads)
        aux["grad_norm"] = grad_norm
        aux["finite"] = ok
        # Gate the running-stat update on the same flag: a NaN-producing
        # forward must not poison BatchNorm statistics either.
        state = state.replace(
            batch_stats=select_tree(ok, new_stats, state.batch_stats)
        )
        return state, aux

    def gan_train_step(
        state: TrainState, dis_state: TrainState, vgg_params, content, style, rng
    ):
        from .gan import discriminator_loss_terms

        rng_gen, rng_dis = jax.random.split(rng)
        loss_fn = build_loss_fn(
            state, vgg_params, content, style, dis_state=dis_state, rng=rng_gen
        )
        (_, (aux, new_stats, t_cs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if debug_stats:
            aux["grad_absmean"] = grad_layer_stats(grads)
        state, grad_norm, ok = apply_gradients_if_finite(state, grads)
        aux["grad_norm"] = grad_norm
        state = state.replace(
            batch_stats=select_tree(ok, new_stats, state.batch_stats)
        )

        # Discriminator update: real = content, fake = sg(t_cs)
        # (reference train.py:174-186, intended).
        def dis_loss_fn(dparams):
            return discriminator_loss_terms(
                disc, cfg, dparams, dis_state.batch_stats,
                content, jax.lax.stop_gradient(t_cs), rng_dis, dis_state.step,
            )

        (_, (dis_aux, dis_new_stats)), dis_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(dis_state.params)
        dis_state, dis_grad_norm, dis_ok = apply_gradients_if_finite(
            dis_state, dis_grads
        )
        # Persist D's BN running stats through the real-then-fake forward
        # sequence (torch train-mode parity, tests/test_gan_fidelity.py);
        # like the generator, a non-finite step keeps the old tree.
        dis_state = dis_state.replace(
            batch_stats=select_tree(
                dis_ok, dis_new_stats, dis_state.batch_stats
            )
        )
        aux.update(dis_aux)
        aux["dis_grad_norm"] = dis_grad_norm
        aux["finite"] = jnp.logical_and(ok, dis_ok)
        return state, dis_state, aux

    if disc is not None:
        return jax.jit(gan_train_step, donate_argnums=(0, 1))
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
        debug_stats: bool = False,
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
            # Loud fallback: random-projection perceptual losses are fine
            # for tests but not for reference-parity loss curves
            # (acquisition path: scripts/export_vgg19_weights.py).
            print(
                "WARNING: no VGG-19 weight file found — perceptual losses "
                "use seeded random init (see scripts/export_vgg19_weights.py)"
            )
            vgg_params = self.vgg.init(jax.random.PRNGKey(1), dummy)["params"]

        self.state = replicate(self.mesh, state)
        self.vgg_params = replicate(self.mesh, vgg_params)

        # Opt-in adversarial path (--use_dis): discriminator model + state.
        self.disc = None
        self.dis_state = None
        # Per-step RNG = fold_in(base, global_step): deterministic in the
        # checkpointed step counter, so a resumed --use_dis run CONTINUES
        # the dropout/R1 stream instead of replaying it from the start
        # (no RNG state needs persisting).
        self._base_rng = jax.random.PRNGKey(seed + 1)
        if cfg.use_dis:
            from ..models.mobilenetv2 import Discriminator

            self.disc = Discriminator()
            dis_vars = self.disc.init(
                {"params": jax.random.PRNGKey(seed + 2),
                 "dropout": jax.random.PRNGKey(seed + 3)},
                dummy,
                train=False,
            )
            dis_tx = make_optimizer(
                cfg.dis_lr, cfg.dis_adam_b1, cfg.dis_adam_b2, 1e-8, None
            )
            self.dis_state = replicate(self.mesh, create_train_state(
                dis_vars["params"], dis_vars.get("batch_stats", {}), dis_tx
            ))

        self.train_step = make_ast_train_step(
            self.ast, self.vgg, cfg, debug_stats=debug_stats, disc=self.disc
        )
        self.stylize_fn = make_stylize_fn(self.ast)

        self.save_file = os.path.join(cfg.save_dir, "ast")
        self.dis_save_file = os.path.join(cfg.save_dir, "ast_dis")
        self.train_dict_file = os.path.join(cfg.save_dir, "ast_train_dict.json")
        keys = TRAIN_DICT_KEYS + (("dis_loss",) if cfg.use_dis else ())
        self.train_dict = {k: [] for k in keys}
        self._history_keys = keys

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
        if self.dis_state is not None:
            ckpt.save_checkpoint(self.dis_save_file, self.dis_state)
        ckpt.save_history(self.train_dict_file, self.train_dict)

    def load(self):
        self.state = ckpt.restore_checkpoint(self.save_file, self.state)
        if self.dis_state is not None and ckpt.checkpoint_exists(
            self.dis_save_file
        ):
            self.dis_state = ckpt.restore_checkpoint(
                self.dis_save_file, self.dis_state
            )
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

    def _drain_aux(self, pending, first_iter, log_fn=None):
        """Pull buffered per-step aux to the host in ONE device sync.

        Aux stays as device arrays between log boundaries so step N+1's
        dispatch is never serialized behind step N's completion (the
        reference's per-step ``.item()`` host syncs are a single-GPU
        habit, not a TPU pipeline's).  Raises if any buffered step saw a
        non-finite gradient — that step applied no update (see
        apply_gradients_if_finite).
        """
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
            for k in self._history_keys:
                self.train_dict[k].append(float(a[k]))
        if log_fn is not None:
            last, it = drained[-1], first_iter + len(drained) - 1
            log_fn(f"iter {it}: " + " ".join(
                f"{k}={float(last[k]):.5f}" for k in self._history_keys
            ))
            # Per-parameter grad diagnostics (reference: train.py:294-298).
            for name, v in sorted(last.get("grad_absmean", {}).items()):
                log_fn(f"  grad|{name}|.mean = {float(v):.4e}")

    def train(self, num_iters: int | None = None, log_fn=print):
        cfg = self.cfg
        iters = num_iters if num_iters is not None else cfg.train_iter
        log_fn(f"NUM AST PARAMETERS: {self.num_params}")
        last_aux = None
        pending = []
        drained_through = 0
        # One sync at loop entry: the restored step anchors the RNG stream
        # (steps skipped by the finite guard don't advance it — acceptable,
        # they're exceptional and raise at the next drain anyway).
        step0 = int(jax.device_get(self.state.step)) if self.disc else 0
        for j in range(iters):
            content, style = next(self.content_iter)
            content = shard_batch(self.mesh, np.asarray(content))
            style = shard_batch(self.mesh, np.asarray(style))
            if self.disc is not None:
                step_rng = jax.random.fold_in(self._base_rng, step0 + j)
                self.state, self.dis_state, aux = self.train_step(
                    self.state, self.dis_state, self.vgg_params,
                    content, style, step_rng,
                )
            else:
                self.state, aux = self.train_step(
                    self.state, self.vgg_params, content, style
                )
            last_aux = aux
            pending.append(aux)

            log_now = (j + 1) % cfg.log_every == 0
            save_now = (j + 1) % cfg.save_every == 0
            if log_now or save_now or j + 1 == iters:
                self._drain_aux(
                    pending, drained_through + 1, log_fn if log_now else None
                )
                drained_through = j + 1
            if save_now or j + 1 == iters:
                # Drain-then-save ordering: a non-finite gradient raises
                # above, so a poisoned state is never checkpointed.  The
                # end-of-run save is additive to the reference's every-32
                # cadence (train.py:313-316) so short runs still produce a
                # loadable checkpoint.
                self.save()
                self.render_previews(np.asarray(content), np.asarray(style), j + 1)
        return last_aux
