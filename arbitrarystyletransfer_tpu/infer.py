"""Inference / serving pipeline.

The reference's "serve" path is the exporting forward (reference:
models.py:479-480,528-529) and the alpha-blended preview (train.py:380-391).
This module wraps both as a jitted, mesh-sharded, batched stylization API —
the surface the 512px multi-style benchmark (BASELINE.json configs 2 and 5)
drives.

TPU-first details:
  * one compiled executable per (batch, H, W) bucket — call shapes should be
    padded to a small set of buckets by the caller;
  * batches are sharded over the data axis of the mesh, so a v5e-8 serves
    8-way batch-parallel from one python process;
  * the AdaAttN attention statistics run the fused Pallas kernel when
    ``ModelConfig.use_pallas_adaattn`` is set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models.ast import AST
from .parallel import create_mesh, replicate, shard_batch
from .train import checkpoint as ckpt
from .train.state import create_train_state, make_optimizer


class StylePipeline:
    """Batched alpha-interpolated stylization over a device mesh."""

    def __init__(
        self,
        model_cfg: ModelConfig = ModelConfig(),
        mesh=None,
        seed=0,
        engine: str = "flax",
        decoder_impl: str = "fused",
        encoder_impl: str = "fused",
    ):
        """``engine="fused"`` routes stylize() through the fused Pallas
        inference engine (engine.py) — requires the running-stats encoder
        semantics (``encoder_eval_stats=True``; the engine always folds BN
        running statistics).  Constructing a fused pipeline with the default
        batch-stats config raises: a checkpoint trained under
        ``encoder_eval_stats=False`` would silently get different encoder
        normalization through the fused engine than through the flax graph.

        ``decoder_impl`` / ``encoder_impl`` select the fused engine's
        high-resolution block kernels ("fused" | "mega" | "flat" — see
        engine.stylize_fused)."""
        if engine == "fused" and not model_cfg.encoder_eval_stats:
            raise ValueError(
                "engine='fused' folds BatchNorm running statistics "
                "(encoder_eval_stats=True semantics), but this ModelConfig "
                "has encoder_eval_stats=False (batch-stats inference, the "
                "training default).  A checkpoint trained under the default "
                "would be served with different encoder math.  Either use "
                "engine='flax', or — if the checkpoint was trained/validated "
                "with eval-stats semantics — construct the pipeline with "
                "dataclasses.replace(cfg, encoder_eval_stats=True)."
            )
        self.cfg = model_cfg
        self.mesh = mesh if mesh is not None else create_mesh()
        self.ast = AST(model_cfg)
        dummy = jnp.zeros((1, 96, 96, 3), jnp.float32)
        variables = self.ast.init(
            jax.random.PRNGKey(seed), dummy, dummy, train=False
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self._put_vars()

        if engine == "fused":
            from .engine import stylize_fused, stylize_fused_sharded

            dtype = model_cfg.jnp_compute_dtype() or jnp.float32

            def _stylize(params, batch_stats, content, style, alpha):
                variables = {"params": params, "batch_stats": batch_stats}
                if content.shape[0] % self.mesh.size == 0:
                    # shard_map pins per-device execution: no GSPMD
                    # collectives around the opaque pallas calls (see
                    # engine.stylize_fused_sharded).
                    return stylize_fused_sharded(
                        variables, content, style, alpha,
                        mesh=self.mesh, cfg=self.cfg, dtype=dtype,
                        decoder_impl=decoder_impl,
                        encoder_impl=encoder_impl,
                    )
                return stylize_fused(
                    variables, content, style, alpha, cfg=self.cfg,
                    dtype=dtype, decoder_impl=decoder_impl,
                    encoder_impl=encoder_impl,
                )
        else:

            def _stylize(params, batch_stats, content, style, alpha):
                return self.ast.apply(
                    {"params": params, "batch_stats": batch_stats},
                    content, style, alpha,
                    method=AST.stylize,
                )

        def _export(params, batch_stats, content, style):
            return self.ast.apply(
                {"params": params, "batch_stats": batch_stats},
                content, style,
                method=AST.export,
            )

        self._stylize = jax.jit(_stylize)
        self._export = jax.jit(_export)

    def _put_vars(self):
        self.params = replicate(self.mesh, self.params)
        self.batch_stats = replicate(self.mesh, self.batch_stats)

    # -- weights -----------------------------------------------------------

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        model_cfg: ModelConfig = ModelConfig(),
        mesh=None,
        engine: str = "flax",
        decoder_impl: str = "fused",
        encoder_impl: str = "fused",
        recalibrate_with=None,
        allow_unstable: bool = False,
    ) -> "StylePipeline":
        """Load a checkpoint into a serving pipeline.

        ``recalibrate_with``: an iterable of NHWC image batches.  When
        given (and the config is the batch-stats training default), the
        encoder's BN running statistics are REBUILT from those batches
        (train/recalibrate.py) and the pipeline is constructed with
        eval-stats semantics — this is the supported route from a
        default-trained checkpoint to the fused engine, which folds
        running statistics and otherwise refuses the combination.

        ``allow_unstable``: a recalibration whose measured eval/batch
        drift is non-finite (the activations themselves overflow under
        eval-stats encoding) normally raises, matching the plain fused
        constructor's refusal; pass True to downgrade that to a warning
        and serve anyway (outputs remain clamped by the export head)."""
        if recalibrate_with is not None and not model_cfg.encoder_eval_stats:
            import dataclasses
            import warnings

            from .train.recalibrate import (
                EVAL_DRIFT_SAFE,
                eval_stats_drift,
                recalibrate_encoder_stats,
            )

            loader = cls(model_cfg, mesh=mesh, engine="flax")
            params, batch_stats = loader._restore(path)
            all_batches = [jnp.asarray(b) for b in recalibrate_with]
            # Hold out batches for the drift check so it is not validated
            # on the same data the statistics were built from (in-sample
            # validation understates drift).  With too few batches to
            # spare, fall back to in-sample and say so in the warning.
            if len(all_batches) >= 8:
                recal_batches = all_batches[:-2]
                drift_batches, in_sample = all_batches[-2:], False
            else:
                recal_batches = all_batches
                drift_batches, in_sample = all_batches[:4], True
            new_stats = dict(batch_stats)
            new_stats["enc"] = recalibrate_encoder_stats(
                params["enc"], batch_stats["enc"], recal_batches,
                model_cfg,
            )
            # Eval-stability is a property of the weights, not the stats
            # (see recalibrate.py): validate before serving folded BN.
            drift = eval_stats_drift(
                params["enc"], new_stats["enc"], drift_batches,
                model_cfg,
            )
            if not np.isfinite(drift) and not allow_unstable:
                # The plain fused constructor refuses the eval-stats hazard
                # outright; a provably-broken recalibration (NaN/overflow
                # activations) must not downgrade that refusal to a warning.
                raise ValueError(
                    f"recalibrated checkpoint drifts {drift} between "
                    "eval-stats and batch-stats encoding — the folded "
                    "engine would serve non-finite outputs.  Serve with "
                    "engine='flax', train with encoder_eval_stats=True "
                    "(reference parity), or pass allow_unstable=True to "
                    "serve the clamped outputs anyway."
                )
            if not np.isfinite(drift) or drift > EVAL_DRIFT_SAFE:
                warnings.warn(
                    f"recalibrated checkpoint drifts {drift:.3g} (relative "
                    "Frobenius at the deepest tap"
                    + (", measured in-sample" if in_sample else "")
                    + f") > EVAL_DRIFT_SAFE={EVAL_DRIFT_SAFE} between "
                    "eval-stats and batch-stats encoding — its BN chain "
                    "amplifies the eval/batch residual, so the fused engine "
                    "may not reproduce the training-validated graph.  Serve "
                    "with engine='flax', or train with "
                    "encoder_eval_stats=True (reference parity).",
                    stacklevel=2,
                )
            pipe = cls(
                dataclasses.replace(model_cfg, encoder_eval_stats=True),
                mesh=mesh, engine=engine,
                decoder_impl=decoder_impl, encoder_impl=encoder_impl,
            )
            pipe.load_state(params, new_stats)
            return pipe
        pipe = cls(model_cfg, mesh=mesh, engine=engine,
                   decoder_impl=decoder_impl, encoder_impl=encoder_impl)
        pipe.load_state(*pipe._restore(path))
        return pipe

    def _restore(self, path: str):
        """(params, batch_stats) from a trainer-layout checkpoint.

        Restores through a throwaway TrainState so the checkpoint layout is
        shared with the trainers; the optimizer state is skipped (ours
        would not match the trainer's optax chain)."""
        tx = make_optimizer(1e-4, 0.9, 0.999, 1e-5)
        state = create_train_state(self.params, self.batch_stats, tx)
        state = ckpt.restore_checkpoint(path, state, with_opt_state=False)
        return state.params, state.batch_stats

    def load_state(self, params, batch_stats):
        self.params = params
        self.batch_stats = batch_stats
        self._put_vars()

    # -- inference ---------------------------------------------------------

    def stylize(self, content, style, alpha: float = 1.0):
        """Alpha-interpolated stylization of an NHWC batch in [0, 1]."""
        content = shard_batch(self.mesh, jnp.asarray(content))
        style = shard_batch(self.mesh, jnp.asarray(style))
        return self._stylize(self.params, self.batch_stats, content, style, alpha)

    def export_forward(self, content, style):
        """The reference's exporting path: clamped stylization, no blend."""
        content = shard_batch(self.mesh, jnp.asarray(content))
        style = shard_batch(self.mesh, jnp.asarray(style))
        return self._export(self.params, self.batch_stats, content, style)
