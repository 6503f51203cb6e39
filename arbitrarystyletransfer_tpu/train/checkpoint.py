"""Checkpointing, loss-history persistence, and the AE->AST warm-start.

TPU-native equivalent of the reference's persistence layer (SURVEY.md §3.4):
  * ``torch.save({model, optim})``  ->  orbax atomic checkpoint of the whole
    TrainState pytree (preemption-safe, async-capable, multi-host-aware);
  * JSON loss-history sidecar with the same dict-of-lists contract
    (reference: train.py:82-89,113-115; train_autoencoder.py:32-36,58-60);
  * Stage-1 -> Stage-2 warm-start transplant mapping
    ae.encoder -> ast.enc, ae.ada_out -> ast.ada_out, ae.decoder -> ast.dec
    (reference: train.py:135-144), as a pure pytree edit.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


# ---------------------------------------------------------------------------
# Orbax pytree checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state) -> None:
    """Atomically save {params, batch_stats, opt_state, step} at ``path``."""
    path = os.path.abspath(path)
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state, with_opt_state: bool = True):
    """Restore into an abstract-shaped copy of ``state`` (same treedef).

    ``with_opt_state=False`` restores only params/batch_stats/step — used
    when the consumer's optimizer differs from the trainer's (e.g. the
    inference pipeline), where the opt_state treedefs would mismatch.
    """
    path = os.path.abspath(path)
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }
    if with_opt_state:
        target["opt_state"] = state.opt_state
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
    ckptr = ocp.StandardCheckpointer()
    if with_opt_state:
        restored = ckptr.restore(path, abstract)
    else:
        # Partial restore: pull only the requested subtrees.
        restored = ocp.PyTreeCheckpointer().restore(
            path,
            restore_args=jax.tree.map(
                lambda a: ocp.ArrayRestoreArgs(dtype=a.dtype), abstract
            ),
            transforms={},
            item=abstract,
        )
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"] if with_opt_state else state.opt_state,
        step=restored["step"],
    )


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))


# ---------------------------------------------------------------------------
# JSON loss-history sidecar (same contract as the reference)
# ---------------------------------------------------------------------------


def save_history(path: str, history: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(history, f)
    os.replace(tmp, path)


def load_history(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# AE -> AST warm-start transplant (reference: train.py:135-144)
# ---------------------------------------------------------------------------

_AE_TO_AST = {"encoder": "enc", "ada_out": "ada_out", "decoder": "dec"}


def transplant_ae_to_ast(
    ae_params: Any, ae_batch_stats: Any, ast_params: Any, ast_batch_stats: Any
):
    """Copy AE encoder/ada_out/decoder subtrees into an AST param tree.

    Pure pytree edit — the AST's AdaAttN modules keep their fresh init, the
    three shared submodules take the pretrained Stage-1 weights, exactly
    mirroring the reference's state-dict surgery.
    """
    new_params = dict(ast_params)
    new_stats = dict(ast_batch_stats) if ast_batch_stats else {}
    for ae_key, ast_key in _AE_TO_AST.items():
        if ae_key in ae_params:
            new_params[ast_key] = ae_params[ae_key]
        if ae_batch_stats and ae_key in ae_batch_stats:
            new_stats[ast_key] = ae_batch_stats[ae_key]
    return new_params, new_stats
