"""Train state pytree + optimizer assembly.

The reference keeps a torch module + a torch Adam and mutates both in place
(train.py:61, train_autoencoder.py:26).  Here the whole training state —
parameters, BatchNorm running stats, optimizer state, step — is one pytree
threaded functionally through a jitted step, so it can be sharded/replicated
with ``NamedSharding`` and checkpointed atomically with orbax.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def make_optimizer(
    lr: float,
    b1: float,
    b2: float,
    eps: float,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Adam with optional global-norm gradient clipping.

    Mirrors the reference optimizers: AST Adam(2e-4, (0.9, 0.999), eps 1e-5)
    + clip 2.0 (train.py:61,292); AE Adam(2e-4, (0.9, 0.99), eps 1e-7) +
    clip 10.0 (train_autoencoder.py:26,143).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    return optax.chain(*chain)


def create_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def global_grad_norm(grads) -> jnp.ndarray:
    return optax.global_norm(grads)


def apply_gradients_if_finite(state: TrainState, grads):
    """Apply the optimizer update only if the global gradient norm is finite.

    The reference errors on *every* step with a non-finite gradient
    (``clip_grad_norm_(..., error_if_nonfinite=True)``, train.py:292).  A
    host-side check per step would serialize dispatch behind each step's
    completion, so instead the finite check lives inside the jitted step:
    a non-finite gradient leaves parameters, optimizer state, and step
    untouched, and the returned ``ok`` flag lets the host raise at the next
    log-boundary sync — no NaN update is ever applied or checkpointed.

    Returns (new_state, grad_norm, ok).
    """
    grad_norm = optax.global_norm(grads)
    ok = jnp.isfinite(grad_norm)
    updated = state.apply_gradients(grads)

    merged_params, merged_opt, merged_step = select_tree(
        ok,
        (updated.params, updated.opt_state, updated.step),
        (state.params, state.opt_state, state.step),
    )
    new_state = updated.replace(
        params=merged_params, opt_state=merged_opt, step=merged_step
    )
    return new_state, grad_norm, ok


def select_tree(ok, new_tree, old_tree):
    """Elementwise ``where(ok, new, old)`` over a pytree.

    Used to gate every piece of mutable training state — params, optimizer
    state, step, AND BatchNorm running statistics — on the same in-step
    finite flag, so a NaN-producing forward pass can not poison anything
    that persists (a skipped step must be a full no-op)."""
    return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_tree, old_tree)
