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
