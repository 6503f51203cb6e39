"""Pallas AdaAttN kernel parity tests (interpreter mode on CPU).

The fused streaming kernel must match the dense einsum reference
bit-closely, including the tail-masking path when Nc/Ns are not multiples
of the block sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from arbitrarystyletransfer_tpu.models.adaattn import adaattn_statistics
from arbitrarystyletransfer_tpu.ops.pallas.adaattn_kernel import (
    adaattn_statistics_pallas,
)


def _setup(b, nc, ns, c, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nc, c), jnp.float32)
    k = jax.random.normal(kk, (b, ns, c), jnp.float32)
    v = jax.random.normal(kv, (b, ns, c), jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "b,nc,ns,c",
    [
        (1, 256, 256, 128),     # exact block multiples
        (2, 144, 144, 128),     # 12x12 maps (96px/8) — tail masking
        (1, 400, 300, 128),     # rectangular, uneven
        (1, 1600, 1600, 128),   # 320px/8 inference size
    ],
)
def test_matches_dense_reference(b, nc, ns, c):
    q, k, v = _setup(b, nc, ns, c)
    ref_mean, ref_std = adaattn_statistics(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        mean, std = adaattn_statistics_pallas(q, k, v)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(ref_mean), rtol=2e-4, atol=2e-5
    )
    # std suffers catastrophic cancellation near zero (ev2 ~= mean^2) in
    # both implementations; compare with a correspondingly looser atol.
    np.testing.assert_allclose(
        np.asarray(std), np.asarray(ref_std), rtol=2e-3, atol=2e-3
    )


def test_gradients_flow_through_custom_vjp():
    q, k, v = _setup(1, 64, 64, 128)

    def loss_pallas(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            mean, std = adaattn_statistics_pallas(q, k, v)
        return jnp.sum(mean * 1.5 + std)

    def loss_ref(q, k, v):
        mean, std = adaattn_statistics(q, k, v)
        return jnp.sum(mean * 1.5 + std)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-3, atol=1e-4
        )
