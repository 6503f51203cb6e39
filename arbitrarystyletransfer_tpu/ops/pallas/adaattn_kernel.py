"""Fused flash-style AdaAttN attention-statistics Pallas kernel (TPU).

The AdaAttN op (reference: models.py:92-103) needs three reductions over the
style axis for every content position:

    A    = softmax(q k^T)          (unscaled logits, like the reference)
    mean = A v
    ev2  = A v^2
    std  = sqrt(relu(ev2 - mean^2))

A naive implementation materializes the (Nc, Ns) attention matrix in HBM —
at 512px inference that is a 4096x4096 f32 matrix per image, ~67MB, and the
op becomes HBM-bandwidth-bound (SURVEY.md §5 "long-context analogue").  This
kernel streams over style-key blocks with a running (max, sum-exp,
accumulator) online-softmax state, computing BOTH weighted moments in one
pass by concatenating v and v^2 channel-wise so a single MXU matmul per tile
yields the (block_q, 2C) contribution.  Memory is O(Nc * C); the attention
matrix never exists.

Grid: (batch, Nc/BQ, Ns/BK), innermost axis sequential on TPU so the scratch
accumulators carry across style blocks.  C=128 matches the MXU/VPU lane
width exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _adaattn_kernel(
    q_ref, k_ref, v_ref,  # inputs
    mean_ref, std_ref,    # outputs
    m_scr, l_scr, acc_scr,  # scratch
    *, ns_valid: int, block_k: int, channels: int,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]          # (BQ, C)
    k = k_ref[0]          # (BK, C)
    v = v_ref[0]          # (BK, C)

    # Unscaled logits (reference applies softmax directly to q k^T).
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)

    # Mask padded style positions (tail block when Ns % BK != 0).
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < ns_valid, s, _NEG_INF)

    m_prev = m_scr[:, :1]                       # (BQ, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp(m_prev - m_new)              # (BQ, 1)
    p = jnp.exp(s - m_new)                      # (BQ, BK)

    l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)

    # One matmul produces both weighted moments: p @ [v, v^2].
    v_cat = jnp.concatenate([v, jnp.square(v)], axis=-1)  # (BK, 2C)
    pv = jnp.dot(p, v_cat, preferred_element_type=jnp.float32)  # (BQ, 2C)
    acc_new = acc_scr[:] * corr + pv

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc_new

    @pl.when(j == nk - 1)
    def _finalize():
        inv_l = 1.0 / l_scr[:, :1]
        mean = acc_scr[:, :channels] * inv_l
        ev2 = acc_scr[:, channels:] * inv_l
        mean_ref[0] = mean.astype(mean_ref.dtype)
        std_ref[0] = jnp.sqrt(
            jnp.maximum(ev2 - jnp.square(mean), 0.0)
        ).astype(std_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _adaattn_pallas_fwd(q, k, v, block_q: int = 256, block_k: int = 512):
    b, nc, c = q.shape
    ns = k.shape[1]
    block_q = min(block_q, max(8, nc))
    block_k = min(block_k, max(128, ns))

    qp = _pad_to(q.astype(jnp.float32), 1, block_q)
    kp = _pad_to(k.astype(jnp.float32), 1, block_k)
    vp = _pad_to(v.astype(jnp.float32), 1, block_k)
    ncp, nsp = qp.shape[1], kp.shape[1]

    grid = (b, ncp // block_q, nsp // block_k)
    kernel = functools.partial(
        _adaattn_kernel, ns_valid=ns, block_k=block_k, channels=c
    )
    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, i, j: (bi, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ncp, c), q.dtype),
            jax.ShapeDtypeStruct((b, ncp, c), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum-exp
            pltpu.VMEM((block_q, 2 * c), jnp.float32),  # running moments
        ],
    )(qp, kp, vp)
    return mean[:, :nc], std[:, :nc]


@jax.custom_vjp
def adaattn_statistics_pallas(q, k, v):
    """Fused (mean, std) attention statistics; drop-in replacement for
    :func:`arbitrarystyletransfer_tpu.models.adaattn.adaattn_statistics`.

    Forward runs the streaming Pallas kernel.  The backward pass recomputes
    the attention with the dense einsum formulation (flash-style backward is
    future work), so training with the Pallas path pays the O(Nc*Ns) memory
    only in the backward.
    """
    return _adaattn_pallas_fwd(q, k, v)


def _fwd(q, k, v):
    return _adaattn_pallas_fwd(q, k, v), (q, k, v)


def _bwd(residuals, cotangents):
    from ...models.adaattn import adaattn_statistics

    q, k, v = residuals
    _, vjp = jax.vjp(adaattn_statistics, q, k, v)
    return vjp(cotangents)


adaattn_statistics_pallas.defvjp(_fwd, _bwd)
