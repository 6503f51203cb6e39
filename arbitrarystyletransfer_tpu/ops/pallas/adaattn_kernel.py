"""Fused flash-style AdaAttN attention-statistics Pallas kernels (TPU).

The AdaAttN op (reference: models.py:92-103) needs three reductions over the
style axis for every content position:

    A    = softmax(q k^T)          (unscaled logits, like the reference)
    mean = A v
    ev2  = A v^2
    std  = sqrt(relu(ev2 - mean^2))

A naive implementation materializes the (Nc, Ns) attention matrix in HBM —
at 512px inference that is a 4096x4096 f32 matrix per image, ~67MB, and the
op becomes HBM-bandwidth-bound (SURVEY.md §5 "long-context analogue").  The
forward kernel streams over style-key blocks with a running (max, sum-exp,
accumulator) online-softmax state, computing BOTH weighted moments in one
pass by concatenating v and v^2 channel-wise so a single MXU matmul per tile
yields the (block_q, 2C) contribution.  Memory is O(Nc * C); the attention
matrix never exists.

The backward is the flash-attention backward adapted to the two-moment
output.  With O = [M1, M2] = A [v, v^2] and cotangents folded to
dM = [dM1, dM2] (the sqrt/relu chain is elementwise, done outside):

    D_i  = dM_i . O_i                        (the flash "delta" row term)
    P_ij = exp(q_i k_j^T - m_i) / l_i        (recomputed blockwise)
    dS   = P .* (dM [v, v^2]^T - D)
    dq   = dS k          (accumulated over style blocks)
    dk   = dS^T q        (accumulated over content blocks)
    dv   = P^T dM1 + 2 v .* (P^T dM2)

Two backward kernels (dq; dk+dv) — the standard TPU split so each output
block is revisited only across its own sequential grid axis.  Everything is
O(Nc*C) memory; training at 512px+ no longer re-materializes the dense
attention matrix (round-1 limitation, VERDICT item 9).

Grids: innermost axis sequential on TPU so scratch accumulators carry.
C=128 matches the MXU/VPU lane width exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref,            # inputs
    mean_ref, std_ref, m_ref, l_ref,  # outputs
    m_scr, l_scr, acc_scr,          # scratch
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
        m_ref[0] = m_scr[:]
        l_ref[0] = l_scr[:]


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _block_sizes(nc: int, ns: int, block_q: int, block_k: int):
    return min(block_q, max(8, nc)), min(block_k, max(128, ns))


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _adaattn_pallas_fwd(q, k, v, block_q: int = 256, block_k: int = 512):
    """Returns (mean, std, m, l); m/l are the per-row softmax max and
    normalizer saved for the flash backward."""
    b, nc, c = q.shape
    ns = k.shape[1]
    block_q, block_k = _block_sizes(nc, ns, block_q, block_k)

    qp = _pad_to(q.astype(jnp.float32), 1, block_q)
    kp = _pad_to(k.astype(jnp.float32), 1, block_k)
    vp = _pad_to(v.astype(jnp.float32), 1, block_k)
    ncp, nsp = qp.shape[1], kp.shape[1]

    grid = (b, ncp // block_q, nsp // block_k)
    kernel = functools.partial(
        _fwd_kernel, ns_valid=ns, block_k=block_k, channels=c
    )
    mean, std, m, l = pl.pallas_call(
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
            pl.BlockSpec((1, block_q, 128), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda bi, i, j: (bi, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ncp, c), q.dtype),
            jax.ShapeDtypeStruct((b, ncp, c), q.dtype),
            jax.ShapeDtypeStruct((b, ncp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, ncp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running sum-exp
            pltpu.VMEM((block_q, 2 * c), jnp.float32),  # running moments
        ],
    )(qp, kp, vp)
    return (
        mean[:, :nc],
        std[:, :nc],
        m[:, :nc, 0],
        l[:, :nc, 0],
    )


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, dm1_ref, dm2_ref, ml_ref,  # inputs
    dq_ref,                                          # output
    acc_scr,                                         # scratch
    *, ns_valid: int, block_k: int,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dm1 = dm1_ref[0]
    dm2 = dm2_ref[0]
    m = ml_ref[0][:, 0:1]     # (BQ, 1)
    l = ml_ref[0][:, 1:2]
    d_row = ml_ref[0][:, 2:3]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < ns_valid, s, _NEG_INF)
    p = jnp.exp(s - m) / l                                  # (BQ, BK)

    t = jnp.dot(dm1, v.T, preferred_element_type=jnp.float32)
    t += jnp.dot(dm2, jnp.square(v).T, preferred_element_type=jnp.float32)
    ds = p * (t - d_row)                                    # (BQ, BK)
    acc_scr[:] += jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, dm1_ref, dm2_ref, ml_ref,  # inputs
    dk_ref, dv_ref,                                  # outputs
    dk_scr, dv_scr,                                  # scratch
    *, ns_valid: int, block_k: int,
):
    # Grid: (batch, style block j, content block i); i sequential/innermost.
    j = pl.program_id(1)
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    dm1 = dm1_ref[0]
    dm2 = dm2_ref[0]
    m = ml_ref[0][:, 0:1]
    l = ml_ref[0][:, 1:2]
    d_row = ml_ref[0][:, 2:3]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < ns_valid, s, _NEG_INF)
    p = jnp.exp(s - m) / l

    t = jnp.dot(dm1, v.T, preferred_element_type=jnp.float32)
    t += jnp.dot(dm2, jnp.square(v).T, preferred_element_type=jnp.float32)
    ds = p * (t - d_row)

    dk_scr[:] += jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
    pt_dm1 = jnp.dot(p.T, dm1, preferred_element_type=jnp.float32)
    pt_dm2 = jnp.dot(p.T, dm2, preferred_element_type=jnp.float32)
    dv_scr[:] += pt_dm1 + 2.0 * v * pt_dm2

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _adaattn_pallas_bwd(
    q, k, v, dm1, dm2, m, l, d_row, block_q: int = 256, block_k: int = 512
):
    b, nc, c = q.shape
    ns = k.shape[1]
    block_q, block_k = _block_sizes(nc, ns, block_q, block_k)

    qp = _pad_to(q.astype(jnp.float32), 1, block_q)
    kp = _pad_to(k.astype(jnp.float32), 1, block_k)
    vp = _pad_to(v.astype(jnp.float32), 1, block_k)
    dm1p = _pad_to(dm1.astype(jnp.float32), 1, block_q)
    dm2p = _pad_to(dm2.astype(jnp.float32), 1, block_q)
    # Pack (m, l, D) rows into one (b, ncp, 128) tensor; pad l with 1 to
    # avoid 0-division on padded rows (their dm rows are zero anyway).
    ml = jnp.stack([m, jnp.maximum(l, 1e-30), d_row], axis=-1)  # (b, nc, 3)
    ml = _pad_to(ml, 2, 128)
    ml = _pad_to(ml, 1, block_q)
    ml = ml.at[:, nc:, 1].set(1.0)
    ncp, nsp = qp.shape[1], kp.shape[1]

    in_specs_i = [
        pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, i, j: (bi, j, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, i, j: (bi, j, 0)),
        pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
        pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bi, i, j: (bi, i, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, ns_valid=ns, block_k=block_k),
        grid=(b, ncp // block_q, nsp // block_k),
        in_specs=in_specs_i,
        out_specs=pl.BlockSpec((1, block_q, c), lambda bi, i, j: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ncp, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, c), jnp.float32)],
    )(qp, kp, vp, dm1p, dm2p, ml)

    # dk/dv: style blocks outer, content blocks inner (sequential).
    in_specs_j = [
        pl.BlockSpec((1, block_q, c), lambda bi, j, i: (bi, i, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, j, i: (bi, j, 0)),
        pl.BlockSpec((1, block_k, c), lambda bi, j, i: (bi, j, 0)),
        pl.BlockSpec((1, block_q, c), lambda bi, j, i: (bi, i, 0)),
        pl.BlockSpec((1, block_q, c), lambda bi, j, i: (bi, i, 0)),
        pl.BlockSpec((1, block_q, 128), lambda bi, j, i: (bi, i, 0)),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, ns_valid=ns, block_k=block_k),
        grid=(b, nsp // block_k, ncp // block_q),
        in_specs=in_specs_j,
        out_specs=[
            pl.BlockSpec((1, block_k, c), lambda bi, j, i: (bi, j, 0)),
            pl.BlockSpec((1, block_k, c), lambda bi, j, i: (bi, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nsp, c), k.dtype),
            jax.ShapeDtypeStruct((b, nsp, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, c), jnp.float32),
            pltpu.VMEM((block_k, c), jnp.float32),
        ],
    )(qp, kp, vp, dm1p, dm2p, ml)
    return dq[:, :nc], dk[:, :ns], dv[:, :ns]


# ---------------------------------------------------------------------------
# custom_vjp surface
# ---------------------------------------------------------------------------


@jax.custom_vjp
def adaattn_statistics_pallas(q, k, v):
    """Fused (mean, std) attention statistics; drop-in replacement for
    :func:`arbitrarystyletransfer_tpu.models.adaattn.adaattn_statistics`.

    Forward and backward both run streaming Pallas kernels with O(Nc*C)
    memory; the (Nc, Ns) attention matrix never exists in either pass."""
    mean, std, _, _ = _adaattn_pallas_fwd(q, k, v)
    return mean, std


def _vjp_fwd(q, k, v):
    mean, std, m, l = _adaattn_pallas_fwd(q, k, v)
    return (mean, std), (q, k, v, mean, std, m, l)


def _vjp_bwd(residuals, cotangents):
    q, k, v, mean, std, m, l = residuals
    dmean, dstd = cotangents
    # Elementwise sqrt/relu chain (matches the dense path's safe_sqrt
    # zero-gradient convention at the clipped region).
    std_f = std.astype(jnp.float32)
    pos = std_f > 0
    g2 = jnp.where(pos, 0.5 * dstd.astype(jnp.float32)
                   / jnp.where(pos, std_f, 1.0), 0.0)
    mean_f = mean.astype(jnp.float32)
    dm1 = dmean.astype(jnp.float32) - 2.0 * mean_f * g2
    dm2 = g2
    ev2 = jnp.square(std_f) + jnp.square(mean_f)  # = M2 (pre-relu, clipped)
    d_row = jnp.sum(dm1 * mean_f + dm2 * ev2, axis=-1)  # (b, nc)
    dq, dk, dv = _adaattn_pallas_bwd(q, k, v, dm1, dm2, m, l, d_row)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


adaattn_statistics_pallas.defvjp(_vjp_fwd, _vjp_bwd)
