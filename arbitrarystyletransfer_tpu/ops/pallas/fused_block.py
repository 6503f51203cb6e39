"""Fused inverted-residual block kernel (TPU Pallas) + functional decoder
runtime.

The decoder is the hot spot of 512px inference (SURVEY.md §3.3): 14
norm-free MobileNetV2-style blocks, the last 6 of which run at full
512x512 resolution with 144-240 hidden channels.  Under plain XLA each
block materializes the big expanded "hidden" tensor several times (expand
conv out, reflect-pad copy, depthwise out, SE-scaled copy) — HBM bandwidth
bound.  This kernel fuses

    pw-expand (MXU)  ->  hardswish  ->  reflect-padded depthwise (VPU,
    unrolled shifted FMAs)  ->  hardswish  ->  spatial-sum for SE

into ONE pass per spatial row-tile: the hidden tensor is written exactly
once and read exactly once (by the cheap XLA epilogue that applies the SE
gate, the pw-project matmul, and the residual add — all of which XLA fuses
around a single matmul).  Reflect padding is applied to the *input* (it
commutes with the pointwise expand), so the kernel only does static
slicing.

The runtime entry points consume the standard flax checkpoint parameter
tree — fusion is an inference-engine concern, not a training-graph concern
(blocks reference: mobilenetv2.py:95-151; decoder reference:
models.py:242-320).

STATUS (measured on TPU v5e, 512px batch 8): bit-exact vs the flax decoder,
but ~2.5x SLOWER than XLA's lowering (258 ms vs 103 ms).  The unrolled k^2
depthwise FMA chain is f32 VPU work over lane-padded channels, and XLA's
grouped-conv lowering beats it; the HBM-traffic savings don't compensate.
Kept as an optional, tested runtime path and a baseline for a future
MXU-based depthwise formulation — the default inference path remains the
XLA graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def _fused_kernel(
    xa_ref, xb_ref, xc_ref, xd_ref, we_ref, wd_ref,  # inputs
    hidden_ref, sums_ref,                            # outputs
    acc_scr,                                         # scratch
    *, th: int, tw: int, pad: int, k: int, c_in: int, c_hid: int,
    expand: bool, pre_act: bool,
):
    r = pl.program_id(1)
    c = pl.program_id(2)
    n_r = pl.num_programs(1)
    n_c = pl.num_programs(2)

    # Halo assembly: the four (row, col) neighbor blocks of the pre-padded
    # input cover rows [r*th, r*th+th+2p) x cols [c*tw, c*tw+tw+2p)
    # (th, tw >= 2*pad).
    top = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=1)
    bot = jnp.concatenate([xc_ref[0], xd_ref[0]], axis=1)
    tile = jnp.concatenate([top, bot], axis=0)[: th + 2 * pad, : tw + 2 * pad]
    if expand:
        flat = tile.reshape((th + 2 * pad) * (tw + 2 * pad), c_in)
        h = jnp.dot(flat, we_ref[:], preferred_element_type=jnp.float32)
        h = h.reshape(th + 2 * pad, tw + 2 * pad, c_hid)
    else:
        h = tile.astype(jnp.float32)
    if pre_act:
        h = _hardswish(h)
    # h stays f32: Mosaic's rotate (roll) only supports 32-bit data.

    # Depthwise kxk as unrolled shifted FMAs over the VMEM-resident tile.
    # Shifts are cyclic rolls + zero-offset (aligned) slices: Mosaic lowers
    # rolls to cheap lane/sublane rotations, whereas unaligned slices force
    # per-window relayout copies (VMEM blow-up).
    # Only k column rolls (hoisted out of the row loop); row offsets are
    # free dim-0 slices.
    out = None
    for dj in range(k):
        hj = pltpu.roll(h, (tw + 2 * pad) - dj, 1) if dj else h
        for di in range(k):
            term = hj[di : di + th, :tw, :] * wd_ref[di, dj]
            out = term if out is None else out + term
    out = _hardswish(out)

    hidden_ref[0] = out.astype(hidden_ref.dtype)

    # SE pre-reduction: accumulate the spatial sum across spatial tiles.
    part = jnp.sum(out, axis=(0, 1))  # (c_hid,)
    is_first = jnp.logical_and(r == 0, c == 0)
    is_last = jnp.logical_and(r == n_r - 1, c == n_c - 1)

    @pl.when(is_first)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[0, :] = acc_scr[0, :] + part

    @pl.when(is_last)
    def _():
        # (8, c_hid) tile shape to satisfy TPU tiling; only row 0 carries
        # the accumulated sum (the caller slices it out).
        sums_ref[0] = acc_scr[:].astype(sums_ref.dtype)


def fused_expand_dw(
    x: jnp.ndarray,
    w_expand: jnp.ndarray | None,
    w_dw: jnp.ndarray,
    kernel_size: int,
    pre_act: bool = True,
    row_tile: int | None = None,
    interpret: bool = False,
):
    """hidden = hswish(dw(hswish(x @ We))) plus its per-image channel sums.

    Args:
      x: (B, H, W, C_in) NHWC input (unpadded).
      w_expand: (C_in, C_hid) pointwise expand weights, or None (expand==1
        path: depthwise applies directly to x and ``pre_act`` is False to
        match the reference block, mobilenetv2.py:103-117).
      w_dw: (k, k, C_hid) depthwise weights.
      kernel_size: 3 or 5.
      pre_act: hardswish between expand and depthwise (True for the
        expand>1 path, mobilenetv2.py:119-139).

    Returns:
      (hidden, sums): (B, H, W, C_hid) and (B, C_hid) spatial sums.
    """
    b, h_dim, w_dim, c_in = x.shape
    k = kernel_size
    pad = (k - 1) // 2
    c_hid = w_dw.shape[-1]
    expand = w_expand is not None
    if not expand:
        assert c_hid == c_in

    # Column tile: cap the tile width so big-W layers stay in VMEM.
    tw = w_dim
    while tw > 128 or _vmem_est(8, tw, pad, c_in, c_hid, x.dtype) > _VMEM_BUDGET:
        half = tw // 2
        # Partial W blocks must be 8-aligned (TPU sublane tiling).
        if w_dim % half or half % 8 or half < max(8, 2 * pad):
            break
        tw = half

    if row_tile is None:
        # Largest row tile whose estimated working set fits the VMEM budget.
        row_tile = max(8, 2 * pad)
        for cand in (32, 16, 8):
            if cand < 2 * pad or h_dim % cand:
                continue
            if _vmem_est(cand, tw, pad, c_in, c_hid, x.dtype) <= _VMEM_BUDGET:
                row_tile = cand
                break
    th = min(row_tile, h_dim)
    while h_dim % th:
        th //= 2
    assert th >= 2 * pad and tw >= 2 * pad, (th, tw, pad)

    # Pad rows/cols to (n_tiles + 1) * tile so the +1 halo block always
    # exists; the junk tail is never part of the assembled halo window.
    n_r = h_dim // th
    n_c = w_dim // tw
    row_extra = (n_r + 1) * th - (h_dim + 2 * pad)
    col_extra = (n_c + 1) * tw - (w_dim + 2 * pad)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    xp = jnp.pad(
        xp, ((0, 0), (0, max(row_extra, 0)), (0, max(col_extra, 0)), (0, 0))
    )

    grid = (b, n_r, n_c)
    kernel = functools.partial(
        _fused_kernel,
        th=th, tw=tw, pad=pad, k=k, c_in=c_in, c_hid=c_hid,
        expand=expand, pre_act=pre_act,
    )
    we = (
        w_expand.astype(jnp.float32)
        if expand
        else jnp.zeros((c_in, c_hid), jnp.float32)
    )

    def xspec(dr, dc):
        return pl.BlockSpec(
            (1, th, tw, c_in),
            lambda bi, r, c, dr=dr, dc=dc: (bi, r + dr, c + dc, 0),
        )

    hidden, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            xspec(0, 0), xspec(0, 1), xspec(1, 0), xspec(1, 1),
            pl.BlockSpec((c_in, c_hid), lambda bi, r, c: (0, 0)),
            pl.BlockSpec((k, k, c_hid), lambda bi, r, c: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, th, tw, c_hid), lambda bi, r, c: (bi, r, c, 0)
            ),
            pl.BlockSpec((1, 8, c_hid), lambda bi, r, c: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_dim, w_dim, c_hid), x.dtype),
            jax.ShapeDtypeStruct((b, 8, c_hid), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, c_hid), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # The 16MB scoped-vmem default is a compiler knob; the lane
            # padding of low-channel tiles (C<128 occupies full 128 lanes)
            # makes the compiler's accounting ~4x the packed-byte estimate.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, xp, xp, xp, we, w_dw.astype(jnp.float32))
    return hidden, sums[:, 0, :]


_VMEM_BUDGET = 6 * 1024 * 1024


def _vmem_est(th, tw, pad, c_in, c_hid, dtype):
    """Conservative VMEM working-set estimate for one kernel invocation."""
    item = jnp.dtype(dtype).itemsize
    twp = tw + 2 * pad
    thp = th + 2 * pad
    return (
        thp * twp * c_hid * 4 * 3          # h + roll copies (f32)
        + th * tw * c_hid * 4 * 2          # dw accumulator + term
        + 4 * th * tw * c_in * item * 2    # four input blocks, 2x buffered
        + 2 * th * tw * c_hid * item       # output blocks
        + thp * twp * c_in * 4             # assembled tile
    )


# ---------------------------------------------------------------------------
# Functional decoder runtime over the flax checkpoint parameter tree
# ---------------------------------------------------------------------------


def _se_gate(sums, n_pixels, se_params):
    """SE gate from precomputed spatial sums (SELayer, mobilenetv2.py:63-81)."""
    mean = sums / n_pixels  # (B, C_hid)
    d0, d1 = se_params["Dense_0"], se_params["Dense_1"]
    y = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    y = y @ d1["kernel"] + d1["bias"]
    return jnp.clip(y, 0.0, 1.0)


def fused_block_apply(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """One norm-free DepthWiseConv block (mobilenetv2.py:95-165) through the
    fused kernel + XLA epilogue.  ``params`` is the block's flax subtree."""
    b, h, w, c_in = x.shape
    expand = expand_ratio != 1
    x = x.astype(dtype)
    w_dw = params["DepthwiseConv2D_0"]["kernel"][:, :, 0, :]
    if expand:
        w_exp = params["Conv_0"]["kernel"][0, 0]
        w_proj = params["Conv_1"]["kernel"][0, 0]
    else:
        w_exp = None
        w_proj = params["Conv_0"]["kernel"][0, 0]

    hidden, sums = fused_expand_dw(
        x, w_exp, w_dw, kernel_size, pre_act=expand, interpret=interpret
    )
    gate = _se_gate(sums, h * w, params["SELayer_0"])  # (B, C_hid)
    gated = hidden * gate[:, None, None, :].astype(hidden.dtype)
    y = jnp.einsum(
        "bhwc,cd->bhwd", gated, w_proj.astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    c_out = w_proj.shape[-1]
    if use_identity and c_in == c_out:
        y = y + x
    return y


def nearest_upsample_2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def decode_fused(
    dec_params,
    z: jnp.ndarray,
    decoder_conv_shapes,
    exporting: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """Functional fused equivalent of Decoder.__call__ (models.py:306-320),
    consuming the flax 'dec' parameter subtree of an AST/AutoEncoder
    checkpoint."""
    shapes = decoder_conv_shapes
    x = z
    for i, shape in enumerate(shapes[:-1]):
        blk = dec_params[f"decoder_blocks_{i}"]
        should_upsample = shape[0] != shape[1] and i + 6 < len(shapes)
        x = fused_block_apply(
            blk["DepthWiseConv_0"], x, shape[3], shape[4],
            interpret=interpret, dtype=dtype,
        )
        if should_upsample:
            x = nearest_upsample_2x(x)
            x = fused_block_apply(
                blk["DepthWiseConv_1"], x, 3, 1,
                interpret=interpret, dtype=dtype,
            )
    # Output head: reflect pad + 3x3 conv to RGB (models.py:300-301).
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    head = dec_params["img_out"]
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), head["kernel"].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + head["bias"]
    x = x.astype(jnp.float32)
    if exporting:
        x = jnp.clip(x, 0.0, 1.0)
    return x
