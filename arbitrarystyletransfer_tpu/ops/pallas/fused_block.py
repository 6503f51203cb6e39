"""Fused inverted-residual block kernel (TPU Pallas) + functional decoder
runtime.

The conv stacks are the hot spot of 512px inference (SURVEY.md §3.3): the
decoder's last 6 blocks and the encoder's first 2 run at full 512x512
resolution with 96-240 hidden channels.  Under plain XLA each block
materializes the big expanded "hidden" tensor several times (expand conv
out, reflect-pad copy, depthwise out, SE-scaled copy) and — much worse —
lowers the depthwise k x k conv as a *dense* grouped convolution, spending
k^2*C^2 MACs per pixel instead of k^2*C (measured: the k5/160-240-channel
decoder tail alone costs ~1.7 TFLOP per 512px image, ~8.5 ms of MXU time).

This kernel ("phase A") fuses

    pw-expand (MXU, bf16)  ->  [+bias]  ->  hardswish  ->  reflect-padded
    depthwise (VPU, k column rolls + row slices, f32)  ->  [+bias]  ->
    hardswish  ->  spatial-sum for SE

into ONE pass per row-tile: the hidden tensor is written exactly once (in
bf16) and read exactly once by the cheap XLA epilogue ("phase B"): gate
multiply + projection matmul + bias + residual, which XLA fuses into one
pass over the hidden.  "sums" / "project" modes implement the two-pass
variant (hidden never in HBM) — measured slower here, see
fused_block_apply_2pass.

Design notes (v2 — the round-1 kernel was 2.5x slower than XLA because it
tiled both spatial dims with a 4-block halo and rolled f32 over narrow
tiles; see git history):
  * Row-only tiling: each grid step sees the full padded width, so the
    halo needs only TWO overlapping row-block reads and the lane dimension
    stays wide.
  * Hidden channels prefer a SINGLE full-width chunk (block dim == array
    dim is Mosaic-legal at any 8-multiple, and avoids padded HBM traffic
    for 144/160/240-channel blocks); exact 128-lane chunks only when the
    f32 tile would blow the VMEM budget.  Zero-padded channel tails stay
    zero through the whole block (zero We columns -> hswish(0)=0 -> zero
    dw -> zero), so padded hidden feeds the epilogue directly with
    zero-padded SE/proj weights — no slicing on the hot path.
  * Optional per-channel biases after the expand and depthwise stages let
    the caller fold BatchNorm running statistics into the conv weights
    (encoder inference, reference enc.eval() semantics, models.py:539-547),
    making the encoder the same norm-free program as the decoder.
  * f32 inside (Mosaic's roll supports 32-bit data only); bf16 I/O and
    bf16 expand matmul (f32 accumulation).

Blocks reference: mobilenetv2.py:95-181; decoder reference:
models.py:242-320.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _fused_kernel(
    *refs,
    th: int, w_out: int, wp: int, pad: int, k: int, c_in: int,
    expand: bool, pre_act: bool, w_valid: int, h_valid: int,
    mode: str, identity: bool,
):
    # Three modes share the expand->dw->hswish core:
    #   "hidden":  outputs (hidden, sums)       [phase A + XLA epilogue]
    #   "sums":    outputs (sums,)              [pass 1 of the 2-pass block]
    #   "project": inputs +(gate, wp); outputs (y,)  [pass 2: recompute
    #              hidden, gate, project, residual — hidden never in HBM]
    if mode == "project":
        (xa_ref, xb_ref, we_ref, wd_ref, be_ref, bd_ref, g_ref, wp_ref,
         y_ref) = refs
    elif mode == "sums":
        xa_ref, xb_ref, we_ref, wd_ref, be_ref, bd_ref, sums_ref, acc_scr = refs
    else:
        (xa_ref, xb_ref, we_ref, wd_ref, be_ref, bd_ref, hidden_ref,
         sums_ref, acc_scr) = refs

    r = pl.program_id(2)
    n_r = pl.num_programs(2)

    # Halo assembly: rows [r*th, r*th + th + 2*pad) of the pre-padded input
    # come from the two consecutive th-row blocks (th >= 2*pad).
    tile = jnp.concatenate([xa_ref[0], xb_ref[0]], axis=0)[: th + 2 * pad]
    if expand:
        # bf16 x bf16 -> f32 accumulate: full-rate MXU.
        flat = tile.reshape((th + 2 * pad) * wp, c_in)
        h = jnp.dot(flat, we_ref[:], preferred_element_type=jnp.float32)
        h = h.reshape(th + 2 * pad, wp, we_ref.shape[-1])
    else:
        h = tile.astype(jnp.float32)
    h = h + be_ref[0]
    if pre_act:
        h = _hardswish(h)

    # Depthwise kxk: k column rolls (hoisted), k row slices each.  Rolls are
    # cyclic lane/sublane rotations — cheap in Mosaic — and the wrap region
    # (columns >= wp - dj) never lands inside [0, w_out) because
    # wp >= w_out + 2*pad.
    out = None
    for dj in range(k):
        hj = pltpu.roll(h, wp - dj, 1) if dj else h
        for di in range(k):
            term = hj[di : di + th, :w_out, :] * wd_ref[di, dj]
            out = term if out is None else out + term
    out = out + bd_ref[0]
    out = _hardswish(out)

    if mode == "project":
        # Gate + project on the VMEM-resident hidden; match the XLA
        # epilogue's rounding: gate multiply in the hidden dtype (bf16),
        # f32 matmul accumulation, cast, then residual add.
        gated = out.astype(y_ref.dtype) * g_ref[0, 0].astype(y_ref.dtype)
        c_out = wp_ref.shape[-1]
        y = jnp.dot(
            gated.reshape(th * w_out, gated.shape[-1]), wp_ref[:],
            preferred_element_type=jnp.float32,
        ).reshape(th, w_out, c_out).astype(y_ref.dtype)
        if identity:
            y = y + tile[pad : pad + th, pad : pad + w_out, :]
        y_ref[0] = y
        return

    if mode == "hidden":
        hidden_ref[0] = out.astype(hidden_ref.dtype)

    # SE pre-reduction, masking padded rows/cols so the spatial sum is
    # exact for non-multiple-of-tile shapes.
    if w_out != w_valid:
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        out = jnp.where(col < w_valid, out, 0.0)
    if h_valid < n_r * th:
        row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) + r * th
        out = jnp.where(row < h_valid, out, 0.0)
    part = jnp.sum(out, axis=(0, 1))  # (chunk,)

    @pl.when(r == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    acc_scr[0, :] = acc_scr[0, :] + part

    @pl.when(r == n_r - 1)
    def _():
        # (8, chunk) tile to satisfy TPU tiling; row 0 carries the sum.
        sums_ref[0] = acc_scr[:].astype(sums_ref.dtype)


def fused_expand_dw(
    x: jnp.ndarray,
    w_expand: jnp.ndarray | None,
    w_dw: jnp.ndarray,
    kernel_size: int,
    pre_act: bool = True,
    row_tile: int | None = None,
    interpret: bool = False,
    b_expand: jnp.ndarray | None = None,
    b_dw: jnp.ndarray | None = None,
    out_dtype=None,
    mode: str = "hidden",
    gate: jnp.ndarray | None = None,
    w_proj: jnp.ndarray | None = None,
    identity: bool = False,
):
    """hidden = hswish(dw(hswish(x @ We + be)) + bd) plus its channel sums.

    Modes (see _fused_kernel): "hidden" returns (hidden, sums); "sums"
    returns only the SE channel sums (no hidden written to HBM);
    "project" takes a precomputed SE ``gate`` (B, C_hid_padded) and
    ``w_proj`` (C_hid_padded, C_out), recomputes the hidden tile in VMEM,
    and returns the gated projection y (+ residual when ``identity``) —
    the hidden tensor never touches HBM across the sums+project pair.

    Args:
      x: (B, H, W, C_in) NHWC input (unpadded).
      w_expand: (C_in, C_hid) pointwise expand weights, or None (expand==1
        path: depthwise applies directly to x and ``pre_act`` is False to
        match the reference block, mobilenetv2.py:103-117).
      w_dw: (k, k, C_hid) depthwise weights.
      kernel_size: 3 or 5 (stride 1 only).
      pre_act: hardswish between expand and depthwise (True for the
        expand>1 path, mobilenetv2.py:119-139).
      b_expand / b_dw: optional (C_hid,) biases added after the expand /
        depthwise stage (BatchNorm folding; zero when absent).
      out_dtype: hidden dtype (defaults to x.dtype).

    Returns:
      (hidden, sums): (B, H, W, C_hid_padded) and (B, C_hid_padded) exact
      spatial sums.  C_hid is zero-padded up to the 128-lane chunk grid;
      padded channels are exactly zero (see module docstring), so callers
      can keep everything padded through the SE/projection epilogue.
    """
    b, h_dim, w_dim, c_in = x.shape
    k = kernel_size
    pad = (k - 1) // 2
    c_hid = w_dw.shape[-1]
    expand = w_expand is not None
    if not expand:
        assert c_hid == c_in, (c_hid, c_in)

    w_out = _round_up(w_dim, 8)
    wp = max(_round_up(w_dim + 2 * pad, 8), w_out + 2 * pad)

    # Hidden-channel chunking policy.  A single chunk equal to the full
    # (8-aligned) channel dim is always Mosaic-legal (block dim == array
    # dim) and avoids both padded HBM traffic and extra grid steps; fall
    # back to exact 128-lane chunks (Mosaic: block minor dims divisible by
    # 128 or equal to the array dim) only when the f32 hidden tile would
    # not leave room for a decent row tile.  VPU cost is identical either
    # way (lanes pad to 128-multiples in VMEM regardless).
    def vmem_est(th_, lanes):
        return (
            (th_ + 2 * pad) * wp * lanes * 4 * 2   # h + roll copy (f32)
            + th_ * w_out * lanes * 4               # dw accumulator
            + th_ * w_out * lanes * 2 * 2           # hidden out, 2x buffered
        )

    single = _round_up(c_hid, 8)
    if vmem_est(16, _round_up(single, 128)) <= _VMEM_BUDGET:
        n_chunk, chunk = 1, single
    else:
        n_chunk = -(-c_hid // 128)
        chunk = 128 if n_chunk > 1 else single
    c_pad = n_chunk * chunk
    if not expand:
        assert n_chunk == 1, "expand==1 path supports one channel chunk"
    if mode == "project":
        assert n_chunk == 1, "project mode needs a single channel chunk"

    # Row tile: multiple of 8, >= 2*pad; the biggest that fits the budget
    # (fewer grid steps amortize the halo recompute and per-step overhead).
    if row_tile is None:
        lanes = _round_up(chunk, 128)
        row_tile = 8
        for cand in (48, 32, 24, 16):
            if vmem_est(cand, lanes) <= _VMEM_BUDGET:
                row_tile = cand
                break
    th = max(8, min(row_tile, _round_up(h_dim, 8)))
    n_r = -(-h_dim // th)

    # Pre-pad: reflect for the conv halo, then zeros out to the tile grid
    # ((n_r + 1) row blocks so the r+1 halo block always exists).
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    xp = jnp.pad(
        xp,
        (
            (0, 0),
            (0, (n_r + 1) * th - (h_dim + 2 * pad)),
            (0, wp - (w_dim + 2 * pad)),
            (0, 0),
        ),
    )

    f32 = jnp.float32
    if expand:
        # Expand weights in the compute dtype: bf16 inputs hit the MXU at
        # full rate (accumulation stays f32 via preferred_element_type).
        we = w_expand.astype(x.dtype)
        we = jnp.pad(we, ((0, 0), (0, c_pad - c_hid)))
    else:
        we = jnp.zeros((c_in, c_pad), x.dtype)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, c_pad - c_hid)))
    wd = jnp.pad(w_dw.astype(f32), ((0, 0), (0, 0), (0, c_pad - c_hid)))
    be = jnp.zeros((1, c_pad), f32) if b_expand is None else jnp.pad(
        b_expand.astype(f32), (0, c_pad - c_hid)
    ).reshape(1, c_pad)
    bd = jnp.zeros((1, c_pad), f32) if b_dw is None else jnp.pad(
        b_dw.astype(f32), (0, c_pad - c_hid)
    ).reshape(1, c_pad)

    x_ch = c_in if expand else chunk
    x_ci = (lambda bi, ci, r, dr: (bi, r + dr, 0, 0)) if expand else (
        lambda bi, ci, r, dr: (bi, r + dr, 0, ci)
    )

    grid = (b, n_chunk, n_r)
    kernel = functools.partial(
        _fused_kernel,
        th=th, w_out=w_out, wp=wp, pad=pad, k=k, c_in=x_ch,
        expand=expand, pre_act=pre_act, w_valid=w_dim,
        h_valid=h_dim, mode=mode, identity=identity,
    )
    out_dtype = out_dtype or x.dtype
    in_specs = [
        pl.BlockSpec(
            (1, th, wp, x_ch),
            lambda bi, ci, r: x_ci(bi, ci, r, 0),
        ),
        pl.BlockSpec(
            (1, th, wp, x_ch),
            lambda bi, ci, r: x_ci(bi, ci, r, 1),
        ),
        pl.BlockSpec((c_in if expand else 1, chunk),
                     lambda bi, ci, r: (0, ci)),
        pl.BlockSpec((k, k, chunk), lambda bi, ci, r: (0, 0, ci)),
        pl.BlockSpec((1, chunk), lambda bi, ci, r: (0, ci)),
        pl.BlockSpec((1, chunk), lambda bi, ci, r: (0, ci)),
    ]
    inputs = [
        xp, xp,
        we if expand else we[:1],  # dummy single-row block when unused
        wd, be, bd,
    ]
    sums_spec = pl.BlockSpec((1, 8, chunk), lambda bi, ci, r: (bi, 0, ci))
    sums_shape = jax.ShapeDtypeStruct((b, 8, c_pad), jnp.float32)
    sums_scratch = pltpu.VMEM((8, chunk), jnp.float32)
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=120 * 1024 * 1024,
    )

    if mode == "project":
        c_out = w_proj.shape[-1]
        gp = jnp.pad(gate.astype(jnp.float32), ((0, 0), (0, c_pad - gate.shape[-1])))
        # (B, 8, c_pad) so the block's second-minor dim is tile-legal
        # (rows beyond 0 are padding; the kernel reads row 0).
        gp = jnp.broadcast_to(gp[:, None, :], (gp.shape[0], 8, c_pad))
        wpk = jnp.pad(
            w_proj.astype(x.dtype), ((0, c_pad - w_proj.shape[0]), (0, 0))
        )
        in_specs += [
            pl.BlockSpec((1, 8, chunk), lambda bi, ci, r: (bi, 0, ci)),
            pl.BlockSpec((chunk, c_out), lambda bi, ci, r: (ci, 0)),
        ]
        inputs += [gp, wpk]
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, th, w_out, c_out), lambda bi, ci, r: (bi, r, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (b, n_r * th, w_out, c_out), out_dtype
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(*inputs)
        if n_r * th != h_dim or w_out != w_dim:
            y = y[:, :h_dim, :w_dim]
        return y

    if mode == "sums":
        sums = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=sums_spec,
            out_shape=sums_shape,
            scratch_shapes=[sums_scratch],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*inputs)
        return sums[:, 0, :]

    hidden, sums = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, th, w_out, chunk), lambda bi, ci, r: (bi, r, 0, ci)),
            sums_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_r * th, w_out, c_pad), out_dtype),
            sums_shape,
        ],
        scratch_shapes=[sums_scratch],
        compiler_params=compiler_params,
        interpret=interpret,
    )(*inputs)
    if n_r * th != h_dim or w_out != w_dim:
        hidden = hidden[:, :h_dim, :w_dim]
    return hidden, sums[:, 0, :]


# The attached chip reports >=120MB of usable VMEM (probed empirically with
# scratch allocations); 64MB of working set leaves room for the compiler's
# own buffers and the double-buffered DMA windows.
_VMEM_BUDGET = 64 * 1024 * 1024


# ---------------------------------------------------------------------------
# BatchNorm folding (inference: running statistics, enc.eval() semantics)
# ---------------------------------------------------------------------------


def bn_fold(bn_params, bn_stats, eps: float = 1e-5):
    """(scale, bias) folding BatchNorm running stats into the preceding
    conv: BN(y) = y * a + c with a = gamma/sqrt(var+eps),
    c = beta - mean * a (torch BatchNorm2d eval semantics)."""
    a = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + eps)
    c = bn_params["bias"] - bn_stats["mean"] * a
    return a, c


# ---------------------------------------------------------------------------
# Functional block / decoder / encoder runtime over flax parameter trees
# ---------------------------------------------------------------------------


def _se_gate(sums, n_pixels, se_params, c_pad: int):
    """SE gate from precomputed spatial sums (SELayer, mobilenetv2.py:63-81),
    zero-padded to the kernel's chunked channel count."""
    c_hid = se_params["Dense_0"]["kernel"].shape[0]
    mean = sums[:, :c_hid] / n_pixels  # (B, C_hid)
    d0, d1 = se_params["Dense_0"], se_params["Dense_1"]
    y = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    y = y @ d1["kernel"] + d1["bias"]
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.pad(y, ((0, 0), (0, c_pad - c_hid)))


def fused_block_apply(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """One DepthWiseConv block (mobilenetv2.py:95-165) through the fused
    phase-A kernel + gate-folded phase-B epilogue.

    ``params`` is the block's flax subtree; ``stats`` its 'batch_stats'
    subtree when the block has BatchNorm (encoder) — running statistics are
    folded into the conv weights (reference enc.eval() inference semantics,
    models.py:539-547).  Stride-1 blocks only.
    """
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

    b_exp = b_dw = None
    proj_scale = proj_bias = None
    if stats is not None:
        if expand:
            a0, c0 = bn_fold(params["BatchNorm2D_0"], stats["BatchNorm2D_0"])
            a1, c1 = bn_fold(params["BatchNorm2D_1"], stats["BatchNorm2D_1"])
            a2, c2 = bn_fold(params["BatchNorm2D_2"], stats["BatchNorm2D_2"])
            w_exp = w_exp * a0[None, :]
            b_exp = c0
        else:
            a1, c1 = bn_fold(params["BatchNorm2D_0"], stats["BatchNorm2D_0"])
            a2, c2 = bn_fold(params["BatchNorm2D_1"], stats["BatchNorm2D_1"])
        w_dw = w_dw * a1[None, None, :]
        b_dw = c1
        proj_scale, proj_bias = a2, c2

    hidden, sums = fused_expand_dw(
        x, None if w_exp is None else w_exp, w_dw, kernel_size,
        pre_act=expand, interpret=interpret, b_expand=b_exp, b_dw=b_dw,
    )
    c_pad = hidden.shape[-1]
    gate = _se_gate(sums, h * w, params["SELayer_0"], c_pad)  # (B, c_pad)

    wp = w_proj
    if proj_scale is not None:
        wp = wp * proj_scale[None, :]
    wp = jnp.pad(wp, ((0, c_pad - wp.shape[0]), (0, 0))).astype(dtype)
    # Gate + project: XLA fuses the channelwise gate multiply into the
    # matmul prologue, so this is one pass over `hidden`.
    gated = hidden * gate[:, None, None, :].astype(hidden.dtype)
    y = jnp.einsum(
        "bhwc,cd->bhwd", gated, wp, preferred_element_type=jnp.float32
    )
    if proj_bias is not None:
        y = y + proj_bias
    y = y.astype(dtype)
    c_out = w_proj.shape[-1]
    if use_identity and c_in == c_out:
        y = y + x
    return y


def fused_block_apply_2pass(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """Two-pass DepthWiseConv block: sums pass, then recompute + in-kernel
    gated projection + residual.  Pays the depthwise twice on the VPU but
    the hidden tensor never touches HBM — the right trade where the
    hidden round-trip dominates (low-kernel-count blocks at high
    resolution; see block_apply for the measured dispatch policy)."""
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

    b_exp = b_dw = None
    proj_scale = proj_bias = None
    if stats is not None:
        if expand:
            a0, c0 = bn_fold(params["BatchNorm2D_0"], stats["BatchNorm2D_0"])
            a1, c1 = bn_fold(params["BatchNorm2D_1"], stats["BatchNorm2D_1"])
            a2, c2 = bn_fold(params["BatchNorm2D_2"], stats["BatchNorm2D_2"])
            w_exp = w_exp * a0[None, :]
            b_exp = c0
        else:
            a1, c1 = bn_fold(params["BatchNorm2D_0"], stats["BatchNorm2D_0"])
            a2, c2 = bn_fold(params["BatchNorm2D_1"], stats["BatchNorm2D_1"])
        w_dw = w_dw * a1[None, None, :]
        b_dw = c1
        proj_scale, proj_bias = a2, c2

    common = dict(
        kernel_size=kernel_size, pre_act=expand, interpret=interpret,
        b_expand=b_exp, b_dw=b_dw,
    )
    sums = fused_expand_dw(
        x, None if w_exp is None else w_exp, w_dw, mode="sums", **common
    )
    c_pad = sums.shape[-1]
    gate = _se_gate(sums, h * w, params["SELayer_0"], c_pad)

    wp = w_proj
    if proj_scale is not None:
        wp = wp * proj_scale[None, :]
    c_out = w_proj.shape[-1]
    identity = use_identity and c_in == c_out and proj_bias is None
    y = fused_expand_dw(
        x, None if w_exp is None else w_exp, w_dw, mode="project",
        gate=gate, w_proj=wp, identity=identity, **common,
    )
    if proj_bias is not None:
        y = (y.astype(jnp.float32) + proj_bias).astype(dtype)
        if use_identity and c_in == c_out:
            y = y + x
    return y


def xla_block_apply(
    params, x, kernel_size: int, stride: int, expand_ratio: int,
    use_identity: bool = True, stats=None, dtype=jnp.bfloat16,
):
    """Functional XLA composition of a DepthWiseConv block with folded BN.

    Used where the fused kernel loses or does not apply (measured per-block
    A/B on the v5e): the encoder's stride-2 blocks, all blocks at < 128px
    resolution, and the expand==1 smoothing blocks."""
    k = kernel_size
    pad = (k - 1) // 2
    b, h, w, c_in = x.shape
    x = x.astype(dtype)
    expand = expand_ratio != 1
    w_dw = params["DepthwiseConv2D_0"]["kernel"]
    if expand:
        w_exp = params["Conv_0"]["kernel"][0, 0]
        w_proj = params["Conv_1"]["kernel"][0, 0]
        bn_names = ("BatchNorm2D_0", "BatchNorm2D_1", "BatchNorm2D_2")
    else:
        w_exp = None
        w_proj = params["Conv_0"]["kernel"][0, 0]
        bn_names = (None, "BatchNorm2D_0", "BatchNorm2D_1")
    b_exp = b_dw = proj_scale = proj_bias = None
    if stats is not None:
        if expand:
            a0, c0 = bn_fold(params[bn_names[0]], stats[bn_names[0]])
            w_exp = w_exp * a0[None, :]
            b_exp = c0
        a1, c1 = bn_fold(params[bn_names[1]], stats[bn_names[1]])
        a2, c2 = bn_fold(params[bn_names[2]], stats[bn_names[2]])
        w_dw = w_dw * a1[None, None, None, :]
        b_dw = c1
        proj_scale, proj_bias = a2, c2

    if expand:
        hid = jnp.einsum("bhwc,cd->bhwd", x, w_exp.astype(dtype),
                         preferred_element_type=jnp.float32)
        if b_exp is not None:
            hid = hid + b_exp
        hid = _hardswish(hid).astype(dtype)
    else:
        hid = x
    hid = jnp.pad(hid, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                  mode="reflect")
    c_hid = w_dw.shape[-1]
    out = jax.lax.conv_general_dilated(
        hid, w_dw.astype(dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c_hid,
    )
    if b_dw is not None:
        out = out + b_dw
    out = _hardswish(out.astype(jnp.float32)).astype(dtype)
    # SE
    mean = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
    d0, d1 = params["SELayer_0"]["Dense_0"], params["SELayer_0"]["Dense_1"]
    g = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    g = jnp.clip(g @ d1["kernel"] + d1["bias"], 0.0, 1.0)
    wp = w_proj
    if proj_scale is not None:
        wp = wp * proj_scale[None, :]
    gated = out * g[:, None, None, :].astype(out.dtype)
    y = jnp.einsum("bhwc,cd->bhwd", gated, wp.astype(dtype),
                   preferred_element_type=jnp.float32)
    if proj_bias is not None:
        y = y + proj_bias
    y = y.astype(dtype)
    if use_identity and stride == 1 and c_in == w_proj.shape[-1]:
        y = y + x
    return y


def nearest_upsample_2x(x):
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def upsample_smooth_apply(params, x, dtype=jnp.bfloat16):
    """Nearest-x2 upsample + 3x3 expand==1 smoothing block, phase-folded.

    The decoder follows every nearest x2 upsample with a DepthWiseConv
    smoothing block (models.py:251-255: dw 3x3 -> hswish -> SE -> pw ->
    +identity).  A 3x3 depthwise conv over a nearest-upsampled map only
    ever sees 2x2 distinct source pixels per output, so the upsample+dw
    pair folds into FOUR phase-wise 2x2 depthwise convs at the LOW
    resolution (weights summed per phase:
      out[2i+a, 2j+b] = sum_uv x[i+u-1, j+v-1] * w'[a,b][u,v],
      w'[a][u] = {a=0: w[0] at u=0, w[1]+w[2] at u=1;
                  a=1: w[0]+w[1] at u=0, w[2] at u=1}  (per axis)
    ), with EDGE padding of x reproducing the reference's reflect padding
    of the upsampled map (U[-1]=U[1]=x[0]; U[2H]=U[2H-2]=x[H-1]).  The
    hswish / SE gate / projection / identity are per-pixel, so the whole
    block runs at low resolution per phase and interleaves once at the
    end: 2.25x fewer dw FLOPs and all intermediates at quarter area.
    """
    b, h, w, c = x.shape
    x = x.astype(dtype)
    w_dw = params["DepthwiseConv2D_0"]["kernel"][:, :, 0, :]  # (3, 3, C)
    w_proj = params["Conv_0"]["kernel"][0, 0]

    # Per-axis phase folding: rows of the 2-tap phase kernels.
    def fold(wk):  # (3, ...) -> {0: (2, ...), 1: (2, ...)}
        return {
            0: jnp.stack([wk[0], wk[1] + wk[2]]),
            1: jnp.stack([wk[0] + wk[1], wk[2]]),
        }

    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    row_f = fold(w_dw)                       # over di
    phases = {}
    sums = 0.0
    for a in (0, 1):
        col_f = fold(row_f[a])               # over dj -> (2, 2, C)
        for bb in (0, 1):
            wab = col_f[bb].astype(dtype)    # (2, 2, C)
            # Phase (a, b) taps sit at source offsets {a-1, a} x {b-1, b}
            # relative to (i, j); xe is 1-padded, so slice from (a+u, b+v).
            acc = None
            for u in (0, 1):
                for v in (0, 1):
                    term = (
                        xe[:, a + u : a + u + h, bb + v : bb + v + w, :]
                        * wab[u, v]
                    )
                    acc = term if acc is None else acc + term
            ph = _hardswish(acc.astype(jnp.float32))
            sums = sums + jnp.sum(ph, axis=(1, 2))
            phases[(a, bb)] = ph.astype(dtype)

    # SE gate over the full (2h x 2w) upsampled map == mean of phase sums.
    d0, d1 = params["SELayer_0"]["Dense_0"], params["SELayer_0"]["Dense_1"]
    mean = sums / (4.0 * h * w)
    g = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    g = jnp.clip(g @ d1["kernel"] + d1["bias"], 0.0, 1.0)
    gate = g[:, None, None, :].astype(dtype)

    outs = {}
    for key, ph in phases.items():
        y = jnp.einsum(
            "bhwc,cd->bhwd", ph * gate, w_proj.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        outs[key] = y + x  # identity add: U(x) per phase is x itself

    # Interleave phases back to (b, 2h, 2w, c).
    rows0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3)  # (b,h,w,2,c)
    rows1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3)
    full = jnp.stack([rows0, rows1], axis=2)  # (b, h, 2, w, 2, c)
    return full.reshape(b, 2 * h, 2 * w, c)


# Measured per-block A/B on the attached v5e (chained stages, value-fetch
# sync, batch 8): the fused kernel wins 1.2-1.65x on expand-path blocks at
# >=128px (k5 128px: 1.39x, 256px: 1.65x, 512px tail: 1.23-1.46x) and
# LOSES at 64px (0.89x) and on expand==1 smoothing blocks (0.81x), where
# XLA's cross-op fusion beats the kernel's dispatch + pad overhead.
MIN_FUSED_SIZE = 128


def block_apply(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    dtype=jnp.bfloat16, min_fused_size: int = MIN_FUSED_SIZE,
):
    """Policy dispatcher: fused Pallas kernel where it measures faster,
    XLA composition elsewhere (see MIN_FUSED_SIZE).  ``min_fused_size=0``
    forces the fused kernel for every block, including expand==1 (parity
    tests)."""
    if (expand_ratio != 1 or min_fused_size == 0) and (
        x.shape[1] >= min_fused_size
    ):
        return fused_block_apply(
            params, x, kernel_size, expand_ratio,
            use_identity=use_identity, stats=stats, interpret=interpret,
            dtype=dtype,
        )
    return xla_block_apply(
        params, x, kernel_size, 1, expand_ratio,
        use_identity=use_identity, stats=stats, dtype=dtype,
    )


def decode_fused(
    dec_params,
    z: jnp.ndarray,
    decoder_conv_shapes,
    exporting: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_fused_size: int = MIN_FUSED_SIZE,
    fold_upsample: bool = True,
):
    """Functional fused equivalent of Decoder.__call__ (models.py:306-320),
    consuming the flax 'dec' parameter subtree of an AST/AutoEncoder
    checkpoint.  Per-block fused-vs-XLA dispatch per the measured policy
    (see block_apply); ``min_fused_size=0`` forces the fused kernel
    everywhere (parity tests).  ``fold_upsample`` phase-folds the nearest
    x2 upsample into the smoothing block (upsample_smooth_apply) — same
    math, different f32 rounding (weights are pre-summed per phase)."""
    shapes = decoder_conv_shapes
    x = z
    for i, shape in enumerate(shapes[:-1]):
        blk = dec_params[f"decoder_blocks_{i}"]
        should_upsample = shape[0] != shape[1] and i + 6 < len(shapes)
        x = block_apply(
            blk["DepthWiseConv_0"], x, shape[3], shape[4],
            interpret=interpret, dtype=dtype, min_fused_size=min_fused_size,
        )
        if should_upsample:
            if fold_upsample:
                x = upsample_smooth_apply(blk["DepthWiseConv_1"], x, dtype)
            else:
                x = nearest_upsample_2x(x)
                x = block_apply(
                    blk["DepthWiseConv_1"], x, 3, 1,
                    interpret=interpret, dtype=dtype,
                    min_fused_size=min_fused_size,
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


def encode_fused(
    enc_params,
    enc_stats,
    x: jnp.ndarray,
    enc_conv_shapes,
    out_layers,
    expand_ratio: int = 3,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_fused_size: int = MIN_FUSED_SIZE,
):
    """Functional fused equivalent of Encoder.__call__ (models.py:158-184)
    with BatchNorm running statistics folded into the conv weights — i.e.
    the reference's enc.eval() inference semantics
    (``ModelConfig.encoder_eval_stats=True``).

    Returns the feature maps at ``out_layers`` block indices.
    """
    shapes = enc_conv_shapes
    # Stem: reflect-padded 3x3 conv + hardswish (mobilenetv2.py:38-43).
    stem = enc_params["mob_net_0"]["Conv_0"]
    xi = jnp.pad(
        x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
    )
    h = jax.lax.conv_general_dilated(
        xi, stem["kernel"].astype(dtype), (shapes[0][2],) * 2, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = _hardswish(h.astype(jnp.float32)).astype(dtype)

    outs = []
    if 0 in out_layers:
        outs.append(h)
    for i, row in enumerate(shapes[1:], start=1):
        _, _, stride, k, t = row
        if i == len(shapes) - 1:
            # Final block: kernel 3, expand_ratio from config
            # (reference models.py:154, SURVEY.md defect 6).
            k, t = 3, expand_ratio
        blk = enc_params[f"mob_net_{i}"]
        st = enc_stats[f"mob_net_{i}"]
        if stride == 1:
            h = block_apply(
                blk, h, k, t, stats=st, interpret=interpret, dtype=dtype,
                min_fused_size=min_fused_size,
            )
        else:
            h = xla_block_apply(blk, h, k, stride, t, stats=st, dtype=dtype)
        if i in out_layers:
            outs.append(h)
    return outs
