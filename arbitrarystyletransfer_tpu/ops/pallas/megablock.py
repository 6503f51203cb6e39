"""Persistent-VMEM megakernel for the inverted-residual block (TPU Pallas).

Round-2 measurements (README.md "Performance status") established that the
one-pass fused kernel + XLA epilogue architecture caps near 50 img/s at
512px: Pallas *windowed BlockSpec* DMAs run at ~60% of the chip's effective
HBM bandwidth, the conv halo forces every input row to be read twice, the
SE-gated projection runs as a separate XLA pass over the hidden tensor, and
the whole pipeline pays per-grid-step overhead at 16-48-row tiles.

This kernel restructures the block as ONE ``pallas_call`` per block with
``grid=(B,)`` — one grid step per image — kernel-managed double-buffered
``make_async_copy`` DMAs, and (the headline change vs the round-2 design)
a **VMEM-resident hidden tensor**: at 512px the per-image expanded hidden
map is 50-84 MB bf16 for every decoder-tail block except the 240-channel
one, so it never has to leave VMEM across the SE global-mean barrier —
the k*kC MACs/pixel block runs at the I/O minimum of one x read + one y
write per image.

Layout: activations are **(B, H, C, W)** ("transposed"), W on lanes and C
on sublanes.  TPU DMA requires the minor dim of an HBM slice to be
128-aligned — NHWC channel counts (16..240) can never satisfy that, while
W at the fused sizes (128/256/512) always does, and C (every count in this
model is a multiple of 8) rides sublanes with little padding waste (the
round-2 NHWC kernels padded 160->256 lanes, +60% VPU cost).

Structure per grid step (one image):

  sweep 1 (row-groups 0..n_rg): DMA an x row slab in (rows on the untiled
      dim -> any offset legal, full contiguous reads) -> pw-expand as
      per-row (E,C)@(C,W) MXU dots -> hardswish -> k x k depthwise as k
      lane-rolls x k row slices (VPU, f32) with exact in-kernel reflect
      columns -> hardswish -> hidden slab into the resident VMEM buffer
      (or an HBM scratch when E*H*W exceeds VMEM) + exact SE channel sums;
  gate: the SE bottleneck MLP (two tiny matmuls + Hardtanh(0,1)) runs
      IN-KERNEL on the accumulated sums — no XLA round trip;
  sweep 2: hidden slab (VMEM slice or DMA back) * gate -> projection as
      per-row (Co,E)@(E,W) MXU dots -> +bias -> +identity (x slab
      re-DMAed) -> DMA y out.

Semantics are identical to ``fused_block.xla_block_apply`` (same op order,
same dtypes): pw-expand with optional folded-BN biases, hardswish, k x k
depthwise (reflect padding), hardswish, SELayer gate (Hardtanh(0,1)),
gated projection (+folded-BN bias), residual.  Block reference:
mobilenetv2.py:95-181; SELayer: mobilenetv2.py:63-81.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import bn_fold

# bf16 sublane tile is 16 logical rows (T(8,128)(2,1)); DMA-sliced arrays
# pad their C (second-minor) dim to this.
_SUB = 16
# Lane tiling: the minor dim of any DMA-sliced HBM array must be a
# multiple of 128 — the kernel only engages when W satisfies this.
_LANE = 128

# Usable VMEM on the attached v5e (~128MB physical); leave headroom for
# Mosaic temporaries (rolled depthwise copies are materialized).
_VMEM_BUDGET = 100 * 1024 * 1024


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) * (1.0 / 6.0)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _reflect(i: int, n: int) -> int:
    """Torch ReflectionPad index: -1 -> 1, n -> n-2."""
    if i < 0:
        return -i
    if i >= n:
        return 2 * (n - 1) - i
    return i


def _work_bytes(th, pad, w, ci_p, e, co_p, resident_hid, chunk_e=None,
                k=3):
    """Per-row-group VMEM working set (excludes the resident hidden)."""
    rows = th + 2 * pad
    e_live = e if chunk_e is None else min(e, chunk_e)
    # The depthwise hoists k lane-rolls of the f32 ex tile; at k=3 Mosaic
    # keeps ~3 full-tile f32 buffers live (measured: those configs compile
    # and run), but at k=5 the measured live set is all k rolls + ex + acc
    # plus the reflect-column correction's iota mask / corr / where copies
    # (the k5/th=64 non-resident config blew VMEM with the 3-buffer model
    # — compiler allocation report).
    f32_bufs = (k + 5) if k >= 5 else 3
    b = 2 * 2 * rows * ci_p * w * 2        # x slabs (sweep1 + sweep2), x2
    b += f32_bufs * rows * e_live * w * 4  # ex tile f32 + rolls + dw acc
    b += 2 * th * co_p * w * 2             # y_buf x2
    if not resident_hid:
        b += 2 * th * e * w * 2            # hid slab buf x2
    return b


def _channel_matmul(w2d, tile):
    """(O, C) @ (R, C, W) -> (R, O, W): per-row MXU dots, rows unrolled
    (R is static and small; each dot is a well-shaped (O,C)x(C,W))."""
    rows = [
        jnp.dot(w2d, tile[r], preferred_element_type=jnp.float32)
        for r in range(tile.shape[0])
    ]
    return jnp.stack(rows, axis=0)


def _mega_kernel_t(
    # inputs
    xp_ref, we_ref, wd_ref, be_ref, bd_ref,
    d0k_ref, d0b_ref, d1k_ref, d1b_ref, wp_ref, pb_ref,
    # outputs
    y_ref, hid_hbm_ref,
    # scratch
    x_buf, xr_buf, y_buf, hio_buf, hid_vmem, acc, gate,
    sx, sxr, sy, sh,
    *,
    th: int, n_rg: int, pad: int, k: int, w: int,
    h_valid: int, expand: bool, pre_act: bool, identity: bool,
    resident: bool, out_dtype, chunk_e: int | None = None,
):
    b = pl.program_id(0)
    rows = th + 2 * pad
    n_pixels = float(h_valid * w)

    def x_dma(r, slot):
        return pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(r * th, rows)], x_buf.at[slot], sx.at[slot]
        )

    def xr_dma(r, slot):
        return pltpu.make_async_copy(
            xp_ref.at[b, pl.ds(pad + r * th, th)], xr_buf.at[slot],
            sxr.at[slot],
        )

    def y_dma(r, slot):
        return pltpu.make_async_copy(
            y_buf.at[slot], y_ref.at[b, pl.ds(r * th, th)], sy.at[slot]
        )

    def ho_dma(r, slot):
        return pltpu.make_async_copy(
            hio_buf.at[slot], hid_hbm_ref.at[pl.ds(r * th, th)], sh.at[slot]
        )

    def hi_dma(r, slot):
        return pltpu.make_async_copy(
            hid_hbm_ref.at[pl.ds(r * th, th)], hio_buf.at[slot], sh.at[slot]
        )

    # ---- sweep 1: expand -> dw -> hswish -> hidden + SE sums ------------
    # ``chunk_e`` splits sweep 1 over hidden-channel (sublane) ranges: the
    # expand matmul contracts over Ci and the depthwise is per-channel, so
    # chunking is BIT-EXACT — it only bounds the kernel's live f32 set
    # (ex + its k lane-rolls), which at k=5/E=160 otherwise spills ~59MB
    # of vector registers to VMEM (measured: blows the 128MB budget on
    # top of an 80MB resident hidden).
    e_total = acc.shape[0]
    chunks = [(0, e_total)] if chunk_e is None else [
        (lo, min(lo + chunk_e, e_total))
        for lo in range(0, e_total, chunk_e)
    ]

    def expand_dw_chunk(tile, lo, hi):
        """Hidden channels [lo, hi) of one row slab: expand -> hswish ->
        k x k depthwise (reflect columns) -> hswish."""
        if expand:
            ex = _channel_matmul(we_ref[lo:hi], tile)  # (rows, hi-lo, W)
            ex = ex + be_ref[lo:hi][None]
        else:
            ex = tile[:, lo:hi].astype(jnp.float32) + be_ref[lo:hi][None]
        if pre_act:
            ex = _hardswish(ex)

        # Depthwise k x k: k hoisted lane rolls, k row slices each.
        out = None
        for dj in range(k):
            hj = pltpu.roll(ex, (pad - dj) % w, 2) if dj != pad else ex
            for di in range(k):
                term = hj[di : di + th] * wd_ref[di * k + dj, lo:hi][None]
                out = term if out is None else out + term
        # Reflect columns: the rolls wrapped the <=pad boundary columns on
        # each side; recompute those columns exactly (k*k taps of (th,E,1)
        # lane slices) and select them in.
        col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
        for c in list(range(pad)) + list(range(w - pad, w)):
            corr = None
            for dj in range(k):
                m = _reflect(c + dj - pad, w)
                colv = ex[:, :, m : m + 1]
                for di in range(k):
                    t = colv[di : di + th] * wd_ref[di * k + dj, lo:hi][None]
                    corr = t if corr is None else corr + t
            out = jnp.where(col == c, corr, out)

        return _hardswish(out + bd_ref[lo:hi][None]).astype(out_dtype)

    acc[...] = jnp.zeros_like(acc)
    x_dma(0, 0).start()

    def sweep1(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            x_dma(r + 1, 1 - slot).start()

        x_dma(r, slot).wait()
        tile = x_buf[slot]  # (rows, Ci_p, W) bf16
        if not resident:
            @pl.when(r >= 2)
            def _():
                ho_dma(r - 2, slot).wait()

        for lo, hi in chunks:
            out = expand_dw_chunk(tile, lo, hi)
            if resident:
                hid_vmem[pl.ds(r * th, th), lo:hi] = out
            else:
                hio_buf[slot, :, lo:hi] = out

            # Exact SE sums over the bf16-rounded hidden (matches the XLA
            # epilogue's mean of the stored hidden); mask padded tail rows.
            outf = out.astype(jnp.float32)
            if h_valid < n_rg * th:
                row_i = (
                    jax.lax.broadcasted_iota(jnp.int32, outf.shape, 0)
                    + r * th
                )
                outf = jnp.where(row_i < h_valid, outf, 0.0)
            acc[lo:hi] = acc[lo:hi] + jnp.sum(
                outf, axis=(0, 2), keepdims=True
            )[0]

        if not resident:
            ho_dma(r, slot).start()
        return 0

    jax.lax.fori_loop(0, n_rg, sweep1, 0)
    if not resident:
        if n_rg >= 2:
            ho_dma(n_rg - 2, (n_rg - 2) % 2).wait()
        ho_dma(n_rg - 1, (n_rg - 1) % 2).wait()

    # ---- SE gate in-kernel (SELayer, mobilenetv2.py:63-81) --------------
    mean = acc[...] * (1.0 / n_pixels)  # (E, 1)
    h1 = jnp.maximum(
        jnp.dot(d0k_ref[...], mean, preferred_element_type=jnp.float32)
        + d0b_ref[...],
        0.0,
    )
    g = jnp.dot(d1k_ref[...], h1, preferred_element_type=jnp.float32)
    gate[...] = jnp.clip(g + d1b_ref[...], 0.0, 1.0)

    # ---- sweep 2: gate -> project -> +bias -> +identity -> y out --------
    if identity:
        xr_dma(0, 0).start()
    if not resident:
        hi_dma(0, 0).start()

    def sweep2(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            if identity:
                xr_dma(r + 1, 1 - slot).start()
            if not resident:
                hi_dma(r + 1, 1 - slot).start()

        if resident:
            hv = hid_vmem[pl.ds(r * th, th)]
        else:
            hi_dma(r, slot).wait()
            hv = hio_buf[slot]
        # Match the XLA epilogue's rounding exactly: gate multiply in the
        # hidden dtype, f32 matmul accumulation, +bias (f32), cast, then
        # residual add in the I/O dtype.
        hv = hv * gate[...][None].astype(out_dtype)
        y = _channel_matmul(wp_ref[...], hv)  # (th, Co_p, W) f32
        y = (y + pb_ref[...][None]).astype(out_dtype)
        if identity:
            xr_dma(r, slot).wait()
            y = y + xr_buf[slot]

        @pl.when(r >= 2)
        def _():
            y_dma(r - 2, slot).wait()

        y_buf[slot] = y
        y_dma(r, slot).start()
        return 0

    jax.lax.fori_loop(0, n_rg, sweep2, 0)
    if n_rg >= 2:
        y_dma(n_rg - 2, (n_rg - 2) % 2).wait()
    y_dma(n_rg - 1, (n_rg - 1) % 2).wait()


def mega_expand_dw_project_t(
    xt: jnp.ndarray,
    w_expand: jnp.ndarray | None,
    w_dw: jnp.ndarray,
    se_params,
    w_proj: jnp.ndarray,
    kernel_size: int,
    pre_act: bool = True,
    b_expand: jnp.ndarray | None = None,
    b_dw: jnp.ndarray | None = None,
    proj_bias: jnp.ndarray | None = None,
    identity: bool = False,
    row_group: int | None = None,
    interpret: bool = False,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
):
    """Full inverted-residual block (expand -> dw -> SE -> project [+id])
    on a TRANSPOSED (B, H, C, W) activation; returns (B, H, C_out, W).

    Args mirror ``fused_block.fused_expand_dw`` plus the SE/projection
    stage: ``se_params`` is the SELayer flax subtree, ``w_proj`` the
    (C_hid, C_out) projection (BN scale pre-folded by the caller),
    ``proj_bias`` its folded bias.  ``identity`` adds the residual.
    Stride-1 only; W must be a multiple of 128 (see module docstring).

    ``chunk_e``: sweep-1 hidden-channel chunk (bit-exact; bounds register
    spill — see the kernel).  "auto" chunks the k=5 blocks, whose
    unchunked spill is measured to blow VMEM at 512px.
    """
    b, h_dim, c_in, w_dim = xt.shape
    k = kernel_size
    pad = (k - 1) // 2
    e = w_dw.shape[-1]
    expand = w_expand is not None
    if not expand:
        assert e == c_in, (e, c_in)
    assert w_dim % _LANE == 0, f"W={w_dim} must be a multiple of {_LANE}"
    c_out = w_proj.shape[-1]
    ci_p = _round_up(c_in, _SUB)
    co_p = _round_up(c_out, _SUB)
    # In the expand==1 path the depthwise operates directly on the padded
    # input tile, so the hidden channel count must match its padding.
    e_p = _round_up(e, _SUB) if expand else ci_p

    if chunk_e == "auto":
        # k=5's unchunked live f32 set (ex + k lane-rolls at E up to 240)
        # spills ~59MB of vector registers (measured); chunking bounds it.
        chunk_e = 64 if (k >= 5 and e_p > 64) else None

    # Row-group size + hidden residency: prefer the largest row group that
    # keeps the working set under budget WITH the hidden resident; fall
    # back to the HBM hidden round-trip (240ch @512px) otherwise.
    hid_rows = _round_up(h_dim, 8)
    hid_bytes = hid_rows * e_p * w_dim * 2
    resident = None
    if row_group is None:
        for res in (True, False):
            if res and hid_bytes > _VMEM_BUDGET - 12 * 1024 * 1024:
                continue
            # k=5 kernels carry a much larger Mosaic temporary/spill set
            # (5 hoisted lane-rolls + 25 reflect-column taps); with an
            # 80MB resident hidden they exceed VMEM even channel-chunked
            # (measured: "allocating on stack" OOM at 512px/E=160).  Keep
            # residency for k5 only when the hidden is comfortably small;
            # the HBM hidden round-trip costs ~0.6ms/image at measured
            # DMA rate vs the >10ms block — an acceptable fallback.
            if res and k >= 5 and hid_bytes > 48 * 1024 * 1024:
                continue
            for cand in (64, 32, 16, 8):
                if cand > hid_rows:
                    continue
                budget = _VMEM_BUDGET - (hid_bytes if res else 0)
                if _work_bytes(cand, pad, w_dim, ci_p, e_p, co_p, res,
                               chunk_e, k) <= budget:
                    row_group, resident = cand, res
                    break
            if row_group is not None:
                break
        if row_group is None:
            row_group, resident = 8, False
    else:
        resident = hid_bytes + _work_bytes(
            row_group, pad, w_dim, ci_p, e_p, co_p, True, chunk_e, k
        ) <= _VMEM_BUDGET
    if force_resident is not None:
        resident = force_resident
    th = max(8, min(row_group, hid_rows))
    n_rg = -(-h_dim // th)

    # Host-side prep: reflect-pad rows (the W halo is handled in-kernel),
    # zero-pad rows to the row-group grid and C to the sublane tile.
    xp = jnp.pad(xt, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    xp = jnp.pad(
        xp,
        (
            (0, 0),
            (0, n_rg * th + 2 * pad - (h_dim + 2 * pad)),
            (0, ci_p - c_in),
            (0, 0),
        ),
    )

    f32 = jnp.float32
    dtype = xt.dtype

    def col(v, n, fill=0.0):
        out = jnp.full((n, 1), fill, f32) if v is None else jnp.pad(
            v.astype(f32), (0, n - v.shape[0])
        ).reshape(n, 1)
        return out

    if expand:
        we = jnp.pad(
            w_expand.astype(dtype).T,
            ((0, e_p - e), (0, ci_p - c_in)),
        )  # (E_p, Ci_p)
    else:
        we = jnp.zeros((1, 1), dtype)  # unused
    wd = jnp.pad(
        w_dw.astype(f32), ((0, 0), (0, 0), (0, e_p - e))
    ).reshape(k * k, e_p, 1)
    be = col(b_expand, e_p)
    bd = col(b_dw, e_p)
    pb = col(proj_bias, co_p)

    d0, d1 = se_params["Dense_0"], se_params["Dense_1"]
    s_dim = d0["kernel"].shape[1]
    d0k = jnp.pad(
        d0["kernel"].astype(f32).T, ((0, 0), (0, e_p - e))
    )  # (S, E_p)
    d0b = col(d0["bias"], s_dim)
    d1k = jnp.pad(
        d1["kernel"].astype(f32).T, ((0, e_p - e), (0, 0))
    )  # (E_p, S)
    d1b = col(d1["bias"], e_p)
    wp = jnp.pad(
        w_proj.astype(dtype).T, ((0, co_p - c_out), (0, e_p - e))
    )

    kernel = functools.partial(
        _mega_kernel_t,
        th=th, n_rg=n_rg, pad=pad, k=k, w=w_dim,
        h_valid=h_dim, expand=expand, pre_act=pre_act, identity=identity,
        resident=resident, out_dtype=dtype, chunk_e=chunk_e,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    rows = th + 2 * pad
    y_full, _hid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[anyspec] + [vspec] * 10,
        out_specs=[anyspec, anyspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_rg * th, co_p, w_dim), dtype),
            # HBM hidden scratch (ONE image, reused across the sequential
            # grid): minimal dummy when the hidden is VMEM-resident.
            jax.ShapeDtypeStruct(
                (n_rg * th, e_p, w_dim) if not resident else (8, 8, _LANE),
                dtype,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, ci_p, w_dim), dtype),            # x_buf
            pltpu.VMEM((2, th, ci_p, w_dim), dtype),              # xr_buf
            pltpu.VMEM((2, th, co_p, w_dim), dtype),              # y_buf
            pltpu.VMEM(
                (2, th, e_p, w_dim) if not resident else (1, 1, 8, _LANE),
                dtype,
            ),                                                    # hio_buf
            pltpu.VMEM(
                (n_rg * th, e_p, w_dim) if resident else (1, 8, _LANE),
                dtype,
            ),                                                    # hid_vmem
            pltpu.VMEM((e_p, 1), f32),                            # acc
            pltpu.VMEM((e_p, 1), f32),                            # gate
            pltpu.SemaphoreType.DMA((2,)),                        # sx
            pltpu.SemaphoreType.DMA((2,)),                        # sxr
            pltpu.SemaphoreType.DMA((2,)),                        # sy
            pltpu.SemaphoreType.DMA((2,)),                        # sh
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, we, wd, be, bd, d0k, d0b, d1k, d1b, wp, pb)
    if n_rg * th != h_dim or co_p != c_out:
        y_full = y_full[:, :h_dim, :c_out]
    return y_full


def mega_block_apply_t(
    params, xt, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    row_group: int | None = None, force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
):
    """One DepthWiseConv block (mobilenetv2.py:95-165) on a transposed
    (B, H, C, W) activation through the persistent-VMEM megakernel.
    Folded-BN inference semantics as ``fused_block.fused_block_apply``;
    stride-1 only."""
    c_in = xt.shape[2]
    expand = expand_ratio != 1
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

    wp = w_proj
    if proj_scale is not None:
        wp = wp * proj_scale[None, :]
    c_out = w_proj.shape[-1]
    return mega_expand_dw_project_t(
        xt,
        None if w_exp is None else w_exp,
        w_dw,
        params["SELayer_0"],
        wp,
        kernel_size,
        pre_act=expand,
        b_expand=b_exp,
        b_dw=b_dw,
        proj_bias=proj_bias,
        identity=use_identity and c_in == c_out,
        row_group=row_group,
        interpret=interpret,
        force_resident=force_resident,
        chunk_e=chunk_e,
    )


def mega_block_apply(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    dtype=jnp.bfloat16, row_group: int | None = None,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
):
    """NHWC wrapper: transpose -> ``mega_block_apply_t`` -> transpose.
    Drop-in equivalent of ``fused_block.fused_block_apply`` (same
    parameter tree, same folded-BN inference semantics), stride-1 only.
    Prefer the _t form and keep the whole chain transposed — the
    boundary transposes cost one HBM round trip each."""
    xt = jnp.transpose(x.astype(dtype), (0, 1, 3, 2))
    yt = mega_block_apply_t(
        params, xt, kernel_size, expand_ratio,
        use_identity=use_identity, stats=stats, interpret=interpret,
        row_group=row_group, force_resident=force_resident,
        chunk_e=chunk_e,
    )
    return jnp.transpose(yt, (0, 1, 3, 2))


def _hardswish_f32(x):
    return _hardswish(x.astype(jnp.float32))


def upsample_smooth_apply_t(params, xt, dtype=jnp.bfloat16):
    """Transposed-layout twin of ``fused_block.upsample_smooth_apply``:
    nearest-x2 upsample + 3x3 expand==1 smoothing block, phase-folded to
    quarter-area compute, on a (B, H, C, W) activation.

    Identical math (same per-phase pre-summed weights, same f32 rounding
    points); only the axis bookkeeping differs: channels broadcast over
    axis 2, the projection contracts axis 2, and the final phase
    interleave expands H on axis 1 and W on axis 3.
    """
    b, h, c, w = xt.shape
    xt = xt.astype(dtype)
    w_dw = params["DepthwiseConv2D_0"]["kernel"][:, :, 0, :]  # (3, 3, C)
    w_proj = params["Conv_0"]["kernel"][0, 0]

    def fold(wk):
        return {
            0: jnp.stack([wk[0], wk[1] + wk[2]]),
            1: jnp.stack([wk[0] + wk[1], wk[2]]),
        }

    xe = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (1, 1)), mode="edge")
    row_f = fold(w_dw)
    phases = {}
    sums = 0.0
    for a in (0, 1):
        col_f = fold(row_f[a])  # (2, 2, C)
        for bb in (0, 1):
            wab = col_f[bb].astype(dtype)
            acc = None
            for u in (0, 1):
                for v in (0, 1):
                    term = (
                        xe[:, a + u : a + u + h, :, bb + v : bb + v + w]
                        * wab[u, v][None, None, :, None]
                    )
                    acc = term if acc is None else acc + term
            ph = _hardswish_f32(acc)
            sums = sums + jnp.sum(ph, axis=(1, 3))
            phases[(a, bb)] = ph.astype(dtype)

    d0, d1 = params["SELayer_0"]["Dense_0"], params["SELayer_0"]["Dense_1"]
    mean = sums / (4.0 * h * w)
    g = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    g = jnp.clip(g @ d1["kernel"] + d1["bias"], 0.0, 1.0)
    gate = g[:, None, :, None].astype(dtype)

    outs = {}
    for key, ph in phases.items():
        y = jnp.einsum(
            "bhcw,cd->bhdw", ph * gate, w_proj.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        outs[key] = y + xt

    cols0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=4)  # (b,h,c,w,2)
    cols1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=4)
    full = jnp.stack(
        [cols0.reshape(b, h, c, 2 * w), cols1.reshape(b, h, c, 2 * w)],
        axis=2,
    )  # (b, h, 2, c, 2w)
    return full.reshape(b, 2 * h, c, 2 * w)


def encode_mega(
    enc_params,
    enc_stats,
    x: jnp.ndarray,
    enc_conv_shapes,
    out_layers,
    expand_ratio: int = 3,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_mega_size: int = 256,
):
    """Encoder.__call__ (models.py:158-184) with folded-BN inference
    semantics, routing the high-resolution stride-1 blocks through the
    persistent-VMEM megakernel.

    The encoder's expensive blocks are the stride-1 inverted residuals
    before each downsampling step (block 1 at full res, block 3 at 1/2,
    blocks 5-6 at 1/4); each runs transposed through
    ``mega_block_apply_t`` when its width is lane-aligned and at least
    ``min_mega_size``.  Stride-2 blocks and the low-resolution tail keep
    the measured round-2 policy (``fused_block.block_apply``).
    Consecutive eligible blocks stay in the transposed layout between
    kernels (no intermediate HBM transpose round trip).
    """
    from .fused_block import _hardswish as fb_hardswish  # same math
    from .fused_block import block_apply, xla_block_apply

    shapes = enc_conv_shapes
    stem = enc_params["mob_net_0"]["Conv_0"]
    xi = jnp.pad(
        x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
    )
    h = jax.lax.conv_general_dilated(
        xi, stem["kernel"].astype(dtype), (shapes[0][2],) * 2, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h = fb_hardswish(h.astype(jnp.float32)).astype(dtype)

    outs = []
    if 0 in out_layers:
        outs.append(h)
    ht = None  # transposed (B, H, C, W) form, valid when h is None
    for i, row in enumerate(shapes[1:], start=1):
        _, _, stride, k, t = row
        if i == len(shapes) - 1:
            k, t = 3, expand_ratio  # models.py:154, SURVEY.md defect 6
        blk = enc_params[f"mob_net_{i}"]
        st = enc_stats[f"mob_net_{i}"]
        size = h.shape[1] if h is not None else ht.shape[1]
        use_mega = (
            stride == 1
            and size % _LANE == 0
            and size >= min_mega_size
        )
        if use_mega:
            if ht is None:
                ht = jnp.transpose(h.astype(dtype), (0, 1, 3, 2))
                h = None
            ht = mega_block_apply_t(
                blk, ht, k, t, stats=st, interpret=interpret
            )
        else:
            if h is None:
                h = jnp.transpose(ht, (0, 1, 3, 2))
                ht = None
            if stride == 1:
                h = block_apply(
                    blk, h, k, t, stats=st, interpret=interpret,
                    dtype=dtype,
                )
            else:
                h = xla_block_apply(blk, h, k, stride, t, stats=st,
                                    dtype=dtype)
        if i in out_layers:
            outs.append(
                h if h is not None else jnp.transpose(ht, (0, 1, 3, 2))
            )
    return outs


def decode_mega(
    dec_params,
    z: jnp.ndarray,
    decoder_conv_shapes,
    exporting: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_mega_w: int = 128,
):
    """Decoder.__call__ (models.py:306-320) with the high-resolution
    sections running TRANSPOSED through the persistent-VMEM megakernel.

    The chain transposes to (B, H, C, W) at the first resolution whose W
    is a multiple of 128 (the megakernel's lane-alignment requirement) and
    stays transposed — megablocks and the phase-folded upsample+smooth
    both operate in that layout — transposing back only for the final
    3x3 RGB head.  Low-resolution prefix blocks (and everything, when no
    resolution aligns) run the measured round-2 policy via
    ``fused_block.decode_fused``'s building blocks.
    """
    from .fused_block import (
        upsample_smooth_apply,
        xla_block_apply,
    )

    shapes = decoder_conv_shapes
    x = z  # NHWC until the transpose point
    xt = None  # (B, H, C, W) once transposed
    for i, shape in enumerate(shapes[:-1]):
        blk = dec_params[f"decoder_blocks_{i}"]
        should_upsample = shape[0] != shape[1] and i + 6 < len(shapes)
        k, t = shape[3], shape[4]
        if xt is None and x.shape[2] % min_mega_w == 0 and \
                x.shape[1] >= 128:
            xt = jnp.transpose(x.astype(dtype), (0, 1, 3, 2))
            x = None
        if xt is not None:
            xt = mega_block_apply_t(
                blk["DepthWiseConv_0"], xt, k, t, interpret=interpret
            )
            if should_upsample:
                xt = upsample_smooth_apply_t(
                    blk["DepthWiseConv_1"], xt, dtype
                )
        else:
            x = xla_block_apply(
                blk["DepthWiseConv_0"], x, k, 1, t, dtype=dtype
            )
            if should_upsample:
                x = upsample_smooth_apply(blk["DepthWiseConv_1"], x, dtype)
    if xt is not None:
        x = jnp.transpose(xt, (0, 1, 3, 2))
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
