"""Flat-lane (NCHW) persistent megakernel for the inverted-residual block.

Second-generation redesign of ``megablock.py`` driven by its on-chip
measurements: the transposed (B, H, C, W) kernel wins on thin-channel k3
blocks (1.35-1.53x vs the round-2 fused kernel at 512px) but LOSES on the
k5 decoder blocks (33.7ms vs 20.8ms at 512px/b8) because its expand and
projection matmuls are issued as one small (E, C) x (C, W) MXU dot PER
ROW — ~18k dot dispatches per call at k5 shapes — and the k5
reflect-column correction unrolls k^2 taps per boundary column
(825 Mosaic ops per chunk, ~4 min compiles).

This kernel keeps the two-sweep persistent-VMEM structure (sweep 1:
expand -> depthwise -> hardswish -> hidden + exact SE sums; in-kernel SE
gate; sweep 2: gate -> project -> +identity) but flattens the spatial
dims onto the LANE axis: activations are ``(B, C, H*W)`` — NCHW with H,W
merged.  Consequences:

  * the expand is ONE ``(E, C) @ (C, rows*W)`` MXU dot per row-group
    (and the projection one ``(Co, E) @ (E, rows*W)`` dot) — hundreds of
    large dots per call instead of tens of thousands of row dots;
  * a depthwise tap (di, dj) is a +/-(di - pad)*W + (dj - pad) shift of
    the flat axis: k lane-rolls (one per dj) shared across di, then a
    STATIC, W-aligned lane slice per di — W is a multiple of 128, so
    every slice offset (di*W) is tile-aligned;
  * the reflect-pad W-boundary correction needs only p(p+1) masked
    selects TOTAL (2 for k3, 6 for k5) and ZERO extra rolls: a wrapped
    column c of the dj-tile needs ``ex`` at reflected column
    c' = reflect(c + dj - pad), and c - c' always lies in {pad-k+1..pad}
    — i.e. the value is already present at the same flat position in one
    of the k main rolled tiles (proof in ``_patch_pairs``);
  * row-slab DMAs move ``(C, rows*W)`` contiguous regions whose minor
    dim is automatically 128-aligned at every eligible W.

Semantics are identical to ``fused_block.xla_block_apply`` (same op
order and dtypes): pw-expand (+folded-BN bias), hardswish, k x k
depthwise over reflect padding, hardswish, SELayer Hardtanh(0,1) gate,
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
from .megablock import _SUB, _LANE, _VMEM_BUDGET, _hardswish, _round_up


def _reflect(i: int, n: int) -> int:
    """Torch ReflectionPad index: -1 -> 1, n -> n-2."""
    if i < 0:
        return -i
    if i >= n:
        return 2 * (n - 1) - i
    return i


def _patch_pairs(k: int, w: int):
    """W-boundary corrections for the flat-axis depthwise.

    The dj-roll of the flat (row-major) tile wraps across row boundaries,
    so output column c is wrong iff c + dj - pad falls outside [0, W).
    The correct value is ``ex`` at the same row, reflected column
    c' = reflect(c + dj - pad); tile rolled by a = c - c' holds exactly
    that value at the same flat position, and a = 2c + dj - pad (left) /
    2c + dj - pad - 2(W-1) (right) always lies within the k main roll
    amounts {pad-k+1 .. pad}.  Returns [(dj, c, source_dj)] with
    source_dj = pad - a.
    """
    pad = (k - 1) // 2
    pairs = []
    for dj in range(k):
        off = dj - pad
        for c in range(w):
            if 0 <= c + off < w:
                continue
            if not (c < pad or c >= w - pad):
                continue
            cr = _reflect(c + off, w)
            a = c - cr
            src = pad - a
            assert 0 <= src < k, (dj, c, a)
            pairs.append((dj, c, src))
    return pairs


def _flat_kernel(
    # inputs
    xp_ref, we_ref, wd_ref, be_ref, bd_ref,
    d0k_ref, d0b_ref, d1k_ref, d1b_ref, wp_ref, pb_ref,
    # outputs
    y_ref, hid_hbm_ref,
    # scratch
    x_buf, xr_buf, y_buf, hio_buf, hid_vmem, acc, gate,
    sx, sxr, sy, sh,
    *,
    th: int, n_rg: int, pad: int, k: int, w: int, ws: int,
    h_valid: int, expand: bool, pre_act: bool, identity: bool,
    resident: bool, out_dtype, chunk_e: int | None = None,
    out_pad: int = 0,
    abl_taps: int | None = None,
    abl_se: bool = True,
    abl_proj: bool = False,
):
    b = pl.program_id(0)
    rows = th + 2 * pad
    tl = th * ws         # output lanes per row-group
    rl = rows * ws       # slab lanes per row-group (incl. halo)
    n_pixels = float(h_valid * w)   # logical pixels only (pad cols masked)

    def x_dma(r, slot):
        return pltpu.make_async_copy(
            xp_ref.at[b, :, pl.ds(r * tl, rl)], x_buf.at[slot], sx.at[slot]
        )

    def xr_dma(r, slot):
        return pltpu.make_async_copy(
            xp_ref.at[b, :, pl.ds(pad * ws + r * tl, tl)], xr_buf.at[slot],
            sxr.at[slot],
        )

    def y_dma(r, slot):
        # Halo-chained output shifts valid rows down by out_pad.
        return pltpu.make_async_copy(
            y_buf.at[slot],
            y_ref.at[b, :, pl.ds(out_pad * ws + r * tl, tl)],
            sy.at[slot],
        )

    def ho_dma(r, slot):
        return pltpu.make_async_copy(
            hio_buf.at[slot], hid_hbm_ref.at[:, pl.ds(r * tl, tl)],
            sh.at[slot],
        )

    def hi_dma(r, slot):
        return pltpu.make_async_copy(
            hid_hbm_ref.at[:, pl.ds(r * tl, tl)], hio_buf.at[slot],
            sh.at[slot],
        )

    e_total = acc.shape[0]
    chunks = [(0, e_total)] if chunk_e is None else [
        (lo, min(lo + chunk_e, e_total))
        for lo in range(0, e_total, chunk_e)
    ]
    patches = _patch_pairs(k, w)

    def expand_dw_chunk(tile, colmod, lo, hi):
        """Hidden channels [lo, hi) of one flat row slab: expand ->
        hswish -> k x k depthwise (reflect columns) -> hswish."""
        if expand:
            ex = jnp.dot(
                we_ref[lo:hi], tile, preferred_element_type=jnp.float32
            ) + be_ref[lo:hi]
        else:
            ex = tile[lo:hi].astype(jnp.float32) + be_ref[lo:hi]
        if pre_act:
            ex = _hardswish(ex)
        # Round the expanded activation to the I/O dtype BEFORE the
        # depthwise — exactly where xla_block_apply rounds (its hid is
        # cast to dtype before the conv) — then back to f32: Mosaic's
        # lane rotate only supports 32-bit data ("Rotate with non-32-bit
        # data", caught by tests/test_aot_compile.py), so the rolls must
        # stay f32 even though the values are bf16-rounded.
        ex = ex.astype(out_dtype).astype(jnp.float32)

        # k main rolls of the flat axis (one per dj, shared across di).
        rolls = [
            pltpu.roll(ex, (pad - dj) % rl, 1) if dj != pad else ex
            for dj in range(k)
        ]
        # Reflect-pad boundary patches: p(p+1) masked selects, sources
        # taken from the UNPATCHED main rolls (source columns are always
        # interior — see _patch_pairs).
        patched = list(rolls)
        for dj, c, src in patches:
            patched[dj] = jnp.where(colmod == c, rolls[src], patched[dj])

        out = None
        for dj in range(k):
            hj = patched[dj]
            for di in range(k):
                if abl_taps is not None and dj * k + di >= abl_taps:
                    continue  # timing ablation only — results are wrong
                term = hj[:, di * ws : di * ws + tl] * wd_ref[
                    di * k + dj, lo:hi
                ]
                out = term if out is None else out + term
        return _hardswish(out + bd_ref[lo:hi]).astype(out_dtype)

    acc[...] = jnp.zeros_like(acc)
    x_dma(0, 0).start()

    # Loop-invariant: the within-row column index of every flat position
    # (for the reflect-boundary patch selects).  Modulo the PHYSICAL row
    # stride: pad columns (>= w when ws > w) never match a patch column.
    colmod = jax.lax.rem(
        jax.lax.broadcasted_iota(
            jnp.int32, (chunks[0][1] - chunks[0][0], rl), 1
        ),
        ws,
    )

    def sweep1(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            x_dma(r + 1, 1 - slot).start()

        x_dma(r, slot).wait()
        tile = x_buf[slot]  # (Ci_p, rows*W) bf16
        if not resident:
            @pl.when(r >= 2)
            def _():
                ho_dma(r - 2, slot).wait()

        for lo, hi in chunks:
            cm = colmod if hi - lo == chunks[0][1] else colmod[: hi - lo]
            out = expand_dw_chunk(tile, cm, lo, hi)
            if resident:
                hid_vmem[r, lo:hi] = out
            else:
                hio_buf[slot, lo:hi] = out

            if not abl_se:
                continue  # timing ablation only — gate reads garbage
            # Exact SE sums over the bf16-rounded hidden (matches the XLA
            # epilogue's mean of the stored hidden); mask padded tail rows
            # and (when the row stride is padded, ws > w) the pad columns.
            outf = out.astype(jnp.float32)
            if h_valid < n_rg * th or ws != w:
                lane_i = (
                    jax.lax.broadcasted_iota(jnp.int32, outf.shape, 1)
                    + r * tl
                )
                valid = lane_i // ws < h_valid
                if ws != w:
                    valid &= jax.lax.rem(lane_i, ws) < w
                outf = jnp.where(valid, outf, 0.0)
            acc[lo:hi] = acc[lo:hi] + jnp.sum(outf, axis=1, keepdims=True)

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
            hv = hid_vmem[r]
        else:
            hi_dma(r, slot).wait()
            hv = hio_buf[slot]
        if abl_proj:
            # timing ablation only — results are wrong
            y = hv[: y_buf.shape[1]].astype(out_dtype)
        else:
            # Match the XLA epilogue's rounding exactly: gate multiply in
            # the hidden dtype, f32 matmul accumulation, +bias (f32),
            # cast, then residual add in the I/O dtype.
            hv = hv * gate[...].astype(out_dtype)
            y = jnp.dot(
                wp_ref[...], hv, preferred_element_type=jnp.float32
            )
            y = (y + pb_ref[...]).astype(out_dtype)
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

    # Halo-chained output: write the NEXT block's reflect rows in place
    # (row -j = row j, row h-1+j = row h-1-j; torch ReflectionPad) as
    # small HBM->HBM row copies.  Runs after every y_dma wait, so the
    # sources are final — including the bottom sources, which overwrite
    # any tail-row-group garbage beyond h_valid.
    if out_pad:
        def row_copy(dst, src):
            cp = pltpu.make_async_copy(
                y_ref.at[b, :, pl.ds(src * ws, ws)],
                y_ref.at[b, :, pl.ds(dst * ws, ws)],
                sy.at[0],
            )
            cp.start()
            cp.wait()

        for j in range(1, out_pad + 1):
            row_copy(out_pad - j, out_pad + j)
            row_copy(out_pad + h_valid - 1 + j, out_pad + h_valid - 1 - j)


def _flat_work_bytes(th, pad, w, ci_p, e, co_p, resident_hid, k,
                     chunk_e=None, itemsize=2):
    """Per-row-group VMEM working set (excludes the resident hidden).
    The depthwise holds the f32 ex tile + the f32 dw accumulator + k f32
    rolls (Mosaic's lane rotate is 32-bit only; +1 tile margin for the
    boundary-patch selects)."""
    rows = th + 2 * pad
    e_live = e if chunk_e is None else min(e, chunk_e)
    del itemsize  # rolls are pinned to f32 by the Mosaic rotate limit
    per_elem = (k + 3) * 4                 # ex + acc + k rolls + margin
    b = 2 * ci_p * rows * w * 2            # x slabs x2 slots
    b += 2 * ci_p * th * w * 2             # xr slabs x2
    b += per_elem * e_live * rows * w      # depthwise working tiles
    b += 2 * co_p * th * w * 2             # y_buf x2
    if not resident_hid:
        b += 2 * e * th * w * 2            # hid slab buf x2
    return b


def plan_flat_block(
    c_in: int,
    e: int,
    c_out: int,
    k: int,
    h_dim: int,
    w_dim: int,
    expand: bool = True,
    row_group: int | None = None,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
    itemsize: int = 2,
):
    """Static launch plan for one flat-kernel block: returns a dict with
    ws (physical row stride), ci_p/e_p/co_p (tile-padded channels),
    chunk_e, row_group/th/n_rg, resident.  Single source of truth shared
    by ``flat_expand_dw_project`` and the halo-chain planner in
    ``decode_flat`` (which must know a consumer block's row grid to size
    the producer's padded output)."""
    pad = (k - 1) // 2
    ws = _round_up(w_dim, _LANE)
    ci_p = _round_up(c_in, _SUB)
    co_p = _round_up(c_out, _SUB)
    e_p = _round_up(e, _SUB) if expand else ci_p

    if chunk_e == "auto":
        # Uniform chunks only: every observed Mosaic layout crash
        # (ApplyVectorLayoutPass "limits[i] <= dim(i)" SIGABRT) had a
        # ragged last chunk (144 -> 64+64+16); shapes with even chunks
        # compile and run.  Pick the largest divisor of E_p <= 64.
        if e_p > 128:
            chunk_e = next(
                (c for c in range(64, 7, -8) if e_p % c == 0), 64
            )
        else:
            chunk_e = None

    hid_rows = _round_up(h_dim, 8)
    hid_bytes = hid_rows * e_p * ws * 2

    def compile_ok(cand):
        # Mosaic compile time explodes with the row group on k5 shapes
        # (the 25-tap unroll): measured 40->24 t6 @512 rg 8/16/32 compiles
        # in 22/49/154 s, and 40->24 t4 @320 rg 8/16/32 in 64/56/232 s —
        # the knee is rg 16 for every k5 shape probed, independent of the
        # stride or chunking.  k3 bodies are ~3x smaller and have never
        # been the slow case; VMEM binds their row group first.
        return k < 5 or cand <= 16

    resident = None
    if row_group is None:
        # Smallest row group FIRST: on-chip probes (scripts/probe_flat_r3
        # phases 1-2) measured rg8 fastest on every 512px shape tried —
        # d8 17.3 ms (rg8) vs 19.7 (rg16) vs 22.8 (rg32); d11 9.7 vs 11.2
        # — despite the larger halo share, so halo amortization loses to
        # whatever grows with the per-iteration working set.
        for res in (True, False):
            if res and hid_bytes > _VMEM_BUDGET - 12 * 1024 * 1024:
                continue
            for cand in (8, 16, 32, 64):
                if cand > hid_rows and cand > 8:
                    continue
                if cand > 8 and not compile_ok(cand):
                    continue
                budget = _VMEM_BUDGET - (hid_bytes if res else 0)
                if _flat_work_bytes(cand, pad, ws, ci_p, e_p, co_p,
                                    res, k, chunk_e, itemsize) <= budget:
                    row_group, resident = cand, res
                    break
            if row_group is not None:
                break
        if row_group is None:
            row_group, resident = 8, False
    else:
        resident = hid_bytes + _flat_work_bytes(
            row_group, pad, ws, ci_p, e_p, co_p, True, k, chunk_e, itemsize
        ) <= _VMEM_BUDGET
    if force_resident is not None:
        resident = force_resident
    th = max(8, min(row_group, hid_rows))
    n_rg = -(-h_dim // th)
    return dict(
        ws=ws, ci_p=ci_p, e_p=e_p, co_p=co_p, chunk_e=chunk_e,
        row_group=row_group, resident=resident, th=th, n_rg=n_rg, pad=pad,
    )


def prepad_flat(xf, h_dim, w_dim, pad, ci_p, th, n_rg, ws):
    """Host-side prep into the kernel's padded layout: reflect-pad rows,
    zero-pad rows to the row-group grid, C to the sublane tile, and W to
    the physical stride; flatten (H, W_stride) onto lanes."""
    b, c_in, _ = xf.shape
    x4 = xf.reshape(b, c_in, h_dim, w_dim)
    xp = jnp.pad(x4, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    xp = jnp.pad(
        xp,
        (
            (0, 0),
            (0, ci_p - c_in),
            (0, n_rg * th + 2 * pad - (h_dim + 2 * pad)),
            (0, ws - w_dim),
        ),
    )
    return xp.reshape(b, ci_p, (n_rg * th + 2 * pad) * ws)


def flat_expand_dw_project(
    xf: jnp.ndarray,
    w_expand: jnp.ndarray | None,
    w_dw: jnp.ndarray,
    se_params,
    w_proj: jnp.ndarray,
    kernel_size: int,
    h_dim: int,
    pre_act: bool = True,
    b_expand: jnp.ndarray | None = None,
    b_dw: jnp.ndarray | None = None,
    proj_bias: jnp.ndarray | None = None,
    identity: bool = False,
    row_group: int | None = None,
    interpret: bool = False,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
    in_prepadded: bool = False,
    out_pad: int = 0,
    out_rows: int | None = None,
    w_dim: int | None = None,
    _abl_taps: int | None = None,
    _abl_se: bool = True,
    _abl_proj: bool = False,
):
    """Full inverted-residual block (expand -> dw -> SE -> project [+id])
    on a FLAT NCHW activation ``xf`` of shape (B, C, H*W); returns
    (B, C_out, H*W).  ``h_dim`` is H.  Non-lane-multiple W runs with a
    zero-filled padded row stride (see below).

    Halo chaining (consecutive flat blocks skip the XLA pad/slice HBM
    round trips between them):
      * ``in_prepadded``: ``xf`` is already in the kernel's padded layout
        (B, Ci_p, rows_in*ws) — halo rows first, channels tile-padded —
        as written by a previous block with ``out_pad == this pad``.
      * ``out_pad > 0``: the output stays in padded layout
        (B, Co_p, out_rows*ws) with the NEXT block's reflect halo rows
        written in-kernel (2*out_pad small HBM->HBM row copies), valid
        rows at [out_pad, out_pad + H).  ``out_rows`` must cover both
        this block's row grid and the consumer's
        (max(out_pad + n_rg*th, n_rg'*th' + 2*out_pad)).
    """
    b = xf.shape[0]
    k = kernel_size
    pad = (k - 1) // 2
    e = w_dw.shape[-1]
    expand = w_expand is not None
    # True (unpadded) input channel count comes from the weights — the
    # prepadded activation carries tile-padded channels.
    c_in = w_expand.shape[0] if expand else e
    if in_prepadded:
        assert w_dim is not None, "w_dim is required with in_prepadded"
    else:
        assert xf.shape[1] == c_in, (xf.shape, c_in)
        hw = xf.shape[2]
        assert hw % h_dim == 0, (hw, h_dim)
        w_dim = hw // h_dim
    # Physical row stride: W rounded up to the lane tile.  Non-multiple
    # widths (e.g. the reference's 320px imsize -> W=320, stride 384) run
    # with zero-filled pad columns; pad-column outputs are garbage and are
    # sliced off, SE sums mask them, and reflect-boundary patches are
    # stride-agnostic (see _patch_pairs — a tap leaving [0, w) lands in
    # the pad zone instead of wrapping, and is replaced the same way).
    plan = plan_flat_block(
        c_in, e, w_proj.shape[-1], k, h_dim, w_dim, expand=expand,
        row_group=row_group, force_resident=force_resident,
        chunk_e=chunk_e, itemsize=jnp.dtype(xf.dtype).itemsize,
    )
    ws, ci_p, e_p, co_p = (
        plan["ws"], plan["ci_p"], plan["e_p"], plan["co_p"]
    )
    chunk_e, resident = plan["chunk_e"], plan["resident"]
    th, n_rg = plan["th"], plan["n_rg"]
    c_out = w_proj.shape[-1]
    hid_rows = _round_up(h_dim, 8)

    if in_prepadded:
        # xf is already the kernel's padded layout (written by the
        # previous block with out_pad == pad): halo rows first, channels
        # tile-padded, rows covering this block's grid.
        assert xf.shape[1] == ci_p, (xf.shape, ci_p)
        assert xf.shape[2] >= (n_rg * th + 2 * pad) * ws, (
            xf.shape, n_rg, th, pad, ws
        )
        xp = xf
    else:
        xp = prepad_flat(xf, h_dim, w_dim, pad, ci_p, th, n_rg, ws)

    if out_pad:
        out_rows_total = max(
            out_rows or 0, out_pad + n_rg * th, h_dim + 2 * out_pad
        )
    else:
        out_rows_total = n_rg * th

    f32 = jnp.float32
    dtype = xf.dtype

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
        _flat_kernel,
        th=th, n_rg=n_rg, pad=pad, k=k, w=w_dim, ws=ws,
        h_valid=h_dim, expand=expand, pre_act=pre_act, identity=identity,
        resident=resident, out_dtype=dtype, chunk_e=chunk_e,
        out_pad=out_pad, abl_taps=_abl_taps, abl_se=_abl_se,
        abl_proj=_abl_proj,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    rl = (th + 2 * pad) * ws
    tl = th * ws
    y_full, _hid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[anyspec] + [vspec] * 10,
        out_specs=[anyspec, anyspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, co_p, out_rows_total * ws), dtype),
            # HBM hidden scratch (ONE image, reused across the sequential
            # grid): minimal dummy when the hidden is VMEM-resident.
            jax.ShapeDtypeStruct(
                (e_p, n_rg * tl) if not resident else (8, _LANE),
                dtype,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ci_p, rl), dtype),                     # x_buf
            pltpu.VMEM((2, ci_p, tl), dtype),                     # xr_buf
            pltpu.VMEM((2, co_p, tl), dtype),                     # y_buf
            pltpu.VMEM(
                (2, e_p, tl) if not resident else (1, 8, _LANE),
                dtype,
            ),                                                    # hio_buf
            pltpu.VMEM(
                (n_rg, e_p, tl) if resident else (1, 8, _LANE),
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
    if out_pad:
        # Halo-chained: hand the padded layout straight to the next
        # block (valid rows at [out_pad, out_pad + H), halo rows written
        # in-kernel, channels stay tile-padded).
        return y_full
    if n_rg * th != h_dim or co_p != c_out or ws != w_dim:
        y_full = y_full.reshape(b, co_p, n_rg * th, ws)
        y_full = y_full[:, :c_out, :h_dim, :w_dim]
        return y_full.reshape(b, c_out, h_dim * w_dim)
    return y_full


def flat_block_apply_f(
    params, xf, h_dim: int, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    row_group: int | None = None, force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
    in_prepadded: bool = False, out_pad: int = 0,
    out_rows: int | None = None, w_dim: int | None = None,
    **abl,
):
    """One DepthWiseConv block (mobilenetv2.py:95-165) on a flat NCHW
    (B, C, H*W) activation through the flat-lane megakernel.  Folded-BN
    inference semantics as ``fused_block.fused_block_apply``; stride-1
    only."""
    c_in = xf.shape[1]
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
    if in_prepadded:
        # xf carries tile-padded channels; the true c_in is in the weights.
        c_in = w_exp.shape[0] if expand else w_dw.shape[-1]
    return flat_expand_dw_project(
        xf,
        None if w_exp is None else w_exp,
        w_dw,
        params["SELayer_0"],
        wp,
        kernel_size,
        h_dim,
        pre_act=expand,
        b_expand=b_exp,
        b_dw=b_dw,
        proj_bias=proj_bias,
        identity=use_identity and c_in == c_out,
        row_group=row_group,
        interpret=interpret,
        force_resident=force_resident,
        chunk_e=chunk_e,
        in_prepadded=in_prepadded,
        out_pad=out_pad,
        out_rows=out_rows,
        w_dim=w_dim,
        **abl,
    )


def _hardswish_f32(x):
    return _hardswish(x.astype(jnp.float32))


def upsample_smooth_apply_nchw(params, x, dtype=jnp.bfloat16):
    """NCHW twin of ``fused_block.upsample_smooth_apply``: nearest-x2
    upsample + 3x3 expand==1 smoothing block, phase-folded to
    quarter-area compute, on a (B, C, H, W) activation.

    Identical math (same per-phase pre-summed weights, same f32 rounding
    points); only the axis bookkeeping differs: channels broadcast over
    axis 1, the projection contracts axis 1, and the final phase
    interleave expands H on axis 2 and W on axis 3.
    """
    b, c, h, w = x.shape
    x = x.astype(dtype)
    w_dw = params["DepthwiseConv2D_0"]["kernel"][:, :, 0, :]  # (3, 3, C)
    w_proj = params["Conv_0"]["kernel"][0, 0]

    def fold(wk):
        return {
            0: jnp.stack([wk[0], wk[1] + wk[2]]),
            1: jnp.stack([wk[0] + wk[1], wk[2]]),
        }

    xe = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
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
                        xe[:, :, a + u : a + u + h, bb + v : bb + v + w]
                        * wab[u, v][None, :, None, None]
                    )
                    acc = term if acc is None else acc + term
            ph = _hardswish_f32(acc)
            sums = sums + jnp.sum(ph, axis=(2, 3))
            phases[(a, bb)] = ph.astype(dtype)

    d0, d1 = params["SELayer_0"]["Dense_0"], params["SELayer_0"]["Dense_1"]
    mean = sums / (4.0 * h * w)
    g = jax.nn.relu(mean @ d0["kernel"] + d0["bias"])
    g = jnp.clip(g @ d1["kernel"] + d1["bias"], 0.0, 1.0)
    gate = g[:, :, None, None].astype(dtype)

    outs = {}
    for key, ph in phases.items():
        y = jnp.einsum(
            "bchw,cd->bdhw", ph * gate, w_proj.astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        outs[key] = y + x

    cols0 = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=4)  # (b,c,h,w,2)
    cols1 = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=4)
    full = jnp.stack(
        [cols0.reshape(b, c, h, 2 * w), cols1.reshape(b, c, h, 2 * w)],
        axis=3,
    )  # (b, c, h, 2, 2w)
    return full.reshape(b, c, 2 * h, 2 * w)


def _stride_ok(w: int) -> bool:
    """Hard eligibility on width: the physical row stride is W rounded up
    to the 128-lane tile, and pad columns are wasted VPU work — cap the
    waste at 1/3 (W=320 -> stride 384, 17% waste: eligible; W=64 ->
    stride 128, 50% waste: not)."""
    ws = _round_up(w, _LANE)
    return 3 * (ws - w) <= ws


def _flat_eligible(k: int, c_in: int, w: int, mode: str) -> bool:
    """Measured per-block dispatch (v5e, 512px b8 A/B vs the round-2
    fused kernel): the flat kernel wins on the thin-channel k3 tail
    (16ch@512: 1.30x; the fused kernel's 24->128 lane padding wastes
    ~80% of its VPU work there), is par on 80ch@256 (0.98x), and at
    512px b8 end-to-end "flat-all" routing measured 55.7 img/s vs 49.3
    for the round-2 policy.  "tail" = the measured-safe set; "all" =
    every stride-eligible stride-1 block."""
    if not _stride_ok(w):
        return False
    if mode == "all":
        return True
    return k == 3 and c_in <= 24


def _choose_impl(
    c_in: int, c_out: int, k: int, t, h: int, w: int, mode: str
) -> str:
    """Per-block lowering choice ("flat" | "fused" | "xla") for the flat
    chains.

    "auto" consults the autotuned policy table (ops/pallas/policy.py,
    written by scripts/autotune_blocks.py) and falls back to the "tail"
    heuristic for unmeasured shapes; "tail"/"all" keep the hand-measured
    sets.  A "flat" verdict is clamped to the kernel's hard eligibility:
    pad-column waste <= 1/3 (see _stride_ok).  (k5 t6 was excluded here
    while its Mosaic compile exceeded 15 minutes; the compile-cost-aware
    row-group cap in ``flat_expand_dw_project`` brings it to ~50 s, so it
    is eligible again and the tuned policy decides.)"""
    flat_ok = _stride_ok(w)
    if mode == "auto":
        from .policy import best_impl

        best = best_impl(c_in, c_out, 1, k, t, h, w)
        if best == "flat" and not flat_ok:
            best = None
        if best is None:
            best = "flat" if flat_ok and k == 3 and c_in <= 24 else "fused"
        return best
    if mode == "all":
        return "flat" if flat_ok else "fused"
    return "flat" if flat_ok and k == 3 and c_in <= 24 else "fused"


def _plan_impls(descs: list[dict], mode: str) -> list[str]:
    """Dispatch plan for a whole chain of blocks.

    ``descs`` rows: c_in, c_out, k, t, h, w (+ force_nhwc / nhwc_out
    flags).  In "auto" mode, runs the layout-aware DP over the tuned
    table (policy.plan_chain) so NHWC<->flat transpose costs are charged
    only at real layout boundaries; any missing table entry falls the
    whole chain back to the per-block heuristic choice (which remains
    correct, just transition-blind)."""
    if mode == "auto":
        from .policy import block_key, plan_chain

        blocks = []
        for d in descs:
            stride = d.get("stride", 1)
            blocks.append({
                "key": block_key(
                    d["c_in"], d["c_out"], stride, d["k"], d["t"],
                    d["h"], d["w"]
                ),
                "flat_ok": _stride_ok(d["w"]),
                "stride2": stride == 2,
                "force_nhwc": d.get("force_nhwc", False),
                "nhwc_out": d.get("nhwc_out", False),
                "est_bytes": 8 * d["c_in"] * d["h"] * d["w"] * 2,
            })
        planned = plan_chain(blocks)
        if planned is not None:
            return planned

    def heuristic(d):
        if d.get("force_nhwc"):
            return "xla"
        if d.get("stride", 1) == 2:
            # s2-eligible (force_nhwc is False).  Tuned verdicts at 512px:
            # flat2 wins the k5 instance (e4: 5.0 vs 7.3 ms) but LOSES the
            # thin-channel k3 instance (e2: 24.2 vs 8.8 ms — the 4-plane
            # prep doubles input traffic at 16ch and the half-width lane
            # geometry underfills the VPU), so the untuned-shape heuristic
            # routes only k5 through the s2d kernel.  "all" (the
            # route-every-eligible-block A/B mode) still takes flat2.
            if mode == "all":
                return "flat2"
            return "flat2" if d["k"] == 5 else "xla"
        return _choose_impl(
            d["c_in"], d["c_out"], d["k"], d["t"], d["h"], d["w"], mode
        )

    return [heuristic(d) for d in descs]


def decoder_descs(decoder_conv_shapes, h: int, w: int) -> list[dict]:
    """Per-block chain descriptors for the decoder at input (h, w): the
    input to ``_plan_impls``.  Single source of truth shared by
    ``decode_flat`` and bench provenance reporting."""
    shapes = decoder_conv_shapes
    descs = []
    hh, ww = h, w
    for i, shape in enumerate(shapes[:-1]):
        k_i, t_i = shape[3], shape[4]
        descs.append(dict(c_in=shape[0], c_out=shape[1], k=k_i, t=t_i,
                          h=hh, w=ww))
        if shape[0] != shape[1] and i + 6 < len(shapes):
            hh, ww = hh * 2, ww * 2
    return descs


def encoder_descs(
    enc_conv_shapes, h: int, w: int, out_layers, expand_ratio: int
) -> list[dict]:
    """Per-block chain descriptors for encoder blocks 1.. at post-stem
    resolution (h, w): the input to ``_plan_impls``.  Single source of
    truth shared by ``encode_flat`` and bench provenance reporting."""
    from .flatblock_s2 import s2_eligible

    shapes = enc_conv_shapes
    descs = []
    hh, ww = h, w
    for i, row in enumerate(shapes[1:], start=1):
        _, _, stride, k_i, t_i = row
        if i == len(shapes) - 1:
            k_i, t_i = 3, expand_ratio
        descs.append(dict(
            c_in=row[0], c_out=row[1], k=k_i, t=t_i, h=hh, w=ww,
            stride=stride,
            force_nhwc=stride != 1 and not s2_eligible(hh, ww),
            nhwc_out=i in out_layers,
        ))
        hh, ww = hh // stride, ww // stride
    return descs


def planned_chains(cfg, size: int, enc_mode: str, dec_mode: str) -> dict:
    """The dispatch plan the engine will actually execute at ``size`` —
    one impl name per block for the encoder and decoder chains.  Bench
    provenance (VERDICT r4 item 4): records WHICH route produced a number.
    Non-flat modes ("fused"/"mega") bypass the planner entirely."""
    out = {}
    if enc_mode in ("flat", "flat-all", "auto"):
        mode = {"flat": "tail", "flat-all": "all", "auto": "auto"}[enc_mode]
        out["enc"] = _plan_impls(
            encoder_descs(cfg.enc_conv_shapes, size, size,
                          cfg.enc_out_layers, cfg.expand_ratio),
            mode,
        )
    else:
        out["enc"] = [enc_mode] * (len(cfg.enc_conv_shapes) - 1)
    if dec_mode in ("flat", "flat-all", "auto"):
        mode = {"flat": "tail", "flat-all": "all", "auto": "auto"}[dec_mode]
        out["dec"] = _plan_impls(
            decoder_descs(cfg.decoder_conv_shapes, size // 8, size // 8),
            mode,
        )
    else:
        out["dec"] = [dec_mode] * (len(cfg.decoder_conv_shapes) - 1)
    return out


def decode_flat(
    dec_params,
    z: jnp.ndarray,
    decoder_conv_shapes,
    exporting: bool = True,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    flat_blocks: str = "tail",
    stop_after: int | None = None,
):
    """Decoder.__call__ (models.py:306-320) with flat-eligible blocks
    (see ``_flat_eligible``) running through the flat-lane NCHW
    megakernel.

    The chain transposes NHWC -> NCHW at the first eligible block and
    transposes back at the first ineligible one (at the default "tail"
    policy that is one transition pair around blocks 11-13 at 512px);
    NHWC sections run the measured round-2 policy
    (``fused_block.block_apply``) and upsamples run phase-folded in
    whichever layout is live.
    """
    from .fused_block import (
        block_apply,
        upsample_smooth_apply,
        xla_block_apply,
    )

    shapes = decoder_conv_shapes

    # Whole-chain dispatch plan (layout-transition-aware in "auto" mode).
    impls = _plan_impls(
        decoder_descs(shapes, z.shape[1], z.shape[2]), flat_blocks
    )

    def upsample_after(i):
        return shapes[i][0] != shapes[i][1] and i + 6 < len(shapes)

    x = z  # NHWC when not None
    x4 = None  # NCHW (B, C, H, W) when not None
    n = len(shapes) - 1
    i = 0
    while i < n:
        shape = shapes[i]
        should_upsample = upsample_after(i)
        k, t = shape[3], shape[4]
        if impls[i] == "flat":
            # Halo-chain the maximal run of consecutive flat blocks at
            # this resolution (runs break at upsamples): the XLA
            # pad/slice HBM round trips between blocks — measured ~3.5 ms
            # per 512px block, ~45% of a thin block's total — collapse to
            # one prep at entry and one slice at exit.
            j = i
            while (not upsample_after(j) and j + 1 < n
                   and impls[j + 1] == "flat"
                   and (stop_after is None or j + 1 <= stop_after)):
                j += 1
            if x4 is None:
                x4 = jnp.transpose(x.astype(dtype), (0, 3, 1, 2))
                x = None
            b, c, h, w = x4.shape
            plans = [
                plan_flat_block(
                    shapes[m][0], shapes[m][0] * shapes[m][4],
                    shapes[m][1], shapes[m][3], h, w,
                    expand=shapes[m][4] != 1,
                )
                for m in range(i, j + 1)
            ]
            cur = x4.reshape(b, c, h * w)
            for m in range(i, j + 1):
                last = m == j
                out_pad = out_rows = None
                if not last:
                    nxt = plans[m - i + 1]
                    out_pad = nxt["pad"]
                    out_rows = max(
                        out_pad + plans[m - i]["n_rg"] * plans[m - i]["th"],
                        nxt["n_rg"] * nxt["th"] + 2 * nxt["pad"],
                    )
                cur = flat_block_apply_f(
                    dec_params[f"decoder_blocks_{m}"]["DepthWiseConv_0"],
                    cur, h, shapes[m][3], shapes[m][4],
                    interpret=interpret,
                    in_prepadded=m > i, w_dim=w if m > i else None,
                    out_pad=0 if last else out_pad,
                    out_rows=out_rows,
                )
            x4 = cur.reshape(b, cur.shape[1], h, w)
            if upsample_after(j):
                x4 = upsample_smooth_apply_nchw(
                    dec_params[f"decoder_blocks_{j}"]["DepthWiseConv_1"],
                    x4, dtype,
                )
            i = j + 1
            if stop_after is not None and i > stop_after:
                break
            continue
        blk = dec_params[f"decoder_blocks_{i}"]
        if x is None:
            x = jnp.transpose(x4, (0, 2, 3, 1))
            x4 = None
        if impls[i] == "xla":
            x = xla_block_apply(
                blk["DepthWiseConv_0"], x, k, 1, t, dtype=dtype,
            )
        else:
            x = block_apply(
                blk["DepthWiseConv_0"], x, k, t, interpret=interpret,
                dtype=dtype,
            )
        if should_upsample:
            x = upsample_smooth_apply(blk["DepthWiseConv_1"], x, dtype)
        i += 1
        if stop_after is not None and i > stop_after:
            break
    if x4 is not None:
        x = jnp.transpose(x4, (0, 2, 3, 1))
    if stop_after is not None and stop_after < n - 1:
        return x.astype(jnp.float32)  # profiling prefix: skip the head
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


def encode_flat(
    enc_params,
    enc_stats,
    x: jnp.ndarray,
    enc_conv_shapes,
    out_layers,
    expand_ratio: int = 3,
    interpret: bool = False,
    dtype=jnp.bfloat16,
    flat_blocks: str = "tail",
    stop_after: int | None = None,
):
    """Encoder.__call__ (models.py:158-184) with folded-BN inference
    semantics, routing the flat-eligible stride-1 blocks (see
    ``_flat_eligible``: at the default policy, block 1 at full res and
    block 3 at half res — the thin-channel high-resolution blocks where
    the flat kernel measures fastest) through the flat-lane NCHW
    megakernel.  Stride-2 blocks and the rest keep the measured round-2
    policy (``fused_block.block_apply``).
    """
    from .fused_block import _hardswish as fb_hardswish
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
    if stop_after == 0:
        return [h]

    # Whole-chain dispatch plan (layout-transition-aware in "auto" mode).
    impls = _plan_impls(
        encoder_descs(shapes, h.shape[1], h.shape[2], out_layers,
                      expand_ratio),
        flat_blocks,
    )

    n_total = len(shapes) - 1

    def kt(i):
        stride, k, t = shapes[i][2], shapes[i][3], shapes[i][4]
        if i == n_total:
            k, t = 3, expand_ratio  # models.py:154, SURVEY.md defect 6
        return stride, k, t

    def impl_of(i):
        im = impls[i - 1]
        if shapes[i][2] != 1 and im != "flat2":
            return "xla"
        return im

    # Chain state: exactly one of ``h`` (NHWC) / ``cur`` (flat NCHW
    # (B, C, hh*ww), or a consumer-prepadded layout when ``pre``) is live.
    cur = None
    hh = ww = None
    pre = False
    i = 1
    while i <= n_total:
        stride, k, t = kt(i)
        impl = impl_of(i)
        blk = enc_params[f"mob_net_{i}"]
        st = enc_stats[f"mob_net_{i}"]
        if impl == "flat2":
            # Space-to-depth stride-2 megakernel (flatblock_s2): the
            # t-expanded input-res hidden never round-trips HBM.
            from .flatblock_s2 import flat_s2_block_apply_f

            if cur is None:
                hh, ww = h.shape[1], h.shape[2]
                cur = jnp.transpose(h.astype(dtype), (0, 3, 1, 2))
                cur = cur.reshape(cur.shape[0], cur.shape[1], hh * ww)
                h = None
            assert not pre  # flat2 never receives a prepadded layout
            # Halo-chain out into a following stride-1 flat block.
            out_pad, out_rows = 0, None
            if (i not in out_layers and i < n_total
                    and impl_of(i + 1) == "flat"
                    and (stop_after is None or i + 1 <= stop_after)):
                _, k2, t2 = kt(i + 1)
                nxt = plan_flat_block(
                    shapes[i + 1][0],
                    shapes[i + 1][0] * t2 if t2 != 1 else shapes[i + 1][0],
                    shapes[i + 1][1], k2, hh // 2, ww // 2,
                    expand=t2 != 1,
                )
                out_pad = nxt["pad"]
                out_rows = nxt["n_rg"] * nxt["th"] + 2 * nxt["pad"]
            cur = flat_s2_block_apply_f(
                blk, cur, hh, k, t, stats=st, interpret=interpret,
                out_pad=out_pad, out_rows=out_rows,
            )
            hh, ww = hh // 2, ww // 2
            pre = out_pad > 0
        elif impl == "flat":
            # Halo-chain the maximal run of consecutive flat blocks
            # (same resolution — stride-2 routes flat2/xla; runs break
            # at tap outputs, which need the sliced NHWC layout).
            j = i
            while (j < n_total and impl_of(j + 1) == "flat"
                   and j not in out_layers
                   and (stop_after is None or j + 1 <= stop_after)):
                j += 1
            if cur is None:
                hh, ww = h.shape[1], h.shape[2]
                cur = jnp.transpose(h.astype(dtype), (0, 3, 1, 2))
                cur = cur.reshape(cur.shape[0], cur.shape[1], hh * ww)
                h = None
            plans = []
            for m in range(i, j + 1):
                _, km, tm = kt(m)
                plans.append(plan_flat_block(
                    shapes[m][0],
                    shapes[m][0] * tm if tm != 1 else shapes[m][0],
                    shapes[m][1], km, hh, ww, expand=tm != 1,
                ))
            for idx, m in enumerate(range(i, j + 1)):
                _, km, tm = kt(m)
                last = m == j
                out_pad = out_rows = None
                if not last:
                    nxt = plans[idx + 1]
                    out_pad = nxt["pad"]
                    out_rows = max(
                        out_pad + plans[idx]["n_rg"] * plans[idx]["th"],
                        nxt["n_rg"] * nxt["th"] + 2 * nxt["pad"],
                    )
                prepadded = idx > 0 or pre
                cur = flat_block_apply_f(
                    enc_params[f"mob_net_{m}"], cur, hh, km, tm,
                    stats=enc_stats[f"mob_net_{m}"], interpret=interpret,
                    in_prepadded=prepadded,
                    w_dim=ww if prepadded else None,
                    out_pad=0 if last else out_pad,
                    out_rows=out_rows,
                )
            pre = False
            i = j
        else:
            if h is None:
                assert not pre
                b = cur.shape[0]
                h = jnp.transpose(
                    cur.reshape(b, cur.shape[1], hh, ww), (0, 2, 3, 1)
                )
                cur = None
            if stride != 1:
                h = xla_block_apply(blk, h, k, stride, t, stats=st,
                                    dtype=dtype)
            elif impl == "xla":
                h = xla_block_apply(blk, h, k, 1, t, stats=st, dtype=dtype)
            else:
                h = block_apply(
                    blk, h, k, t, stats=st, interpret=interpret,
                    dtype=dtype,
                )

        def as_nhwc():
            if h is not None:
                return h
            assert not pre
            b = cur.shape[0]
            return jnp.transpose(
                cur.reshape(b, cur.shape[1], hh, ww), (0, 2, 3, 1)
            )

        if i in out_layers:
            outs.append(as_nhwc())
        if stop_after is not None and i >= stop_after:
            return [as_nhwc()]
        i += 1
    return outs


def flat_block_apply(
    params, x, kernel_size: int, expand_ratio: int,
    use_identity: bool = True, stats=None, interpret: bool = False,
    dtype=jnp.bfloat16, row_group: int | None = None,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
):
    """NHWC wrapper: transpose to flat NCHW -> ``flat_block_apply_f`` ->
    transpose back.  Drop-in equivalent of
    ``fused_block.fused_block_apply`` (same parameter tree, same
    folded-BN inference semantics), stride-1 only.  Prefer the _f form
    and keep the whole chain flat — the boundary transposes cost one HBM
    round trip each."""
    b, h, w, c = x.shape
    xf = jnp.transpose(x.astype(dtype), (0, 3, 1, 2)).reshape(b, c, h * w)
    yf = flat_block_apply_f(
        params, xf, h, kernel_size, expand_ratio,
        use_identity=use_identity, stats=stats, interpret=interpret,
        row_group=row_group, force_resident=force_resident,
        chunk_e=chunk_e,
    )
    co = yf.shape[1]
    return jnp.transpose(yf.reshape(b, co, h, w), (0, 2, 3, 1))
