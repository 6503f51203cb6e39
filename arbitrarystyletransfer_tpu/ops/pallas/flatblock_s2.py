"""Stride-2 flat-lane (NCHW) megakernel for the inverted-residual block.

The encoder's three stride-2 blocks (enc_conv_shapes rows 2/4/7 —
reference mobilenetv2.py:119-148 with stride s=2) were the last blocks
pinned to the plain-XLA NHWC path: profile_prefix/probe_stride2 measured
e2 (16->24 s2 k3 t6 @512) at 12.5 ms and e4 (24->40 s2 k5 t6 @256) at
12.2 ms per stacked b16 pass vs a ~3 ms roofline each, because XLA
materializes the t6-expanded hidden at INPUT resolution in HBM (e2:
96ch x 512^2 = 50 MB/img written + read around the strided depthwise).

This kernel never round-trips the input-resolution hidden: like
``flatblock._flat_kernel`` it streams row slabs through VMEM (expand ->
hardswish -> depthwise -> hardswish -> exact SE sums in sweep 1; SE gate
in-kernel; gate -> project in sweep 2), and the post-depthwise hidden it
keeps is at OUTPUT resolution — 4x smaller, VMEM-resident for every
model shape at 512px.

The stride-2 depthwise itself is lowered via **space-to-depth**: the
host prep splits the reflect-row-padded input into its four (row-phase,
col-phase) parity planes at half resolution.  Output pixel (i, j) taps
input (2i + di - p, 2j + dj - p); parity splits make every tap a
*stride-1* access into one plane:

    row: physical padded row 2i + di  ->  plane di%2, row  i + di//2
    col: 2j + dj - p  ->  col-plane (dj-p)%2, position j + (dj-p-cp)/2

so a tap is (plane select, static W-aligned row slice, lane shift by
s in {-1, 0, +1}).  Lane shifts reuse the flat kernel's rolled-tile
scheme (one ``pltpu.roll`` per distinct (plane, shift)), and the
reflect-pad column corrections reuse its patch argument: reflection
preserves column parity (reflect(c) = -c or 2(W-1)-c with W even), so a
wrapped tap's true value always lives in a *same-plane* tile at another
shift already present in the roll set (asserted in ``_s2_patch_pairs``).

Semantics are identical to ``fused_block.xla_block_apply(stride=2)``
(same op order, same f32<->I/O-dtype rounding points as the stride-1
flat kernel).  Block reference: mobilenetv2.py:119-148 (expand path,
``padding=(k-1)//2, padding_mode="reflect"``); SELayer:
mobilenetv2.py:63-81.  Stride-2 blocks never carry the residual
(mobilenetv2.py:99: identity iff stride==1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_block import bn_fold
from .megablock import _SUB, _LANE, _VMEM_BUDGET, _hardswish, _round_up
from .flatblock import _reflect


def _s2_taps(k: int):
    """(di, dj) -> (plane q, row offset ro, lane shift s) for the
    space-to-depth stride-2 depthwise.  Planes ordered
    q = 2*(row-phase) + col-phase."""
    p = (k - 1) // 2
    taps = []
    for di in range(k):
        rp, ro = di % 2, di // 2
        for dj in range(k):
            cp = (dj - p) % 2
            s = (dj - p - cp) // 2
            taps.append((di, dj, 2 * rp + cp, ro, s))
    return taps


def _s2_patch_pairs(k: int, w_in: int):
    """Reflect-pad boundary corrections: [(dj, j_bad, s_src)].

    A tap at shift s reads position j + s; at j_bad that leaves [0, Wo)
    — the true input column is c = 2*j_bad + dj - p (outside [0, W)),
    whose reflection c' = reflect(c, W) has the SAME parity (W even:
    -c = c mod 2 and 2(W-1)-c = c mod 2), i.e. lives in the same
    col-phase plane at position c'//2 = j_bad + s_src."""
    p = (k - 1) // 2
    wo = w_in // 2
    pairs = []
    for dj in range(k):
        cp = (dj - p) % 2
        s = (dj - p - cp) // 2
        bad = []
        if s < 0:
            bad += list(range(0, -s))
        if s > 0:
            bad += list(range(wo - s, wo))
        for j in bad:
            c = 2 * j + dj - p
            assert not (0 <= c < w_in), (k, w_in, dj, j)
            cr = _reflect(c, w_in)
            assert cr % 2 == cp, (c, cr, cp)
            s_src = cr // 2 - j
            pairs.append((dj, j, s_src))
    return pairs


def _s2_needed_tiles(k: int, w_in: int):
    """All (plane q, shift s) tiles the tap loop reads (taps + patch
    sources), and a sanity check that every patch source is in the roll
    set of its own column phase."""
    taps = _s2_taps(k)
    p = (k - 1) // 2
    shifts_by_cp = {0: set(), 1: set()}
    for _, dj, q, _, s in taps:
        shifts_by_cp[q % 2].add(s)
    for dj, _, s_src in _s2_patch_pairs(k, w_in):
        cp = (dj - p) % 2
        assert s_src in shifts_by_cp[cp], (k, w_in, dj, s_src)
    needed = set()
    for rp in (0, 1):
        for cp in (0, 1):
            for s in shifts_by_cp[cp]:
                needed.add((2 * rp + cp, s))
    return sorted(needed)


def _flat_s2_kernel(
    # inputs
    xp_ref, we_ref, wd_ref, be_ref, bd_ref,
    d0k_ref, d0b_ref, d1k_ref, d1b_ref, wp_ref, pb_ref,
    # outputs
    y_ref, hid_hbm_ref,
    # scratch
    x_buf, y_buf, hio_buf, hid_vmem, acc, gate, sx, sy, sh,
    *,
    th: int, n_rg: int, k: int, w_in: int, w_out: int, ws: int,
    h_out: int, resident: bool, out_dtype, chunk_e: int | None = None,
    out_pad: int = 0,
):
    b = pl.program_id(0)
    p = (k - 1) // 2
    re = th + p                 # even-row-plane slab rows
    ro_rows = th + p - 1        # odd-row-plane slab rows
    plane_rows = (re, re, ro_rows, ro_rows)
    pw = re * ws                # per-plane VMEM slab lanes (uniform)
    tl = th * ws                # output lanes per row-group
    n_pixels = float(h_out * w_out)
    taps = _s2_taps(k)
    patches = _s2_patch_pairs(k, w_in)
    needed = _s2_needed_tiles(k, w_in)

    def x_dma(r, slot, q):
        return pltpu.make_async_copy(
            xp_ref.at[b, q, :, pl.ds(r * tl, plane_rows[q] * ws)],
            x_buf.at[slot, q, :, pl.ds(0, plane_rows[q] * ws)],
            sx.at[slot, q],
        )

    def x_start(r, slot):
        for q in range(4):
            x_dma(r, slot, q).start()

    def x_wait(r, slot):
        for q in range(4):
            x_dma(r, slot, q).wait()

    def y_dma(r, slot):
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

    def expand_dw_chunk(slot, colmod, lo, hi):
        """Hidden channels [lo, hi) of one output row slab: per-plane
        expand -> hswish -> stride-2 depthwise via parity taps -> hswish."""
        tiles = {}
        exs = []
        for q in range(4):
            ex = jnp.dot(
                we_ref[lo:hi], x_buf[slot, q],
                preferred_element_type=jnp.float32,
            ) + be_ref[lo:hi]
            ex = _hardswish(ex)
            # Round to the I/O dtype BEFORE the depthwise — exactly where
            # xla_block_apply rounds — then back to f32 (Mosaic's lane
            # rotate is 32-bit only, see flatblock._flat_kernel).
            exs.append(ex.astype(out_dtype).astype(jnp.float32))
        for q, s in needed:
            tiles[(q, s)] = (
                exs[q] if s == 0 else pltpu.roll(exs[q], (-s) % pw, 1)
            )

        out = None
        for di, dj, q, ro, s in taps:
            tile = tiles[(q, s)][:, ro * ws : ro * ws + tl]
            for pdj, j_bad, s_src in patches:
                if pdj != dj:
                    continue
                alt = tiles[(q, s_src)][:, ro * ws : ro * ws + tl]
                tile = jnp.where(colmod == j_bad, alt, tile)
            term = tile * wd_ref[di * k + dj, lo:hi]
            out = term if out is None else out + term
        return _hardswish(out + bd_ref[lo:hi]).astype(out_dtype)

    acc[...] = jnp.zeros_like(acc)
    x_start(0, 0)

    # Within-row column index of every output lane (reflect patches + SE
    # pad-column masking).
    colmod = jax.lax.rem(
        jax.lax.broadcasted_iota(
            jnp.int32, (chunks[0][1] - chunks[0][0], tl), 1
        ),
        ws,
    )

    def sweep1(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            x_start(r + 1, 1 - slot)

        x_wait(r, slot)
        if not resident:
            @pl.when(r >= 2)
            def _():
                ho_dma(r - 2, slot).wait()

        for lo, hi in chunks:
            cm = colmod if hi - lo == chunks[0][1] else colmod[: hi - lo]
            out = expand_dw_chunk(slot, cm, lo, hi)
            if resident:
                hid_vmem[r, lo:hi] = out
            else:
                hio_buf[slot, lo:hi] = out

            # Exact SE sums over the bf16-rounded hidden; mask padded
            # tail rows and (ws > w_out) pad columns.
            outf = out.astype(jnp.float32)
            if h_out < n_rg * th or ws != w_out:
                lane_i = (
                    jax.lax.broadcasted_iota(jnp.int32, outf.shape, 1)
                    + r * tl
                )
                valid = lane_i // ws < h_out
                if ws != w_out:
                    valid &= jax.lax.rem(lane_i, ws) < w_out
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

    # ---- sweep 2: gate -> project -> +bias -> y out (no identity) -------
    if not resident:
        hi_dma(0, 0).start()

    def sweep2(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            if not resident:
                hi_dma(r + 1, 1 - slot).start()

        if resident:
            hv = hid_vmem[r]
        else:
            hi_dma(r, slot).wait()
            hv = hio_buf[slot]
        # Match the XLA epilogue's rounding: gate multiply in the hidden
        # dtype, f32 matmul accumulation, +bias (f32), cast.
        hv = hv * gate[...].astype(out_dtype)
        y = jnp.dot(
            wp_ref[...], hv, preferred_element_type=jnp.float32
        )
        y = (y + pb_ref[...]).astype(out_dtype)

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

    # Halo-chained output (same as flatblock._flat_kernel): write the
    # NEXT (stride-1) block's reflect rows in place.
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
            row_copy(out_pad + h_out - 1 + j, out_pad + h_out - 1 - j)


def _s2_work_bytes(th, p, ws, ci_p, e, co_p, resident_hid, k,
                   chunk_e=None):
    """Per-row-group VMEM working set (excludes the resident hidden)."""
    re = th + p
    e_live = e if chunk_e is None else min(e, chunk_e)
    n_rolled = len([1 for q, s in _s2_needed_tiles(k, 128) if s != 0])
    b = 2 * 4 * ci_p * re * ws * 2          # x plane slabs x2 slots
    # 4 f32 ex planes + rolled copies + dw accumulator + select margin
    b += (4 + n_rolled + 2) * e_live * re * ws * 4
    b += 2 * co_p * th * ws * 2             # y_buf x2
    if not resident_hid:
        b += 2 * e * th * ws * 2            # hid slab buf x2
    return b


def plan_flat_s2_block(
    c_in: int,
    e: int,
    c_out: int,
    k: int,
    h_in: int,
    w_in: int,
    row_group: int | None = None,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
):
    """Static launch plan for one stride-2 flat block (output-resolution
    row grid)."""
    p = (k - 1) // 2
    h_out, w_out = h_in // 2, w_in // 2
    ws = _round_up(w_out, _LANE)
    ci_p = _round_up(c_in, _SUB)
    co_p = _round_up(c_out, _SUB)
    e_p = _round_up(e, _SUB)

    if chunk_e == "auto":
        # Uniform chunks only (ragged last chunks crash Mosaic's
        # ApplyVectorLayoutPass — see plan_flat_block).
        if e_p > 128:
            chunk_e = next(
                (c for c in range(64, 7, -8) if e_p % c == 0), 64
            )
        else:
            chunk_e = None

    hid_rows = _round_up(h_out, 8)
    hid_bytes = hid_rows * e_p * ws * 2

    def compile_ok(cand):
        # k5 Mosaic compile cost caps the row group (see plan_flat_block).
        return k < 5 or cand <= 16

    resident = None
    if row_group is None:
        for res in (True, False):
            if res and hid_bytes > _VMEM_BUDGET - 12 * 1024 * 1024:
                continue
            for cand in (8, 16, 32, 64):
                if cand > hid_rows and cand > 8:
                    continue
                if cand > 8 and not compile_ok(cand):
                    continue
                budget = _VMEM_BUDGET - (hid_bytes if res else 0)
                if _s2_work_bytes(cand, p, ws, ci_p, e_p, co_p, res, k,
                                  chunk_e) <= budget:
                    row_group, resident = cand, res
                    break
            if row_group is not None:
                break
        if row_group is None:
            row_group, resident = 8, False
    else:
        resident = hid_bytes + _s2_work_bytes(
            row_group, p, ws, ci_p, e_p, co_p, True, k, chunk_e
        ) <= _VMEM_BUDGET
    if force_resident is not None:
        resident = force_resident
    th = max(8, min(row_group, hid_rows))
    n_rg = -(-h_out // th)
    return dict(
        ws=ws, ci_p=ci_p, e_p=e_p, co_p=co_p, chunk_e=chunk_e,
        row_group=row_group, resident=resident, th=th, n_rg=n_rg, pad=p,
        h_out=h_out, w_out=w_out,
    )


def prepad_s2d(xf, h_in, w_in, k, ci_p, th, n_rg, ws):
    """Host-side space-to-depth prep: reflect-pad rows by p, split the
    padded input into its four (row-phase, col-phase) parity planes at
    half resolution, zero-pad channels/rows/width to the kernel grid.
    Returns (B, 4, Ci_p, Rp*ws) with planes ordered
    [even/even, even/odd, odd/even, odd/odd]."""
    p = (k - 1) // 2
    b, c_in, _ = xf.shape
    w_out = w_in // 2
    x4 = xf.reshape(b, c_in, h_in, w_in)
    xp = jnp.pad(x4, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")
    rp_rows = n_rg * th + p  # plane row grid (covers even-plane taps)
    planes = []
    for rph in (0, 1):
        for cph in (0, 1):
            pq = xp[:, :, rph::2, cph::2]  # (b, c, h_in//2 + p, w_out)
            pq = jnp.pad(
                pq,
                (
                    (0, 0),
                    (0, ci_p - c_in),
                    (0, rp_rows - pq.shape[2]),
                    (0, ws - w_out),
                ),
            )
            planes.append(pq.reshape(b, ci_p, rp_rows * ws))
    return jnp.stack(planes, axis=1)


def flat_s2_expand_dw_project(
    xf: jnp.ndarray,
    w_expand: jnp.ndarray,
    w_dw: jnp.ndarray,
    se_params,
    w_proj: jnp.ndarray,
    kernel_size: int,
    h_dim: int,
    b_expand: jnp.ndarray | None = None,
    b_dw: jnp.ndarray | None = None,
    proj_bias: jnp.ndarray | None = None,
    row_group: int | None = None,
    interpret: bool = False,
    force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
    out_pad: int = 0,
    out_rows: int | None = None,
):
    """Full stride-2 inverted-residual block (expand -> s2 dw -> SE ->
    project, no identity) on a flat NCHW activation ``xf`` of shape
    (B, C, H*W); returns (B, C_out, (H/2)*(W/2)).  ``h_dim`` is the
    INPUT H; H and W must be even.  ``out_pad``/``out_rows``: emit the
    halo-padded flat layout for a consuming stride-1 flat block (same
    contract as ``flatblock.flat_expand_dw_project``)."""
    b = xf.shape[0]
    k = kernel_size
    e = w_dw.shape[-1]
    c_in = w_expand.shape[0]
    assert xf.shape[1] == c_in, (xf.shape, c_in)
    hw = xf.shape[2]
    assert hw % h_dim == 0, (hw, h_dim)
    w_dim = hw // h_dim
    assert h_dim % 2 == 0 and w_dim % 2 == 0, (h_dim, w_dim)

    plan = plan_flat_s2_block(
        c_in, e, w_proj.shape[-1], k, h_dim, w_dim,
        row_group=row_group, force_resident=force_resident,
        chunk_e=chunk_e,
    )
    ws, ci_p, e_p, co_p = (
        plan["ws"], plan["ci_p"], plan["e_p"], plan["co_p"]
    )
    chunk_e, resident = plan["chunk_e"], plan["resident"]
    th, n_rg, p = plan["th"], plan["n_rg"], plan["pad"]
    h_out, w_out = plan["h_out"], plan["w_out"]
    c_out = w_proj.shape[-1]

    xp = prepad_s2d(xf, h_dim, w_dim, k, ci_p, th, n_rg, ws)

    if out_pad:
        out_rows_total = max(
            out_rows or 0, out_pad + n_rg * th, h_out + 2 * out_pad
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

    we = jnp.pad(
        w_expand.astype(dtype).T, ((0, e_p - e), (0, ci_p - c_in))
    )  # (E_p, Ci_p)
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
        _flat_s2_kernel,
        th=th, n_rg=n_rg, k=k, w_in=w_dim, w_out=w_out, ws=ws,
        h_out=h_out, resident=resident, out_dtype=dtype, chunk_e=chunk_e,
        out_pad=out_pad,
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    re = th + p
    tl = th * ws
    y_full, _hid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[anyspec] + [vspec] * 10,
        out_specs=[anyspec, anyspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, co_p, out_rows_total * ws), dtype),
            jax.ShapeDtypeStruct(
                (e_p, n_rg * tl) if not resident else (8, _LANE),
                dtype,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, ci_p, re * ws), dtype),             # x_buf
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
            pltpu.SemaphoreType.DMA((2, 4)),                      # sx
            pltpu.SemaphoreType.DMA((2,)),                        # sy
            pltpu.SemaphoreType.DMA((2,)),                        # sh
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, we, wd, be, bd, d0k, d0b, d1k, d1b, wp, pb)
    if out_pad:
        return y_full
    if n_rg * th != h_out or co_p != c_out or ws != w_out:
        y_full = y_full.reshape(b, co_p, n_rg * th, ws)
        y_full = y_full[:, :c_out, :h_out, :w_out]
        return y_full.reshape(b, c_out, h_out * w_out)
    return y_full


def flat_s2_block_apply_f(
    params, xf, h_dim: int, kernel_size: int, expand_ratio: int,
    stats=None, interpret: bool = False,
    row_group: int | None = None, force_resident: bool | None = None,
    chunk_e: int | None | str = "auto",
    out_pad: int = 0, out_rows: int | None = None,
):
    """One stride-2 DepthWiseConv block (mobilenetv2.py:119-148) on a
    flat NCHW (B, C, H*W) activation through the space-to-depth
    megakernel.  Folded-BN inference semantics as
    ``fused_block.xla_block_apply``; expand path only (every stride-2
    block in the architecture has expand_ratio > 1)."""
    assert expand_ratio != 1, "stride-2 blocks always expand"
    w_dw = params["DepthwiseConv2D_0"]["kernel"][:, :, 0, :]
    w_exp = params["Conv_0"]["kernel"][0, 0]
    w_proj = params["Conv_1"]["kernel"][0, 0]

    b_exp = b_dw = None
    proj_scale = proj_bias = None
    if stats is not None:
        a0, c0 = bn_fold(params["BatchNorm2D_0"], stats["BatchNorm2D_0"])
        a1, c1 = bn_fold(params["BatchNorm2D_1"], stats["BatchNorm2D_1"])
        a2, c2 = bn_fold(params["BatchNorm2D_2"], stats["BatchNorm2D_2"])
        w_exp = w_exp * a0[None, :]
        b_exp = c0
        w_dw = w_dw * a1[None, None, :]
        b_dw = c1
        proj_scale, proj_bias = a2, c2

    wp = w_proj
    if proj_scale is not None:
        wp = wp * proj_scale[None, :]
    return flat_s2_expand_dw_project(
        xf, w_exp, w_dw, params["SELayer_0"], wp, kernel_size, h_dim,
        b_expand=b_exp, b_dw=b_dw, proj_bias=proj_bias,
        row_group=row_group, interpret=interpret,
        force_resident=force_resident, chunk_e=chunk_e,
        out_pad=out_pad, out_rows=out_rows,
    )


def s2_eligible(h_in: int, w_in: int) -> bool:
    """Hard kernel eligibility: even spatial dims and pad-column waste
    of the OUTPUT row stride <= 1/3 (same rule as flatblock._stride_ok,
    applied at output resolution)."""
    if h_in % 2 or w_in % 2:
        return False
    ws = _round_up(w_in // 2, _LANE)
    return 3 * (ws - w_in // 2) <= ws
