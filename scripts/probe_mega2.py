#!/usr/bin/env python
"""Design probes for megakernel v2 (transposed (B, H, C, W) layout).

Round-3 blocker: kernel-managed ``make_async_copy`` on HBM refs requires
the minor (lane) dim to be 128-aligned — NHWC activations (C in
{16..96}) can never satisfy it (Mosaic: "Slice shape along dimension 3
must be aligned to tiling (128), but is 16").  The transposed layout
puts W (512 at full res) in lanes and C (8-aligned) in sublanes, which
also kills the 160->256 lane-padding VPU waste.

Probes (each timed with value-fetch sync + data-dependent chains):
  P1  manual double-buffered row-slab DMA copy rate, grid=(B,), vs XLA copy
  P2a in-kernel batched matmul einsum('rcw,ce->rew') — legality + speed
  P2b per-row unrolled 2D-dot fallback for the same contraction
  P3  transposed depthwise k5 (lane rolls axis=-1 + row slices, exact
      sublanes) vs the NHWC roll-on-sublanes variant
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, x, iters=20, windows=3):
    out = fn(x)
    float(jnp.asarray(out).reshape(-1)[0])
    best = []
    for _ in range(windows):
        c = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(c)
            c = c + 0.0 * jnp.asarray(out).reshape(-1)[0].astype(c.dtype)
        float(jnp.asarray(out).reshape(-1)[0])
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return min(best)


# ---------------------------------------------------------------- P1
def _copy_kernel(x_ref, y_ref, buf, sin, sout, *, th, n_rg):
    b = pl.program_id(0)

    def din(r, slot):
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(r * th, th)], buf.at[slot], sin.at[slot])

    def dout(r, slot):
        return pltpu.make_async_copy(
            buf.at[slot], y_ref.at[b, pl.ds(r * th, th)], sout.at[slot])

    din(0, 0).start()

    def body(r, _):
        slot = jax.lax.rem(r, 2)

        @pl.when(r + 1 < n_rg)
        def _():
            din(r + 1, 1 - slot).start()

        din(r, slot).wait()

        @pl.when(r >= 2)
        def _():
            dout(r - 2, slot).wait()

        dout(r, slot).start()
        return 0

    jax.lax.fori_loop(0, n_rg, body, 0)
    if n_rg >= 2:
        dout(n_rg - 2, (n_rg - 2) % 2).wait()
    dout(n_rg - 1, (n_rg - 1) % 2).wait()


def p1_dma_copy(b, h, c, w, th, dtype):
    n_rg = h // th
    x = jnp.zeros((b, h, c, w), dtype)
    kern = functools.partial(_copy_kernel, th=th, n_rg=n_rg)
    fn = jax.jit(lambda v: pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th, c, w), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(v))
    ms = timed(fn, x)
    gb = 2 * x.size * x.dtype.itemsize / 1e9
    xla = jax.jit(lambda v: v * 1.0)
    ms_xla = timed(xla, x)
    return {"kernel_ms": round(ms, 3), "GBps": round(gb / ms * 1e3, 1),
            "xla_ms": round(ms_xla, 3),
            "xla_GBps": round(gb / ms_xla * 1e3, 1)}


# ---------------------------------------------------------------- P2
def _einsum_kernel(x_ref, w_ref, y_ref):
    y_ref[...] = jnp.einsum(
        "rcw,ce->rew", x_ref[...], w_ref[...],
        preferred_element_type=jnp.float32,
    ).astype(y_ref.dtype)


def _rowloop_kernel(x_ref, w_ref, y_ref, *, th):
    wt = w_ref[...].T  # (E, C)
    for r in range(th):
        y_ref[r] = jnp.dot(
            wt, x_ref[r], preferred_element_type=jnp.float32
        ).astype(y_ref.dtype)


def p2_matmul(th, c, e, w, dtype):
    x = jnp.zeros((th, c, w), dtype)
    wt = jnp.zeros((c, e), dtype)
    out = {}
    for name, kern in (
        ("einsum", _einsum_kernel),
        ("rowloop", functools.partial(_rowloop_kernel, th=th)),
    ):
        try:
            fn = jax.jit(lambda v, kern=kern: pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((th, e, w), dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
            )(v, wt))
            ms = timed(fn, x)
            fl = 2 * th * c * e * w / 1e9
            out[name] = {"ms": round(ms, 3),
                         "GFLOPs": round(fl / ms * 1e3, 1)}
        except Exception as ex:  # noqa: BLE001
            out[name] = {"err": str(ex)[:160]}
    return out


# ---------------------------------------------------------------- P3
def _dw_t_kernel(x_ref, wd_ref, y_ref, *, k, th, w):
    # x: (th+2p, C, W) f32 resident; dw via lane rolls + row slices.
    pad = (k - 1) // 2
    h = x_ref[...]
    out = None
    for dj in range(k):
        hj = pltpu.roll(h, pad - dj, 2) if dj != pad else h
        for di in range(k):
            term = hj[di: di + th] * wd_ref[di, dj][None, :, None]
            out = term if out is None else out + term
    y_ref[...] = out


def _dw_nhwc_kernel(x_ref, wd_ref, y_ref, *, k, th, w):
    # x: (th+2p, Wp, C) f32; rolls on sublane dim 1 (round-2 scheme).
    pad = (k - 1) // 2
    h = x_ref[...]
    wp = h.shape[1]
    out = None
    for dj in range(k):
        hj = pltpu.roll(h, wp - dj, 1) if dj else h
        for di in range(k):
            term = hj[di: di + th, :w, :] * wd_ref[di, dj]
            out = term if out is None else out + term
    y_ref[...] = out


def p3_dw(th, c, w, k, reps):
    pad = (k - 1) // 2
    out = {}
    # transposed: exact sublanes
    x_t = jnp.zeros((th + 2 * pad, c, w), jnp.float32)
    wd = jnp.zeros((k, k, c), jnp.float32)
    try:
        fn = jax.jit(lambda v: pl.pallas_call(
            functools.partial(_dw_t_kernel, k=k, th=th, w=w),
            out_shape=jax.ShapeDtypeStruct((th, c, w), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(v, wd))
        out["transposed_ms"] = round(timed(fn, x_t, iters=reps), 3)
    except Exception as ex:  # noqa: BLE001
        out["transposed_err"] = str(ex)[:160]
    # NHWC with lane padding (C padded to 128 multiple by Mosaic)
    wp_dim = w + 2 * pad
    x_n = jnp.zeros((th + 2 * pad, wp_dim, c), jnp.float32)
    try:
        fn = jax.jit(lambda v: pl.pallas_call(
            functools.partial(_dw_nhwc_kernel, k=k, th=th, w=w),
            out_shape=jax.ShapeDtypeStruct((th, w, c), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(v, wd))
        out["nhwc_ms"] = round(timed(fn, x_n, iters=reps), 3)
    except Exception as ex:  # noqa: BLE001
        out["nhwc_err"] = str(ex)[:160]
    return out


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    res = {}
    if "1" in args.probes:
        res["p1_copy_b8_h512_c160_w512_bf16_th64"] = p1_dma_copy(
            8, 512, 160, 512, 64, jnp.bfloat16)
        res["p1_copy_b8_h512_c96_w512_bf16_th128"] = p1_dma_copy(
            8, 512, 96, 512, 128, jnp.bfloat16)
    if "2" in args.probes:
        res["p2_mm_th32_c40_e160_w512_bf16"] = p2_matmul(
            32, 40, 160, 512, jnp.bfloat16)
        res["p2_mm_th32_c240_e24_w512_bf16"] = p2_matmul(
            32, 240, 24, 512, jnp.bfloat16)
    if "3" in args.probes:
        res["p3_dw_th32_c160_w512_k5"] = p3_dw(32, 160, 512, 5, args.iters)
        res["p3_dw_th32_c96_w512_k3"] = p3_dw(32, 96, 512, 3, args.iters)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--probes", default="123")
    p.add_argument("--iters", type=int, default=20)
    main(p.parse_args())
