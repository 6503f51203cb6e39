#!/usr/bin/env python
"""Where do the encoder's stride-2 blocks spend their 12 ms?

profile_prefix (round 4) measured e2 (16-24 s2 k3 t6 @512, b16) at
12.5 ms and e4 (24-40 s2 k5 t6 @256, b16) at 12.2 ms in-context — both on
the plain-XLA NHWC path (the flat kernel is stride-1 only).  Roofline
says ~3 ms each (expand matmul + dense-grouped dw at output res + HBM for
the input-res hidden), so this probe ablates the XLA composition:

  stages: expand-only / +pad / +dw / +SE+project (full block)
  and the boundary transposes the chain charges around it.

Methodology: chained data-dependent stages inside one jit, value-fetch
sync, per-call time from the n=12 vs n=3 slope (tunnel RTT subtracts).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_stride2.py
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def chain_time(fn, x, n, iters=3):
    out = fn(x)
    _sync(out)
    best = 1e9
    for _ in range(iters):
        c = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(c)
            c = x * (1.0 + 0.0 * out.ravel()[0]).astype(x.dtype)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def per_call_ms(fn, x, n_hi=12, n_lo=3, iters=3):
    hi = chain_time(fn, x, n_hi, iters)
    lo = chain_time(fn, x, n_lo, iters)
    return (hi - lo) / (n_hi - n_lo) * 1e3


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        _hardswish,
        xla_block_apply,
    )

    rng = np.random.default_rng(0)
    b = args.batch
    # (name, c_in, c_out, k, t, in_size)
    cases = [
        ("e2 16-24 s2 k3 t6 @512", 16, 24, 3, 6, 512),
        ("e4 24-40 s2 k5 t6 @256", 24, 40, 5, 6, 256),
    ]
    results = {}
    for name, ci, co, k, t, size in cases:
        e = ci * t
        pad = (k - 1) // 2
        w_exp = jnp.asarray(rng.normal(0, 0.2, (ci, e)), jnp.bfloat16)
        w_dw = jnp.asarray(rng.normal(0, 0.2, (k, k, 1, e)), jnp.bfloat16)
        w_proj = jnp.asarray(rng.normal(0, 0.2, (e, co)), jnp.bfloat16)
        d0k = jnp.asarray(rng.normal(0, 0.2, (e, max(8, e // 4))), jnp.float32)
        d0b = jnp.zeros((max(8, e // 4),), jnp.float32)
        d1k = jnp.asarray(rng.normal(0, 0.2, (max(8, e // 4), e)), jnp.float32)
        d1b = jnp.zeros((e,), jnp.float32)
        params = {
            "Conv_0": {"kernel": w_exp[None, None].astype(jnp.float32)},
            "Conv_1": {"kernel": w_proj[None, None].astype(jnp.float32)},
            "DepthwiseConv2D_0": {"kernel": w_dw.astype(jnp.float32)},
            "SELayer_0": {
                "Dense_0": {"kernel": d0k, "bias": d0b},
                "Dense_1": {"kernel": d1k, "bias": d1b},
            },
        }
        x = jnp.asarray(rng.uniform(-1, 1, (b, size, size, ci)), jnp.bfloat16)

        def expand_only(xv):
            hid = jnp.einsum("bhwc,cd->bhwd", xv, w_exp,
                             preferred_element_type=jnp.float32)
            return _hardswish(hid).astype(xv.dtype)

        def plus_pad(xv):
            hid = expand_only(xv)
            return jnp.pad(hid, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                           mode="reflect")

        def plus_dw(xv):
            hid = plus_pad(xv)
            out = jax.lax.conv_general_dilated(
                hid, w_dw, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=e,
            )
            return _hardswish(out.astype(jnp.float32)).astype(xv.dtype)

        def full(xv):
            return xla_block_apply(params, xv, k, 2, t, dtype=jnp.bfloat16)

        def full_plus_tp(xv):
            # what the chain pays: NCHW-flat in, NCHW-flat out
            nhwc = jnp.transpose(xv, (0, 2, 3, 1))
            y = xla_block_apply(params, nhwc, k, 2, t, dtype=jnp.bfloat16)
            return jnp.transpose(y, (0, 3, 1, 2))

        xf = jnp.transpose(x, (0, 3, 1, 2))
        out = {}
        for vname, fn, xin in [
            ("expand", expand_only, x),
            ("expand_pad", plus_pad, x),
            ("expand_pad_dw", plus_dw, x),
            ("full", full, x),
            ("full_tp", full_plus_tp, xf),
        ]:
            ms = per_call_ms(jax.jit(fn), xin, iters=args.iters)
            out[vname] = round(ms, 3)
            print(f"{name} [{vname}]: {ms:.3f} ms", flush=True)
        results[name] = out
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    main(p.parse_args())
