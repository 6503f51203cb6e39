#!/usr/bin/env python
"""A/B the stride-2 space-to-depth flat kernel vs plain XLA on-chip.

Times the three encoder stride-2 block instances at the bench
resolution (enc_conv_shapes rows 2/4/7 at 512px: e2 16-24 s2 k3 t6
@512, e4 24-40 s2 k5 t6 @256, e7 40-80 s2 k3 t4 @128) through

    xla     fused_block.xla_block_apply(stride=2), NHWC-native
    flat2   flatblock_s2.flat_s2_block_apply_f, flat-NCHW-native

with the tunnel-aware methodology (value-fetch sync, data-dependent
chains, min of 3 windows — see bench.py).  probe_stride2.py measured
the XLA path at 12.5 ms (e2) + 12.2 ms (e4) per stacked b16 pass vs a
~3 ms roofline each; this probe records what the s2d kernel recovers.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_s2.py
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=10, windows=3):
    out = fn(x)
    float(np.asarray(out).ravel()[0])
    best = 1e9
    for _ in range(windows):
        c = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(c)
            c = x + 0.0 * jnp.ravel(out)[0].astype(x.dtype)
        float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock_s2 import (
        flat_s2_block_apply_f,
        s2_eligible,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        xla_block_apply,
    )

    rng = np.random.default_rng(0)
    b = args.batch
    scale = args.size // 512
    # (name, c_in, c_out, k, t, in_size) — encoder stride-2 instances
    cases = [
        ("e2 16-24 s2 k3 t6", 16, 24, 3, 6, args.size),
        ("e4 24-40 s2 k5 t6", 24, 40, 5, 6, args.size // 2),
        ("e7 40-80 s2 k3 t4", 40, 80, 3, 4, args.size // 4),
    ]
    del scale
    results = {}
    for name, ci, co, k, t, size in cases:
        blk = DepthWiseConv(ci, co, stride=2, kernel_size=k,
                            expand_ratio=t, use_norm=True)
        x32 = jnp.asarray(
            rng.normal(0, 1, (b, size, size, ci)), jnp.float32
        )
        variables = blk.init(jax.random.PRNGKey(0), x32)
        params = variables["params"]
        stats = variables["batch_stats"]
        x = x32.astype(jnp.bfloat16)
        xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, ci, size * size)

        out = {"eligible": s2_eligible(size, size)}

        def xla_fn(v, p=params, s=stats, k=k, t=t):
            return xla_block_apply(p, v, k, 2, t, stats=s)

        out["xla_ms"] = round(timed(jax.jit(xla_fn), x, args.iters), 3)

        if out["eligible"]:
            def f2_fn(v, p=params, s=stats, k=k, t=t, h=size):
                return flat_s2_block_apply_f(p, v, h, k, t, stats=s)

            try:
                t0 = time.perf_counter()
                out["flat2_ms"] = round(
                    timed(jax.jit(f2_fn), xf, args.iters), 3
                )
                out["compile_s"] = round(time.perf_counter() - t0, 1)
            except Exception as e:  # noqa: BLE001 — record, keep probing
                out["flat2_err"] = str(e)[:300]
        results[f"{name} @{size}"] = out
        print(json.dumps({f"{name} @{size}": out}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    main(p.parse_args())
