#!/usr/bin/env python
"""A/B the persistent-VMEM megakernel vs the round-2 fused block + XLA
epilogue, per decoder-tail block shape, on the attached chip.

Tunnel-aware methodology (see bench.py): value-fetch sync, data-dependent
chains, min of 3 windows.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters):
    out = fn(x)
    float(jnp.asarray(out)[0, 0, 0, 0])
    windows = []
    for _ in range(3):
        c = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(c)
            c = x * 0.99 + out[..., : x.shape[-1]] * 0.01 \
                if out.shape == x.shape else x + 0.0 * out[0, 0, 0, 0]
        float(jnp.asarray(out)[0, 0, 0, 0])
        windows.append((time.perf_counter() - t0) / iters * 1e3)
    return min(windows)


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        fused_block_apply,
        xla_block_apply,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        flat_block_apply,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.megablock import (
        mega_block_apply,
    )

    rng = np.random.default_rng(0)
    # Decoder tail + encoder-at-512 block shapes: (c_in, c_out, k, t, size).
    cases = [
        (40, 40, 5, 4, args.size),    # dec blocks 8, 9
        (40, 24, 5, 6, args.size),    # dec block 10
        (24, 24, 3, 6, args.size),    # dec block 11
        (24, 16, 3, 6, args.size),    # dec block 12
        (16, 16, 3, 6, args.size),    # dec block 13
        (16, 16, 3, 6, args.size // 8),   # low-res sanity
        (80, 80, 3, 4, args.size // 2),   # dec blocks 5-7 at half res
        (128, 128, 3, 3, args.size // 8), # dec blocks 0-1
    ]
    results = []
    for c_in, c_out, k, t, size in cases:
        blk = DepthWiseConv(c_in, c_out, stride=1, kernel_size=k,
                            expand_ratio=t, use_norm=False)
        x32 = jnp.asarray(
            rng.normal(0, 1, (args.batch, size, size, c_in)), jnp.float32
        )
        params = blk.init(jax.random.PRNGKey(0), x32)["params"]
        x = x32.astype(jnp.bfloat16)

        fns = {
            "flat": jax.jit(lambda v, p=params, k=k, t=t: flat_block_apply(
                p, v, k, t, row_group=args.row_group)),
            "mega": jax.jit(lambda v, p=params, k=k, t=t: mega_block_apply(
                p, v, k, t, row_group=args.row_group)),
            "fused": jax.jit(lambda v, p=params, k=k, t=t: fused_block_apply(
                p, v, k, t)),
            "xla": jax.jit(lambda v, p=params, k=k, t=t: xla_block_apply(
                p, v, k, 1, t)),
        }
        if args.only:
            fns = {n: f for n, f in fns.items() if n in args.only.split(",")}
        row = {"case": f"{c_in}->{c_out} k{k} t{t} @{size}"}
        for name, fn in fns.items():
            try:
                row[name + "_ms"] = round(timed(fn, x, args.iters), 3)
            except Exception as e:  # noqa: BLE001
                row[name + "_err"] = str(e)[:120]
        if "mega_ms" in row and "fused_ms" in row:
            row["mega_vs_fused"] = round(row["fused_ms"] / row["mega_ms"], 2)
        if "flat_ms" in row and "fused_ms" in row:
            row["flat_vs_fused"] = round(row["fused_ms"] / row["flat_ms"], 2)
        print(json.dumps(row), flush=True)
        if args.log:
            with open(args.log, "a") as fh:
                fh.write(json.dumps(row) + "\n")
        results.append(row)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--row_group", type=int, default=None)
    p.add_argument("--only", type=str, default=None,
                   help="Comma-separated subset of impls to time.")
    p.add_argument("--log", type=str, default=None,
                   help="Append result JSON lines to this file.")
    main(p.parse_args())
