#!/usr/bin/env python
"""Microbenchmark: fused phase-A kernel vs XLA for an inverted-residual
block's expand+dw stage.

The execution tunnel in this environment memoizes small repeated
executions, so single-op wall-clock timing lies.  Instead each variant runs
as a chain of N data-dependent stages inside ONE jitted program (per-stage
time = total / N), which measures real sequential device work.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/bench_fused_block.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready is a no-op through the remote-execution tunnel;
    # fetching a value is the only reliable completion fence.
    return float(jnp.asarray(out).ravel()[0])


def bench_once(fn, x, iters=3):
    _sync(fn(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import fused_expand_dw

    rng = np.random.default_rng(0)
    b, n = args.batch, args.chain

    # (H, W, C, k): square expand C->C so stages compose.
    shapes = [
        (512, 512, 160, 5),
        (512, 512, 144, 3),
        (256, 256, 320, 3),
    ]
    dt = jnp.bfloat16 if args.bf16 else jnp.float32
    for h, w, c, k in shapes:
        x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), dt)
        w1 = jnp.asarray(rng.normal(0, 0.05, (c, c)), dt)
        wd = jnp.asarray(rng.normal(0, 0.05, (k, k, c)), dt)
        wd4 = wd[:, :, None, :]
        pad = (k - 1) // 2

        def xla_stage(x):
            hidden = jnp.einsum(
                "bhwc,cd->bhwd", x, w1, preferred_element_type=jnp.float32
            ).astype(dt)
            hidden = (hidden * jnp.clip(hidden.astype(jnp.float32) + 3, 0, 6)
                      .astype(dt) / 6)
            hp = jnp.pad(hidden, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                         mode="reflect")
            out = jax.lax.conv_general_dilated(
                hp, wd4, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
            out = (out * jnp.clip(out.astype(jnp.float32) + 3, 0, 6)
                   .astype(out.dtype) / 6)
            sums = jnp.sum(out.astype(jnp.float32), axis=(1, 2))
            # Cheap data-dependence so stages can't be collapsed.
            return out * (1.0 + 1e-6 * jnp.tanh(sums.mean())).astype(out.dtype)

        def fused_stage(x):
            out, sums = fused_expand_dw(x, w1, wd, k, pre_act=True)
            return out * (1.0 + 1e-6 * jnp.tanh(sums.mean())).astype(out.dtype)

        @jax.jit
        def xla_chain(x):
            for _ in range(n):
                x = xla_stage(x)
            return x

        @jax.jit
        def fused_chain(x):
            for _ in range(n):
                x = fused_stage(x)
            return x

        t_xla = bench_once(xla_chain, x) / n * 1e3
        t_fused = bench_once(fused_chain, x) / n * 1e3
        print(f"({h},{w},{c},k{k}) b{b} {dt.__name__}: "
              f"xla {t_xla:7.2f} ms/stage   fused {t_fused:7.2f} ms/stage   "
              f"xla/fused {t_xla / t_fused:4.2f}x")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chain", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    main(p.parse_args())
