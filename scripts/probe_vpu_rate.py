#!/usr/bin/env python
"""Microbenchmark the v5e VPU: f32 vs bf16 FMA rate, roll and select cost.

Why: the flat megakernel's depthwise is k^2 VPU FMAs per hidden element
(f32, because Mosaic's lane rotate is 32-bit-only).  Whether the decoder
tail's ~43 GMAC of 512px depthwise work has a ~43 ms or ~11 ms floor
depends entirely on the VPU's per-cycle FMA width (1 vs 4 ops/ALU) and
whether bf16 FMAs run packed at 2x.  Nobody's spec sheet answers this for
the attached chip — this kernel does.

Each case runs a pallas kernel over a VMEM-resident (C, L) tile doing
`reps` dependent FMA (or roll / select) ops, so the measured time is
pure VPU issue rate (one small input DMA, one scalar output).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_vpu_rate.py
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


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def bench(fn, x, iters=3):
    _sync(fn(x))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def make_case(op: str, dtype, c: int, lanes: int, reps: int):
    """One pallas kernel: `reps` dependent VPU ops on a (c, lanes) tile."""

    def kernel(x_ref, o_ref):
        a = x_ref[...]
        w = jnp.asarray(1.000001, a.dtype)
        b = jnp.asarray(1e-7, a.dtype)
        if op == "fma":
            for _ in range(reps):
                a = a * w + b
        elif op == "roll":
            for _ in range(reps):
                a = pltpu.roll(a, 1, 1)
            a = a * w
        elif op == "select":
            col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            for i in range(reps):
                a = jnp.where(col == (i % lanes), a * w, a)
        elif op == "hswish":
            for _ in range(reps):
                six = jnp.asarray(6.0, a.dtype)
                a = a * jnp.clip(a + jnp.asarray(3.0, a.dtype), 0, six) / six
        elif op == "cast":  # f32 <-> bf16 round trip
            for _ in range(reps):
                a = a.astype(jnp.bfloat16).astype(jnp.float32) * w
        o_ref[0, 0] = jnp.sum(a[:1, :1].astype(jnp.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return run


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    c, lanes, reps = args.c, args.lanes, args.reps
    n_elems = c * lanes
    res = {"c": c, "lanes": lanes, "reps": reps}
    for op in ("fma", "roll", "select", "hswish", "cast"):
        for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            if op in ("roll", "select") and dt_name == "bf16":
                continue  # 32-bit-only ops
            x = jnp.asarray(rng.uniform(0.5, 1.0, (c, lanes)), dt)
            try:
                fn = make_case(op, dt, c, lanes, reps)
                dt_s = bench(fn, x, args.iters)
                ops_per_s = n_elems * reps / dt_s
                res[f"{op}_{dt_name}_Gops"] = round(ops_per_s / 1e9, 1)
                print(f"{op:8s} {dt_name}: {dt_s*1e3:8.3f} ms  "
                      f"{ops_per_s/1e12:6.3f} Tops/s", flush=True)
            except Exception as err:  # noqa: BLE001
                res[f"{op}_{dt_name}_Gops"] = f"FAIL {str(err)[:80]}"
                print(f"{op} {dt_name}: FAIL {str(err)[:160]}", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--lanes", type=int, default=4096)
    p.add_argument("--reps", type=int, default=400)
    p.add_argument("--iters", type=int, default=3)
    main(p.parse_args())
