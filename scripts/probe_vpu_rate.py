#!/usr/bin/env python
"""Microbenchmark the v5e VPU: FMA issue rate (dependent vs parallel
chains), roll and select cost, f32 vs bf16.

Why: the flat megakernel's depthwise is k^2 VPU FMAs per hidden element.
Whether the decoder tail's ~37 GMAC of 512px depthwise work has a ~37 ms
or ~9 ms floor depends on the VPU's sustained FMA width — and whether a
single dependent accumulator chain (what a naive k-tap accumulation
compiles to) can reach it, or whether the kernel needs several parallel
accumulators to cover FMA latency.  Nobody's spec sheet answers this for
the attached chip — this probe does.

Each case is a pallas kernel over a VMEM-resident (C, L) tile running
``reps`` VPU ops split across ``par`` parallel accumulator chains (the
Python loop stays small enough for Mosaic to compile in seconds — no
fori_loop, which unrolls pathologically here).  Through the
remote-execution tunnel every sync costs ~23-29 ms RTT, so a single
timed call measures the harness; instead each measurement chains ``n``
data-dependent calls per sync and the per-call time is the SLOPE
between n=12 and n=3 — RTT and dispatch overhead subtract out exactly.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_vpu_rate.py
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def chain_time(fn, x, n, iters=3):
    """Best wall time of ``n`` data-dependent calls, synced once."""
    out = fn(x)
    _sync(out)
    best = 1e9
    for _ in range(iters):
        c = x
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(c)
            c = x * (1.0 + 0.0 * out[0, 0]).astype(x.dtype)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def per_call_ms(fn, x, n_hi=12, n_lo=3, iters=3):
    hi = chain_time(fn, x, n_hi, iters)
    lo = chain_time(fn, x, n_lo, iters)
    return (hi - lo) / (n_hi - n_lo) * 1e3


def make_case(op: str, dtype, c: int, lanes: int, reps: int, par: int):
    """One pallas kernel: ``reps`` VPU ops on a (c, lanes) tile, issued as
    ``par`` independent accumulator chains of ``reps // par`` dependent
    steps each (par=1 measures latency-bound rate, par>=4 throughput)."""

    steps = reps // par

    def kernel(x_ref, o_ref):
        a0 = x_ref[...]
        w = jnp.asarray(1.000001, a0.dtype)
        b = jnp.asarray(1e-7, a0.dtype)
        accs = [a0 * (1.0 + i * 1e-6) for i in range(par)]
        if op == "fma":
            for _ in range(steps):
                accs = [a * w + b for a in accs]
        elif op == "roll":
            for _ in range(steps):
                accs = [pltpu.roll(a, 1, 1) for a in accs]
            accs = [a * w for a in accs]
        elif op == "select":
            col = jax.lax.broadcasted_iota(jnp.int32, a0.shape, 1)
            for i in range(steps):
                accs = [jnp.where(col == (i % lanes), a * w, a) for a in accs]
        elif op == "hswish":
            six = jnp.asarray(6.0, a0.dtype)
            three = jnp.asarray(3.0, a0.dtype)
            for _ in range(steps):
                accs = [a * jnp.clip(a + three, 0, six) / six for a in accs]
        elif op == "cast":  # f32 <-> bf16 round trip
            for _ in range(steps):
                accs = [
                    a.astype(jnp.bfloat16).astype(jnp.float32) * w
                    for a in accs
                ]
        out = accs[0]
        for a in accs[1:]:
            out = out + a
        o_ref[0, 0] = jnp.sum(out[:1, :1].astype(jnp.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return run, steps * par


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    c, lanes = args.c, args.lanes
    n_elems = c * lanes
    res = {"c": c, "lanes": lanes, "reps": args.reps}
    cases = [("fma", "f32", jnp.float32, 1), ("fma", "f32", jnp.float32, 8),
             ("fma", "bf16", jnp.bfloat16, 8),
             ("roll", "f32", jnp.float32, 8),
             ("select", "f32", jnp.float32, 8),
             ("hswish", "f32", jnp.float32, 4),
             ("cast", "f32", jnp.float32, 4)]
    for op, dt_name, dt, par in cases:
        x = jnp.asarray(rng.uniform(0.5, 1.0, (c, lanes)), dt)
        try:
            fn, reps_eff = make_case(op, dt, c, lanes, args.reps, par)
            ms = per_call_ms(fn, x, iters=args.iters)
            ops_per_s = n_elems * reps_eff / (ms / 1e3)
            res[f"{op}_{dt_name}_p{par}_Gops"] = round(ops_per_s / 1e9, 1)
            print(f"{op:8s} {dt_name} par={par}: {ms:8.3f} ms/call  "
                  f"{ops_per_s/1e12:6.3f} Tops/s", flush=True)
        except Exception as err:  # noqa: BLE001
            res[f"{op}_{dt_name}_p{par}_Gops"] = f"FAIL {str(err)[:80]}"
            print(f"{op} {dt_name}: FAIL {str(err)[:160]}", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--lanes", type=int, default=4096)
    p.add_argument("--reps", type=int, default=512)
    p.add_argument("--iters", type=int, default=3)
    main(p.parse_args())
