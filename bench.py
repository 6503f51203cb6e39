#!/usr/bin/env python
"""Benchmark: stylized 512x512 throughput on the attached TPU chip.

Drives the BASELINE.json headline config (batched multi-style 512px
inference with alpha interpolation) through the jitted AST stylize path and
prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The baseline target is >1000 images/sec on a v5e-8, i.e. 125 images/sec per
chip; ``vs_baseline`` is measured-per-chip / 125.
"""

import argparse
import json
import subprocess
import time

import jax
import jax.numpy as jnp
import numpy as np

PER_CHIP_TARGET = 1000.0 / 8.0  # BASELINE.json: >1000 img/s on v5e-8


def _git_sha() -> str:
    """Repo SHA for round-over-round bench comparability."""
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _bench_meta(args) -> dict:
    return {
        "git": _git_sha(),
        "config": {
            "size": args.size, "batch": args.batch, "iters": args.iters,
            "pallas": args.pallas, "dtype": args.dtype,
            "dw_impl": args.dw_impl, "engine": args.engine,
        },
    }


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.ast import AST

    cfg = ModelConfig(
        use_pallas_adaattn=args.pallas,
        compute_dtype=args.dtype,
        depthwise_impl=args.dw_impl,
    )
    ast = AST(cfg)
    size = args.size
    batch = args.batch

    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)), jnp.float32)

    init_small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = ast.init(jax.random.PRNGKey(0), init_small, init_small, train=False)

    if args.engine == "fused":
        # Fused Pallas inference engine (engine.py): fused inverted-residual
        # blocks + BN-folded encoder + streaming AdaAttN.
        from arbitrarystyletransfer_tpu.engine import stylize_fused

        dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

        @jax.jit
        def stylize(content, style, alpha):
            return stylize_fused(
                variables, content, style, alpha, cfg=cfg, dtype=dtype
            )
    else:

        @jax.jit
        def stylize(content, style, alpha):
            return ast.apply(
                variables, content, style, alpha, method=AST.stylize
            )

    def sync(o):
        # block_until_ready is a no-op through remote-execution tunnels
        # (measured: it returns before the device work runs); fetching a
        # value is the only reliable completion barrier.  Executions are
        # in-order per chip, so syncing the last output fences the batch.
        return float(jnp.asarray(o)[0, 0, 0, 0])

    # Warmup / compile.
    sync(stylize(content, style, 1.0))

    if args.latency:
        # Single-pair latency (BASELINE.json: < 5 ms per image).  The
        # remote-execution tunnel adds ~25-29 ms RTT per round trip
        # (measured with a trivial jitted call), so a per-call sync
        # measures the harness, not the device.  Device execution latency
        # is recovered by streaming N back-to-back calls (in-order
        # execution on the chip) and dividing; the e2e number (incl.
        # tunnel RTT) is reported alongside for honesty.
        c1, s1 = content[:1], style[:1]
        sync(stylize(c1, s1, 1.0))

        e2e = []
        for _ in range(max(20, args.iters)):
            t0 = time.perf_counter()
            sync(stylize(c1, s1, 1.0))
            e2e.append(time.perf_counter() - t0)
        e2e_p50 = sorted(e2e)[len(e2e) // 2] * 1e3

        n = 50
        pipe = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = stylize(c1, s1, 1.0)
            sync(out)
            pipe.append((time.perf_counter() - t0) / n)
        dev_ms = min(pipe) * 1e3

        result = {
            "metric": f"single-pair {size}x{size} stylize device latency "
                      "(pipelined)",
            "value": round(dev_ms, 2),
            "unit": "ms",
            "vs_baseline": round(5.0 / dev_ms, 3),  # >1 = faster than 5ms
            "e2e_p50_ms_incl_tunnel_rtt": round(e2e_p50, 2),
            **_bench_meta(args),
        }
        print(json.dumps(result))
        return

    # Timed runs (sync on the final output: in-order execution makes it a
    # fence for the whole loop).
    n_iters = args.iters
    start = time.perf_counter()
    for i in range(n_iters):
        out = stylize(content, style, 1.0)
    sync(out)
    elapsed = time.perf_counter() - start

    images_per_sec = batch * n_iters / elapsed
    result = {
        "metric": f"stylized {size}x{size} images/sec/chip (batch {batch})",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / PER_CHIP_TARGET, 3),
        **_bench_meta(args),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--pallas", action=argparse.BooleanOptionalAction,
            default=True,
            help="Use the fused Pallas AdaAttN kernel (default on).")
    parser.add_argument("--dtype", default="bfloat16",
            choices=["float32", "bfloat16"],
            help="Compute dtype for the conv/attention path.")
    parser.add_argument("--dw_impl", default="conv", choices=["conv", "shifts"],
            help="Depthwise conv lowering strategy.")
    parser.add_argument("--engine", default="fused", choices=["flax", "fused"],
            help="Inference engine: the fused Pallas engine (engine.py; "
                 "reference-parity eval-stats semantics; default — measured "
                 "faster) or the plain flax/XLA graph.")
    parser.add_argument("--latency", action="store_true",
            help="Measure single-pair p50 latency instead of throughput.")
    main(parser.parse_args())
