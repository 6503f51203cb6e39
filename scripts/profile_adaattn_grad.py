#!/usr/bin/env python
"""On-chip A/B: Pallas AdaAttN statistics vs the naive einsum path under
``jit(grad)`` (VERDICT r4 item 8 / r5 item 6 — prove the custom backward
engages and wins in training).

Times ``grad(sum(std * nc + mean))`` through both lowerings at the
training tap shapes (N = (size/8)^2 positions, C=128, both AdaAttN
modules stacked -> batch 2B) for the train buckets and the 512px
inference shape.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_adaattn_grad.py
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_, iters=10, windows=3):
    out = fn(*args_)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = 1e9
    for _ in range(windows):
        a0 = args_[0]
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(a0, *args_[1:])
            g0 = jax.tree.leaves(out)[0]
            a0 = args_[0] * (1.0 + 0.0 * g0.ravel()[0]).astype(a0.dtype)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    from arbitrarystyletransfer_tpu.models.adaattn import adaattn_statistics
    from arbitrarystyletransfer_tpu.ops.pallas.adaattn_kernel import (
        adaattn_statistics_pallas,
    )

    rng = np.random.default_rng(0)
    c = 128
    results = {}
    for size, b in [(96, 16), (160, 16), (512, 16)]:
        n = (size // 8) ** 2

        def make(shape):
            return jnp.asarray(rng.normal(0, 1, shape), jnp.bfloat16)

        q, k, v = make((b, n, c)), make((b, n, c)), make((b, n, c))

        def loss(statfn, q, k, v):
            mean, std = statfn(q, k, v)
            return jnp.sum(
                (std.astype(jnp.float32) * 0.5 + mean.astype(jnp.float32))
            )

        for name, statfn in (
            ("pallas", adaattn_statistics_pallas),
            ("naive", adaattn_statistics),
        ):
            gf = jax.jit(jax.grad(
                lambda q, k, v, f=statfn: loss(f, q, k, v),
                argnums=(0, 1, 2),
            ))
            key = f"{size}px N={n} b={b} {name}"
            try:
                results[key] = round(timed(gf, (q, k, v), args.iters), 3)
            except Exception as e:  # noqa: BLE001
                results[key] = f"err: {str(e)[:160]}"
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    main(p.parse_args())
