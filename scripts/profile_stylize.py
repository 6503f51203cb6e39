#!/usr/bin/env python
"""Segment-level timing of the 512px stylize path on the attached chip.

Times the four phases of AST.stylize separately (encoder x2, AdaAttN pair +
ada_out fuse, decoder low-res half, decoder high-res tail) so optimization
work targets the real bottleneck instead of the FLOP model's guess.

Usage: python -u scripts/profile_stylize.py [--size 512] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready is a no-op through the remote-execution tunnel;
    # fetching a value is the only reliable completion fence (executions
    # are in-order per chip, so the last output fences the loop).
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters, out


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
    b, s = args.batch, args.size
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32)

    init_small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = ast.init(jax.random.PRNGKey(0), init_small, init_small, train=False)

    taps = cfg.enc_out_layers
    ubs = not cfg.encoder_eval_stats

    if args.engine == "fused":
        from arbitrarystyletransfer_tpu.engine import stylize_fused

        dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

        @jax.jit
        def full(content, style):
            return stylize_fused(variables, content, style, 1.0, cfg=cfg,
                                 dtype=dt)
    else:

        @jax.jit
        def full(content, style):
            return ast.apply(
                variables, content, style, 1.0, method=AST.stylize
            )

    @jax.jit
    def enc_one(img):
        return ast.apply(
            variables,
            img,
            out_layers=taps,
            train=False,
            use_batch_stats=ubs,
            method=lambda m, *a, **kw: m.enc(*a, **kw),
        )

    def attention_and_fuse(m, cmaps, smaps):
        sm1 = m.ada_att_1(cmaps[0], smaps[0])
        sm2 = m.ada_att_2(cmaps[1], smaps[1])
        t = m.ada_out(jnp.concatenate([sm1, sm2], axis=-1), train=False)
        cm = m.ada_out(jnp.concatenate(cmaps, axis=-1), train=False)
        return t, cm

    @jax.jit
    def attn(cmaps, smaps):
        return ast.apply(variables, cmaps, smaps, method=attention_and_fuse)

    @jax.jit
    def dec(t):
        return ast.apply(
            variables, t, True, method=lambda m, x, e: m.dec(x, exporting=e)
        )

    results = {}
    t_full, _ = timeit(full, content, style, iters=args.iters)
    results["full_stylize_ms"] = t_full * 1e3

    t_enc, cmaps = timeit(enc_one, content, iters=args.iters)
    _, smaps = timeit(enc_one, style, iters=1)
    results["encoder_one_pass_ms"] = t_enc * 1e3

    t_attn, (t, cm) = timeit(attn, cmaps, smaps, iters=args.iters)
    results["adaattn_plus_fuse_ms"] = t_attn * 1e3

    t_dec, _ = timeit(dec, t, iters=args.iters)
    results["decoder_ms"] = t_dec * 1e3

    results["accounted_ms"] = (2 * t_enc + t_attn + t_dec) * 1e3
    results["imgs_per_sec"] = b / t_full
    for k, v in results.items():
        print(f"{k:28s} {v:10.2f}")
    print(json.dumps({k: round(v, 3) for k, v in results.items()}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--pallas", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dw_impl", default="conv")
    p.add_argument("--engine", default="flax", choices=["flax", "fused"])
    args = p.parse_args()
    main(args)
