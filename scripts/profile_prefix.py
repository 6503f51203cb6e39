#!/usr/bin/env python
"""Prefix-ablation profile of the fused stylize engine.

``profile_stages.py`` times each stage as its own jit, which inflates
every number with harness overhead (measured: sum-of-stages 324 ms vs
188 ms for the full pass at 512/b8) — the per-stage boundary layouts and
eager chain ops don't subtract out.  This tool instead times jitted
PREFIXES of the real engine pipeline:

    P0  encoder (stacked content+style)
    P1  P0 + AdaAttN pair
    P2  P1 + ada_out fuse + alpha blend
    P3  P2 + decoder (= the full engine)

Every prefix ends in a tiny reduction to a (1,1,1,1) tensor so XLA
cannot dead-code-eliminate the prefix body, the output fetch is cheap,
and the harness overhead is IDENTICAL across prefixes — consecutive
differences are the in-context per-stage device costs.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_prefix.py \
        [--impl auto] [--size 512] [--batch 8]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, content, style, iters, windows=3):
    out = fn(content, style)
    float(np.asarray(out).ravel()[0])
    best = []
    for _ in range(windows):
        c = content
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(c, style)
            # Data-dependent next input (defeats tunnel memoization);
            # identical eager ops for every prefix, so it subtracts out.
            c = content + 0.0 * out[0, 0, 0, 0].astype(content.dtype)
        float(np.asarray(out).ravel()[0])
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return min(best)


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.engine import (
        _FLAT_MODE,
        adaattn_apply_pair,
    )
    from arbitrarystyletransfer_tpu.models.ast import AST
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        decode_flat,
        encode_flat,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        block_apply,
        decode_fused,
        encode_fused,
    )

    cfg = ModelConfig(
        use_pallas_adaattn=True, compute_dtype="bfloat16",
        encoder_eval_stats=True,
    )
    ast = AST(cfg)
    b, size = args.batch, args.size
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.uniform(0, 1, (b, size, size, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (b, size, size, 3)), jnp.float32)
    init_small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = ast.init(
        jax.random.PRNGKey(0), init_small, init_small, train=False
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    dtype = jnp.bfloat16
    taps = cfg.enc_out_layers
    impl = args.impl

    def encode(both):
        if impl in _FLAT_MODE:
            return encode_flat(
                params["enc"], stats["enc"], both, cfg.enc_conv_shapes,
                taps, expand_ratio=cfg.expand_ratio, dtype=dtype,
                flat_blocks=_FLAT_MODE[impl],
            )
        return encode_fused(
            params["enc"], stats["enc"], both, cfg.enc_conv_shapes, taps,
            expand_ratio=cfg.expand_ratio, dtype=dtype,
        )

    def stage_attn(both_maps):
        cmaps = [m[:b] for m in both_maps]
        smaps = [m[b:] for m in both_maps]
        return adaattn_apply_pair(
            params["ada_att_1"], params["ada_att_2"], cmaps, smaps,
            use_pallas=True, dtype=dtype,
        ), cmaps

    def stage_fuse(sm_pair, cmaps):
        (sm1, sm2) = sm_pair
        fuse_in = jnp.concatenate(
            [
                jnp.concatenate([sm1, sm2], axis=-1),
                jnp.concatenate(list(cmaps), axis=-1),
            ],
            axis=0,
        )
        fused = block_apply(
            params["ada_out"], fuse_in, 3, cfg.expand_ratio,
            use_identity=False, dtype=dtype,
        )
        t, content_map = fused[:b], fused[b:]
        return 1.0 * t + 0.0 * content_map

    def stage_dec(t):
        if impl in _FLAT_MODE:
            return decode_flat(
                params["dec"], t, cfg.decoder_conv_shapes, exporting=True,
                dtype=dtype, flat_blocks=_FLAT_MODE[impl],
            )
        return decode_fused(
            params["dec"], t, cfg.decoder_conv_shapes, exporting=True,
            dtype=dtype,
        )

    def sink(x):
        # Cheap non-DCE-able reduction: touch every stage output.
        return jnp.sum(x[:, ::16, ::16, :], dtype=jnp.float32).reshape(
            1, 1, 1, 1
        )

    @jax.jit
    def p0(c, s):
        maps = encode(jnp.concatenate([c, s], axis=0))
        return sink(maps[0]) + sink(maps[1])

    @jax.jit
    def p1(c, s):
        maps = encode(jnp.concatenate([c, s], axis=0))
        (sm1, sm2), _ = stage_attn(maps)
        return sink(sm1) + sink(sm2)

    @jax.jit
    def p2(c, s):
        maps = encode(jnp.concatenate([c, s], axis=0))
        sm_pair, cmaps = stage_attn(maps)
        return sink(stage_fuse(sm_pair, cmaps))

    @jax.jit
    def p3(c, s):
        maps = encode(jnp.concatenate([c, s], axis=0))
        sm_pair, cmaps = stage_attn(maps)
        t = stage_fuse(sm_pair, cmaps)
        return sink(stage_dec(t))

    iters = args.iters
    res = {"size": size, "batch": b, "impl": impl}

    if args.blockwise == "dec":
        # Per-decoder-block prefixes: full pre-decoder pipeline, then
        # decoder blocks 0..i.  Consecutive diffs = in-engine block cost.
        n_dec = len(cfg.decoder_conv_shapes) - 1

        def make_p(stop):
            @jax.jit
            def p(c, s):
                maps = encode(jnp.concatenate([c, s], axis=0))
                sm_pair, cmaps = stage_attn(maps)
                t = stage_fuse(sm_pair, cmaps)
                return sink(decode_flat(
                    params["dec"], t, cfg.decoder_conv_shapes,
                    exporting=True, dtype=dtype,
                    flat_blocks=_FLAT_MODE.get(impl, "auto"),
                    stop_after=stop,
                ))
            return p

        prev = timed(p2, content, style, iters)
        res["prefix_pre_dec_ms"] = round(prev, 2)
        print(json.dumps(res), flush=True)
        for i in list(range(n_dec)) + [None]:
            name = f"d{i}" if i is not None else "head"
            ms = timed(make_p(i), content, style, iters)
            res[f"block_{name}_ms"] = round(ms - prev, 2)
            prev = ms
            print(json.dumps(res), flush=True)
        return

    if args.blockwise == "enc":
        n_enc = len(cfg.enc_conv_shapes)

        def make_pe(stop):
            @jax.jit
            def p(c, s):
                maps = encode_flat(
                    params["enc"], stats["enc"],
                    jnp.concatenate([c, s], axis=0),
                    cfg.enc_conv_shapes, taps,
                    expand_ratio=cfg.expand_ratio, dtype=dtype,
                    flat_blocks=_FLAT_MODE.get(impl, "auto"),
                    stop_after=stop,
                )
                return sink(maps[-1])
            return p

        prev = 0.0
        for i in range(n_enc):
            ms = timed(make_pe(i), content, style, iters)
            res[f"block_e{i}_ms"] = round(ms - prev, 2)
            prev = ms
            print(json.dumps(res), flush=True)
        return

    prefixes = [("encoder", p0), ("attn", p1), ("fuse", p2), ("decoder", p3)]
    prev = 0.0
    for name, fn in prefixes:
        ms = timed(fn, content, style, iters)
        res[f"prefix_{name}_ms"] = round(ms, 2)
        res[f"stage_{name}_ms"] = round(ms - prev, 2)
        prev = ms
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impl", default="auto",
                   choices=["fused", "flat", "flat-all", "auto"])
    p.add_argument("--blockwise", default=None, choices=["dec", "enc"],
                   help="per-block prefixes for the decoder or encoder")
    main(p.parse_args())
