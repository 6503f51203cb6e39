#!/usr/bin/env python
"""Per-stage device timing of the fused stylize engine.

Times encoder / attention / ada_out-fuse / decoder separately (each as its
own jitted, value-fetch-synced, data-dependent loop) so optimization effort
goes where the milliseconds are.  Tunnel-aware methodology as bench.py.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters, chain_idx=0, sync_fetch=None):
    """Min-of-3 windows of ``iters`` data-dependent executions (ms/iter)."""
    out = fn(*args)
    if sync_fetch is None:
        sync_fetch = lambda o: np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
    sync_fetch(out)
    windows = []
    for _ in range(3):
        a = list(args)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            leaf = jax.tree.leaves(out)[0]
            # Cheap data dependence: nudge the chained arg by ~0.
            a[chain_idx] = a[chain_idx] + 0.0 * leaf.reshape(-1)[0].astype(
                a[chain_idx].dtype
            )
        sync_fetch(out)
        windows.append((time.perf_counter() - t0) / iters * 1e3)
    return min(windows)


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.engine import (
        _FLAT_MODE,
        adaattn_apply_pair,
        stylize_fused,
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
    variables = ast.init(jax.random.PRNGKey(0), init_small, init_small, train=False)
    params = variables["params"]
    stats = variables["batch_stats"]
    dtype = jnp.bfloat16
    taps = cfg.enc_out_layers

    impl = args.impl

    @jax.jit
    def full(c, s):
        return stylize_fused(
            variables, c, s, 1.0, cfg=cfg, dtype=dtype,
            decoder_impl=impl, encoder_impl=impl,
        )

    @jax.jit
    def enc_both(c, s):
        both = jnp.concatenate([c, s], axis=0)
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

    maps = jax.block_until_ready(enc_both(content, style))
    cmaps = [m[:b] for m in maps]
    smaps = [m[b:] for m in maps]

    @jax.jit
    def attn(c1, c2, s1, s2):
        return adaattn_apply_pair(
            params["ada_att_1"], params["ada_att_2"], [c1, c2], [s1, s2],
            use_pallas=True, dtype=dtype,
        )

    sm1, sm2 = attn(cmaps[0], cmaps[1], smaps[0], smaps[1])

    @jax.jit
    def fuse(m1, m2):
        return block_apply(
            params["ada_out"], jnp.concatenate([m1, m2], axis=-1),
            3, cfg.expand_ratio, use_identity=False, dtype=dtype,
        )

    t = fuse(sm1, sm2)

    @jax.jit
    def dec(z):
        if impl in _FLAT_MODE:
            return decode_flat(
                params["dec"], z, cfg.decoder_conv_shapes, exporting=True,
                dtype=dtype, flat_blocks=_FLAT_MODE[impl],
            )
        return decode_fused(
            params["dec"], z, cfg.decoder_conv_shapes, exporting=True,
            dtype=dtype,
        )

    iters = args.iters
    res = {
        "size": size, "batch": b,
        "full_ms": timed(full, [content, style], iters),
        "encoder_both_ms": timed(enc_both, [content, style], iters),
        "attn_pair_ms": timed(attn, [cmaps[0], cmaps[1], smaps[0], smaps[1]], iters),
        "ada_out_fuse_x2_ms": 2 * timed(fuse, [sm1, sm2], iters),
        "decoder_ms": timed(dec, [t], iters),
    }
    acc = (res["encoder_both_ms"] + res["attn_pair_ms"]
           + res["ada_out_fuse_x2_ms"] + res["decoder_ms"])
    res["sum_of_stages_ms"] = round(acc, 2)
    res["per_image_full_ms"] = round(res["full_ms"] / b, 2)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="fused",
                   choices=["fused", "flat", "flat-all", "auto"],
                   help="Engine block-dispatch mode for both chains.")
    main(p.parse_args())
