#!/usr/bin/env python
"""Autotune the per-block kernel dispatch policy on the attached chip.

Enumerates every stride-1 inverted-residual block instance the fused
engine actually executes at a given inference size (encoder at the
stacked 2B batch, the two ada_out fuse blocks, decoder with its upsample
schedule — see engine.stylize_fused), times each available lowering —

    xla    fused_block.xla_block_apply       (plain XLA composition)
    fused  fused_block.fused_block_apply     (round-2 kernel + epilogue)
    flat   flatblock.flat_block_apply        (flat-lane NCHW megakernel)

— with the tunnel-aware methodology (value-fetch sync, data-dependent
chains, min of 3 windows; see bench.py), and writes the winners to the
policy table consumed by ``ops/pallas/policy.py`` (the engine's
``decoder_impl/encoder_impl="auto"`` mode).

Run once per (chip generation, inference size); results are checked in at
``arbitrarystyletransfer_tpu/ops/pallas/tuned_policy.json``.
"""

import argparse
import json
import subprocess
import time

import jax
import jax.numpy as jnp
import numpy as np


def enumerate_blocks(cfg, size: int):
    """(c_in, c_out, stride, k, t, h, w) for every block instance in one
    stylize pass at ``size`` px, deduplicated.  Mirrors the walks in
    flatblock.encode_flat / decode_flat and engine.stylize_fused.
    Stride-2 rows tune xla vs the space-to-depth flat2 kernel."""
    cases = {}

    def add(c_in, c_out, stride, k, t, h, w):
        cases[(c_in, c_out, stride, k, t, h, w)] = None

    # Encoder: stem keeps full resolution (stride row[2] of shapes[0] is 1);
    # stride-2 blocks halve it.  The final block overrides k/t
    # (models.py:154, SURVEY.md defect 6).
    shapes = cfg.enc_conv_shapes
    res = size // shapes[0][2]
    for i, row in enumerate(shapes[1:], start=1):
        c_in, c_out, stride, k, t = row
        if i == len(shapes) - 1:
            k, t = 3, cfg.expand_ratio
        add(c_in, c_out, stride, k, t, res, res)
        res //= stride

    # ada_out fuse blocks: concat of two 128ch maps at 1/8 res
    # (engine.stylize_fused's fuse()).
    r8 = size // 8
    add(2 * cfg.enc_out_channels, cfg.enc_out_channels, 1, 3,
        cfg.expand_ratio, r8, r8)

    # Decoder: upsample after block i iff c_in != c_out and i + 6 < rows
    # (models.py:306-320 via decode_flat).
    dshapes = cfg.decoder_conv_shapes
    res = r8
    for i, shape in enumerate(dshapes[:-1]):
        c_in, c_out, _, k, t = shape
        add(c_in, c_out, 1, k, t, res, res)
        if c_in != c_out and i + 6 < len(dshapes):
            res *= 2
    return sorted(cases)


def timed(fn, x, iters):
    out = fn(x)
    float(jnp.asarray(out).ravel()[0])  # fence (block_until_ready no-ops)
    windows = []
    for _ in range(3):
        c = x
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(c)
            # Data-dependent chain: the tunnel memoizes repeated identical
            # executions; shape-changing blocks chain through a scalar.
            c = (x * 0.99 + out * 0.01 if out.shape == x.shape
                 else x + 0.0 * jnp.ravel(out)[0].astype(x.dtype))
        float(jnp.asarray(out).ravel()[0])
        windows.append((time.perf_counter() - t0) / iters * 1e3)
    return min(windows)


def main(args):
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
    from arbitrarystyletransfer_tpu.ops.pallas import policy
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        flat_block_apply,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        fused_block_apply,
        xla_block_apply,
    )
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = ModelConfig()
    cases = enumerate_blocks(cfg, args.size)
    if args.skip_existing:
        try:
            with open(args.out) as fh:
                have = json.load(fh).get("cases", {})
        except (OSError, json.JSONDecodeError):
            have = {}
        cases = [
            c for c in cases
            if policy.block_key(c[0], c[1], c[2], c[3], c[4], c[5], c[6])
            not in have
        ]
    print(f"{len(cases)} unique block instances at {args.size}px",
          flush=True)

    rng = np.random.default_rng(0)
    table = {}
    for c_in, c_out, stride, k, t, h, w in cases:
        blk = DepthWiseConv(c_in, c_out, stride=stride, kernel_size=k,
                            expand_ratio=t, use_norm=False,
                            use_identity=c_in == c_out)
        x32 = jnp.asarray(
            rng.normal(0, 1, (args.batch, h, w, c_in)), jnp.float32
        )
        params = blk.init(jax.random.PRNGKey(0), x32)["params"]
        x = x32.astype(jnp.bfloat16)
        xf4 = jnp.transpose(x, (0, 3, 1, 2))

        if stride == 2:
            # Stride-2: xla (NHWC) vs the space-to-depth flat2 kernel
            # (flat-NCHW-native, like "flat" below).
            from arbitrarystyletransfer_tpu.ops.pallas.flatblock_s2 import (
                flat_s2_block_apply_f,
                s2_eligible,
            )

            fns = {
                "xla": jax.jit(
                    lambda v, p=params, k=k, t=t: xla_block_apply(
                        p, v, k, 2, t)),
            }
            if s2_eligible(h, w):
                def flat2_native(v, p=params, k=k, t=t, h=h, w=w):
                    b = v.shape[0]
                    yf = flat_s2_block_apply_f(
                        p, v.reshape(b, v.shape[1], h * w), h, k, t
                    )
                    return yf.reshape(b, yf.shape[1], h // 2, w // 2)

                fns["flat2"] = jax.jit(flat2_native)

            def transpose_pair(v):
                nhwc = jnp.transpose(v, (0, 2, 3, 1)) * 1.0000001
                return jnp.transpose(nhwc, (0, 3, 1, 2))

            key = policy.block_key(c_in, c_out, 2, k, t, h, w)
            row = {}
            for name, fn in fns.items():
                arg = xf4 if name == "flat2" else x
                try:
                    row[f"{name}_ms"] = round(
                        timed(fn, arg, args.iters), 3
                    )
                except Exception as e:  # noqa: BLE001
                    row[f"{name}_err"] = str(e)[:160]
            try:
                row["tp_ms"] = round(
                    timed(jax.jit(transpose_pair), xf4, args.iters) / 2, 3
                )
            except Exception as e:  # noqa: BLE001
                row["tp_err"] = str(e)[:160]
            timed_impls = {
                n: row[f"{n}_ms"]
                for n in ("xla", "flat2") if f"{n}_ms" in row
            }
            if timed_impls:
                row["best"] = min(timed_impls, key=timed_impls.get)
            table[key] = row
            print(json.dumps({key: row}), flush=True)
            continue

        fns = {
            "xla": jax.jit(lambda v, p=params, k=k, t=t: xla_block_apply(
                p, v, k, 1, t)),
            "fused": jax.jit(
                lambda v, p=params, k=k, t=t: fused_block_apply(
                    p, v, k, t)),
        }
        from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
            _stride_ok,
            flat_block_apply_f,
            plan_flat_block,
            prepad_flat,
        )

        # The flat kernel is timed in its NATIVE flat-NCHW form (as the
        # engine chains it) — the NHWC wrapper's two boundary transposes
        # are a property of the chain TRANSITION, not the block, and are
        # measured separately below as tp_ms (one-way layout-change cost)
        # so the chain planner (policy.plan_chain) can charge them only
        # where a transition actually happens.  flati_ms additionally
        # times the block as a halo-chain INTERIOR (prepadded input,
        # halo-padded output): flat_ms - flati_ms is the measured XLA
        # prep+slice overhead an isolated flat block pays (~3.5 ms at
        # 512px, scripts/probe_flat_r3b.py).
        def flat_native(v, p=params, k=k, t=t, h=h, w=w):
            b = v.shape[0]
            yf = flat_block_apply_f(p, v.reshape(b, v.shape[1], h * w),
                                    h, k, t)
            return yf.reshape(b, yf.shape[1], h, w)

        def transpose_pair(v):
            nhwc = jnp.transpose(v, (0, 2, 3, 1)) * 1.0000001
            return jnp.transpose(nhwc, (0, 3, 1, 2))

        xpad = None
        if _stride_ok(w):
            # (k5 t6 once exceeded a 15-minute Mosaic compile budget; the
            # compile-cost-aware row-group cap in flat_expand_dw_project
            # brings it to ~50 s local, so every stride-eligible block
            # tunes; non-128-multiple widths run with a padded stride.)
            fns["flat"] = jax.jit(flat_native)

            plan = plan_flat_block(
                c_in, c_in * t if t != 1 else c_in, c_out, k, h, w,
                expand=t != 1,
            )
            rows_out = max(
                plan["pad"] + plan["n_rg"] * plan["th"],
                plan["n_rg"] * plan["th"] + 2 * plan["pad"],
            )
            xpad = prepad_flat(
                xf4.reshape(args.batch, c_in, h * w), h, w, plan["pad"],
                plan["ci_p"], plan["th"], plan["n_rg"], plan["ws"],
            )

            def flat_interior(v, p=params, k=k, t=t, h=h, w=w,
                              op=plan["pad"], ro=rows_out):
                return flat_block_apply_f(
                    p, v, h, k, t, in_prepadded=True, w_dim=w,
                    out_pad=op, out_rows=ro,
                )

            fns["flati"] = jax.jit(flat_interior)

        key = policy.block_key(c_in, c_out, 1, k, t, h, w)
        row = {}
        for name, fn in fns.items():
            arg = {"flat": xf4, "flati": xpad}.get(name, x)
            try:
                row[f"{name}_ms"] = round(timed(fn, arg, args.iters), 3)
            except Exception as e:  # noqa: BLE001 — record, keep tuning
                row[f"{name}_err"] = str(e)[:160]
        try:
            row["tp_ms"] = round(
                timed(jax.jit(transpose_pair), xf4, args.iters) / 2, 3
            )
        except Exception as e:  # noqa: BLE001
            row["tp_err"] = str(e)[:160]
        timed_impls = {
            n: row[f"{n}_ms"]
            for n in ("xla", "fused", "flat") if f"{n}_ms" in row
        }
        if timed_impls:
            row["best"] = min(timed_impls, key=timed_impls.get)
        table[key] = row
        print(json.dumps({key: row}), flush=True)

    git = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    # Merge into an existing table: block keys carry @HxW, so entries for
    # different inference sizes coexist (VERDICT r4 item 2 — 512/320/256
    # all tuned in the one checked-in table).  Freshly-timed keys replace
    # stale ones; other sizes' rows are preserved.
    merged = dict(table)
    sizes = [args.size]
    try:
        with open(args.out) as fh:
            prev = json.load(fh)
        merged = {**prev.get("cases", {}), **table}
        prev_sizes = prev.get("meta", {}).get("sizes") or [
            prev.get("meta", {}).get("size")
        ]
        sizes = sorted({s for s in [*prev_sizes, args.size] if s})
    except (OSError, json.JSONDecodeError):
        pass
    out = {
        "meta": {
            "sizes": sizes, "batch": args.batch, "iters": args.iters,
            "git": git, "device": str(jax.devices()[0]),
        },
        "cases": merged,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512,
                   help="Inference resolution to tune for (bench default).")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument(
        "--out",
        default="arbitrarystyletransfer_tpu/ops/pallas/tuned_policy.json",
    )
    p.add_argument(
        "--skip_existing", action="store_true",
        help="Only tune block instances not already in the table "
             "(incremental multi-size tuning).",
    )
    main(p.parse_args())
