#!/usr/bin/env python
"""Phase-2 flat-kernel cost isolation (see probe_flat_r3.py for phase 1).

Phase 1 found: rolls/patches/hardswish ablations change nothing (<2%),
and SMALLER row groups win (rg8 17.3 < rg16 19.7 < rg32 22.8 on d8) —
the kernel is not elementwise-VPU-bound.  This phase ablates the
depthwise taps themselves (_abl_taps), the SE reduction (_abl_se), and
measures the chain-stage fixed overhead (prep+slice+mult with a trivial
body) to locate the remaining ~13 ms over roofline.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_flat_r3b.py
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from probe_flat_r3 import bench, make_params  # noqa: E402


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import arbitrarystyletransfer_tpu.ops.pallas.flatblock as fb

    rng = np.random.default_rng(0)
    b = args.batch
    cases = {
        "d8 40-40 k5 t4 @512": (40, 40, 5, 4, 512),
        "d11 24-24 k3 t6 @512": (24, 24, 3, 6, 512),
    }
    if args.case:
        cases = {k: v for k, v in cases.items() if args.case in k}

    results = {}
    for name, (ci, co, k, t, size) in cases.items():
        params = make_params(rng, ci, co, k, t)
        x = jnp.asarray(
            rng.uniform(-1, 1, (b, ci, size * size)), jnp.bfloat16
        )

        def run(xv, **kw):
            y = fb.flat_block_apply_f(
                params, xv, size, k, t,
                row_group=8, force_resident=True, **kw,
            )
            return (y * (1.0 + 1e-6 * y[0, 0, 0])).astype(xv.dtype)

        def chain(xv, **kw):
            for _ in range(args.chain):
                xv = run(xv, **kw)
            return xv

        variants = [
            ("base", {}),
            ("taps1", dict(_abl_taps=1)),
            ("taps9", dict(_abl_taps=9)),
            ("nose", dict(_abl_se=False)),
            ("taps1_nose", dict(_abl_taps=1, _abl_se=False)),
        ]
        out = {}
        for vname, kw in variants:
            try:
                f = jax.jit(functools.partial(chain, **kw))
                dt = bench(f, x, args.iters) / args.chain * 1e3
                out[vname] = round(dt, 3)
                print(f"{name} [{vname}]: {dt:.3f} ms", flush=True)
            except Exception as err:  # noqa: BLE001
                out[vname] = f"FAIL: {str(err)[:120]}"
                print(f"{name} [{vname}]: FAIL {str(err)[:200]}", flush=True)

        # Chain-stage fixed overhead: identical prep (reshape, reflect
        # rows, channel/stride pads) and slice, but a single multiply in
        # place of the pallas kernel.
        pad = (k - 1) // 2
        ci_p = -(-ci // 16) * 16

        def stage_only(xv):
            for _ in range(args.chain):
                x4 = xv.reshape(b, ci, size, size)
                xp = jnp.pad(
                    x4, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect"
                )
                xp = jnp.pad(
                    xp, ((0, 0), (0, ci_p - ci), (0, 0), (0, 0))
                )
                y = xp[:, :ci, pad:-pad] * jnp.bfloat16(1.0000001)
                xv = y.reshape(b, ci, size * size)
            return xv

        try:
            dt = bench(jax.jit(stage_only), x, args.iters) / args.chain * 1e3
            out["stage_only"] = round(dt, 3)
            print(f"{name} [stage_only]: {dt:.3f} ms", flush=True)
        except Exception as err:  # noqa: BLE001
            out["stage_only"] = f"FAIL: {str(err)[:120]}"

        results[name] = out

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--case", default=None)
    main(p.parse_args())
