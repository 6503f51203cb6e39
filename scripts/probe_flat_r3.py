#!/usr/bin/env python
"""Locate where the flat megakernel's time goes on the 512px decoder tail.

The decoder's 512px blocks are ~56% of the whole stylize pass (tuned table,
round 3) and the flat kernel's measured 18.5 ms on d8 (40-40 k5 t4 @512 b8)
is ~4x its VPU-op roofline (~4 ms), so this probe A/Bs:

  * config variants: row_group x chunk_e x force_resident
  * op-class ablations (timing-only, results are WRONG): no boundary
    patches / no lane rolls / no hardswish — monkeypatched so the repo
    kernel stays untouched

Methodology per scripts/bench_fused_block.py: N data-dependent chained
stages inside one jit, value-fetch sync (block_until_ready is a no-op
through the tunnel).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/probe_flat_r3.py
"""

import argparse
import functools
import json
import time
import types

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    return float(jnp.asarray(out).ravel()[0])


def bench(fn, x, iters=3):
    _sync(fn(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(x))
        times.append(time.perf_counter() - t0)
    return min(times)


def make_params(rng, c_in, c_out, k, t, dtype=jnp.bfloat16):
    e = c_in * t
    p = {
        "DepthwiseConv2D_0": {
            "kernel": jnp.asarray(rng.normal(0, 0.2, (k, k, 1, e)), dtype)
        },
        "SELayer_0": {
            "Dense_0": {
                "kernel": jnp.asarray(
                    rng.normal(0, 0.2, (e, max(8, e // 4))), jnp.float32
                ),
                "bias": jnp.zeros((max(8, e // 4),), jnp.float32),
            },
            "Dense_1": {
                "kernel": jnp.asarray(
                    rng.normal(0, 0.2, (max(8, e // 4), e)), jnp.float32
                ),
                "bias": jnp.zeros((e,), jnp.float32),
            },
        },
    }
    if t != 1:
        p["Conv_0"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.2, (1, 1, c_in, e)), dtype)
        }
        p["Conv_1"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.2, (1, 1, e, c_out)), dtype)
        }
    else:
        p["Conv_0"] = {
            "kernel": jnp.asarray(rng.normal(0, 0.2, (1, 1, e, c_out)), dtype)
        }
    return p


def _pltpu_with_identity_roll(real_pltpu):
    stub = types.SimpleNamespace()
    for name in dir(real_pltpu):
        if not name.startswith("_"):
            setattr(stub, name, getattr(real_pltpu, name))
    stub.roll = lambda x, shift, axis: x
    return stub


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

        def run(xv, row_group=None, force_resident=None, chunk_e="auto"):
            y = fb.flat_block_apply_f(
                params, xv, size, k, t,
                row_group=row_group, force_resident=force_resident,
                chunk_e=chunk_e,
            )
            # data dependence between chained stages
            return (y * (1.0 + 1e-6 * y[0, 0, 0])).astype(xv.dtype)

        def chain(xv, **kw):
            for _ in range(args.chain):
                xv = run(xv, **kw)
            return xv

        variants = [
            ("auto", {}),
            ("rg8_res", dict(row_group=8, force_resident=True)),
            ("rg16_res_c32", dict(row_group=16, force_resident=True,
                                  chunk_e=32)),
            ("rg16_nores", dict(row_group=16, force_resident=False)),
            ("rg8_res_c32", dict(row_group=8, force_resident=True,
                                 chunk_e=32)),
            # Halo amortization: rg32 halves the k5 halo share vs rg16
            # (36/32 vs 20/16) at a one-off ~2.5 min Mosaic compile
            # (persistent-cached).
            ("rg32_nores", dict(row_group=32, force_resident=False)),
        ]
        if k == 3:
            variants.append(("rg32_res", dict(row_group=32,
                                              force_resident=True)))
            variants.append(("rg64_nores", dict(row_group=64,
                                                force_resident=False)))
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

        # --- ablations (wrong results, timing only) ---------------------
        real_pltpu = fb.pltpu
        real_patches = fb._patch_pairs
        real_hsw = fb._hardswish
        ablations = {
            "abl_nopatch": lambda: setattr(
                fb, "_patch_pairs", lambda k_, w_: []
            ),
            "abl_noroll": lambda: setattr(
                fb, "pltpu", _pltpu_with_identity_roll(real_pltpu)
            ),
            "abl_nohsw": lambda: setattr(fb, "_hardswish", lambda v: v),
        }
        for aname, apply_abl in ablations.items():
            try:
                apply_abl()
                f = jax.jit(chain)
                dt = bench(f, x, args.iters) / args.chain * 1e3
                out[aname] = round(dt, 3)
                print(f"{name} [{aname}]: {dt:.3f} ms", flush=True)
            except Exception as err:  # noqa: BLE001
                out[aname] = f"FAIL: {str(err)[:120]}"
                print(f"{name} [{aname}]: FAIL {str(err)[:200]}", flush=True)
            finally:
                fb.pltpu = real_pltpu
                fb._patch_pairs = real_patches
                fb._hardswish = real_hsw

        results[name] = out

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--chain", type=int, default=6)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--case", default=None)
    main(p.parse_args())
