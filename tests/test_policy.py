"""Autotuned dispatch policy (ops/pallas/policy.py + the "auto" chain
mode in ops/pallas/flatblock).

The table is written by scripts/autotune_blocks.py on real hardware;
these tests pin the loading/dispatch contract with synthetic tables so
the engine's ``decoder_impl/encoder_impl="auto"`` mode is exercised
without a chip.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arbitrarystyletransfer_tpu.ops.pallas import policy
from arbitrarystyletransfer_tpu.ops.pallas.flatblock import _choose_impl


@pytest.fixture
def tuned(tmp_path, monkeypatch):
    """Install a synthetic policy table; returns a writer function."""

    def write(cases: dict):
        path = tmp_path / "policy.json"
        path.write_text(json.dumps({"meta": {}, "cases": cases}))
        monkeypatch.setenv("AST_TUNED_POLICY", str(path))
        policy.load_policy.cache_clear()

    yield write
    policy.load_policy.cache_clear()


def test_missing_table_is_empty(monkeypatch):
    monkeypatch.setenv("AST_TUNED_POLICY", "/nonexistent/policy.json")
    policy.load_policy.cache_clear()
    try:
        assert policy.load_policy() == {}
        assert policy.best_impl(16, 16, 1, 3, 6, 512, 512) is None
    finally:
        policy.load_policy.cache_clear()


def test_best_impl_reads_table(tuned):
    key = policy.block_key(16, 16, 1, 3, 6, 512, 512)
    tuned({key: {"flat_ms": 6.5, "fused_ms": 8.5, "best": "flat"}})
    assert policy.best_impl(16, 16, 1, 3, 6, 512, 512) == "flat"
    assert policy.best_impl(24, 24, 1, 3, 6, 512, 512) is None


def test_auto_honors_table_and_falls_back(tuned):
    tuned({
        policy.block_key(16, 16, 1, 3, 6, 512, 512): {"best": "xla"},
        policy.block_key(80, 80, 1, 3, 4, 256, 256): {"best": "flat"},
        # A "flat" verdict on a stride-ineligible width must be clamped
        # (W=64 -> stride 128, 50% pad-column waste > the 1/3 cap).
        policy.block_key(16, 16, 1, 3, 6, 64, 64): {"best": "flat"},
    })
    assert _choose_impl(16, 16, 3, 6, 512, 512, "auto") == "xla"
    assert _choose_impl(80, 80, 3, 4, 256, 256, "auto") == "flat"
    # Clamped: W=64 is stride-ineligible -> heuristic fallback (fused).
    assert _choose_impl(16, 16, 3, 6, 64, 64, "auto") == "fused"
    # Unmeasured shape -> tail heuristic (thin k3, stride-eligible -> flat).
    assert _choose_impl(24, 24, 3, 6, 512, 512, "auto") == "flat"
    assert _choose_impl(40, 40, 5, 4, 512, 512, "auto") == "fused"
    # W=96 (stride 128, 25% waste) and W=320 (the reference imsize at full
    # res; stride 384, 17% waste) are stride-eligible since the padded-
    # stride generalization.
    assert _choose_impl(16, 16, 3, 6, 96, 96, "tail") == "flat"
    assert _choose_impl(16, 16, 3, 6, 320, 320, "tail") == "flat"


def test_k5_t6_eligible_with_capped_row_group():
    # k5 t6 is flat-eligible again: the compile-cost-aware row-group cap
    # (flat_expand_dw_project.compile_ok) holds its Mosaic compile at
    # ~50 s (row_group 16) instead of >15 min (row_group 32).
    assert _choose_impl(40, 24, 5, 6, 512, 512, "all") == "flat"
    # ... but never on a stride-ineligible width (64 -> 50% waste).
    assert _choose_impl(40, 24, 5, 6, 64, 64, "all") != "flat"


def test_plan_chain_charges_layout_transitions(tuned):
    """The DP must flip a sandwiched block to flat when its NHWC win is
    smaller than the two boundary transposes it forces, and must keep an
    isolated flat-winning block NHWC when entry+exit transposes eat the
    win."""
    k_a = policy.block_key(40, 40, 1, 5, 4, 512, 512)
    k_b = policy.block_key(40, 24, 1, 5, 6, 512, 512)
    k_c = policy.block_key(24, 24, 1, 3, 6, 512, 512)
    tuned({
        # flat wins by 2.0 each side, b's fused wins by 1.0 bare, and a
        # transition costs 1.2 — staying flat through b saves 2*1.2-1.0.
        k_a: {"flat_ms": 16.0, "fused_ms": 18.0, "xla_ms": 25.0,
              "tp_ms": 1.2},
        k_b: {"flat_ms": 20.0, "fused_ms": 19.0, "xla_ms": 29.0,
              "tp_ms": 1.2},
        k_c: {"flat_ms": 8.0, "fused_ms": 10.0, "xla_ms": 18.0,
              "tp_ms": 0.8},
    })
    blocks = [
        {"key": k_a}, {"key": k_b}, {"key": k_c},
    ]
    assert policy.plan_chain(blocks) == ["flat", "flat", "flat"]

    # Isolated block: flat wins by 0.5 bare but entry+exit transposes
    # cost 2*1.2 — must stay NHWC (fused).
    tuned({k_a: {"flat_ms": 17.5, "fused_ms": 18.0, "xla_ms": 25.0,
                 "tp_ms": 1.2}})
    assert policy.plan_chain([{"key": k_a}]) == ["fused"]

    # force_nhwc (stride-2, untuned) breaks a flat run in two; each run
    # then pays its own boundaries.
    tuned({
        k_a: {"flat_ms": 10.0, "fused_ms": 18.0, "xla_ms": 25.0,
              "tp_ms": 1.2},
    })
    plan = policy.plan_chain([
        {"key": k_a},
        {"key": "s2", "force_nhwc": True, "est_bytes": int(300e6)},
        {"key": k_a},
    ])
    assert plan == ["flat", "xla", "flat"]

    # Missing entries -> None (caller falls back to heuristics).
    assert policy.plan_chain([{"key": "unknown"}]) is None


def test_plan_chain_stride2_flat2(tuned):
    """s2-eligible stride-2 rows offer the space-to-depth flat2 kernel
    as the flat-state option: a measured flat2 win keeps the chain flat
    through the downsample; a measured flat2 loss routes xla (paying the
    boundary transposes)."""
    k_a = policy.block_key(16, 16, 1, 3, 6, 512, 512)
    k_s2 = policy.block_key(16, 24, 2, 3, 6, 512, 512)
    k_c = policy.block_key(24, 24, 1, 3, 6, 256, 256)
    base = {
        k_a: {"flat_ms": 10.0, "fused_ms": 18.0, "xla_ms": 25.0,
              "tp_ms": 1.2},
        k_c: {"flat_ms": 4.0, "fused_ms": 8.0, "xla_ms": 10.0,
              "tp_ms": 0.6},
    }
    # flat2 wins big (12.5 -> 3.1 ms): chain stays flat end to end.
    tuned({**base, k_s2: {"xla_ms": 12.5, "flat2_ms": 3.1, "tp_ms": 1.2}})
    plan = policy.plan_chain([
        {"key": k_a},
        {"key": k_s2, "stride2": True},
        {"key": k_c},
    ])
    assert plan == ["flat", "flat2", "flat"]

    # flat2 much slower than xla + both transposes: route xla.
    tuned({**base, k_s2: {"xla_ms": 2.0, "flat2_ms": 30.0, "tp_ms": 1.2}})
    plan = policy.plan_chain([
        {"key": k_a},
        {"key": k_s2, "stride2": True},
        {"key": k_c},
    ])
    assert plan[1] == "xla"

    # Untuned stride-2 entry: both impls cost the same, transitions
    # decide — sandwiched between flat winners the chain stays flat.
    tuned(base)
    plan = policy.plan_chain([
        {"key": k_a},
        {"key": k_s2, "stride2": True},
        {"key": k_c},
    ])
    assert plan == ["flat", "flat2", "flat"]


def test_plan_chain_flat2_chain_break_charges_exit(tuned):
    """A flat2 row cannot consume a prepadded halo input: staying flat
    through it must still charge the preceding flat block's exit-slice
    share (flat_ms - flati_ms)/2."""
    k_a = policy.block_key(16, 16, 1, 3, 6, 512, 512)
    k_s2 = policy.block_key(16, 24, 2, 3, 6, 512, 512)
    # flat interior wins (9.0) but the standalone flat cost (15.0) loses
    # to fused (10.0) once the block must pay both of its own boundary
    # shares (3.0 each) AND the transposes: with the chain broken by
    # flat2 right after, block a is effectively isolated.
    tuned({
        k_a: {"flat_ms": 15.0, "flati_ms": 9.0, "fused_ms": 10.0,
              "xla_ms": 25.0, "tp_ms": 1.2},
        k_s2: {"xla_ms": 3.0, "flat2_ms": 3.0, "tp_ms": 1.2},
    })
    plan = policy.plan_chain([
        {"key": k_a},
        {"key": k_s2, "stride2": True},
    ])
    # flat route: tp(1.2) + bnd(3.0) + flati(9.0) + [stay, +prev_bnd 3.0]
    #   + flat2(3.0) + exit tp(1.2) = 20.4
    # fused route: fused(10.0) + tp(1.2) + flat2(3.0) + exit tp(1.2) = 15.4
    # (or all-nhwc: 10.0 + 3.0 = 13.0) -> block a must NOT go flat.
    assert plan[0] != "flat"


def test_decode_auto_matches_fused_reference(tuned):
    """decode_flat(flat_blocks="auto") with a mixed policy must equal the
    plain fused-policy decode (f32, interpret) — dispatch changes the
    lowering, never the math."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.decoder import Decoder
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import decode_flat
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        decode_fused,
    )

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 0.5, (1, 8, 8, 128)), jnp.float32)
    dec = Decoder(cfg)
    params = dec.init(jax.random.PRNGKey(0), z)["params"]

    # Final blocks run at 64px (not lane-aligned at this tiny size), so
    # force a mix of xla and fused via the table keyed at those sizes.
    tuned({
        policy.block_key(16, 16, 1, 3, 6, 64, 64): {"best": "xla"},
        policy.block_key(24, 24, 1, 3, 6, 64, 64): {"best": "fused"},
    })
    out_auto = decode_flat(
        params, z, cfg.decoder_conv_shapes, exporting=True,
        interpret=True, dtype=jnp.float32, flat_blocks="auto",
    )
    out_ref = decode_fused(
        params, z, cfg.decoder_conv_shapes, exporting=True,
        interpret=True, dtype=jnp.float32, min_fused_size=128,
    )
    np.testing.assert_allclose(
        np.asarray(out_auto), np.asarray(out_ref), rtol=2e-5, atol=2e-5
    )
