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
        # A "flat" verdict on a non-lane-aligned width must be clamped.
        policy.block_key(16, 16, 1, 3, 6, 96, 96): {"best": "flat"},
    })
    assert _choose_impl(16, 16, 3, 6, 512, 512, "auto") == "xla"
    assert _choose_impl(80, 80, 3, 4, 256, 256, "auto") == "flat"
    # Clamped: W=96 is not a lane multiple -> heuristic fallback (fused).
    assert _choose_impl(16, 16, 3, 6, 96, 96, "auto") == "fused"
    # Unmeasured shape -> tail heuristic (thin k3, lane-aligned -> flat).
    assert _choose_impl(24, 24, 3, 6, 512, 512, "auto") == "flat"
    assert _choose_impl(40, 40, 5, 4, 512, 512, "auto") == "fused"


def test_k5_t6_excluded_everywhere():
    # The k5 t6 flat compile exceeded a 15-minute Mosaic budget; no mode
    # may route it to the flat kernel.
    for mode in ("tail", "all", "auto"):
        assert _choose_impl(40, 24, 5, 6, 512, 512, mode) != "flat"


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
