"""Parity tests for the stride-2 space-to-depth flat megakernel
(ops/pallas/flatblock_s2).

Contract: reproduce ``fused_block.xla_block_apply(stride=2)`` — the
torch-golden-tested functional composition of a stride-2 DepthWiseConv
block (reference mobilenetv2.py:119-148) with folded-BN inference
semantics — for every stride-2 block shape the encoder dispatches
(enc_conv_shapes rows 2/4/7).  Interpret mode on CPU; f32 for tight
parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Interpret-mode Pallas kernel parity is minutes-scale on a CPU host; the
# fast CI subset (-m "not slow") excludes these suites (VERDICT r4 item 2).
pytestmark = pytest.mark.slow

from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
from arbitrarystyletransfer_tpu.ops.pallas.fused_block import xla_block_apply
from arbitrarystyletransfer_tpu.ops.pallas.flatblock_s2 import (
    _s2_needed_tiles,
    _s2_patch_pairs,
    _s2_taps,
    flat_s2_block_apply_f,
    s2_eligible,
)


def _make(c_in, c_out, k, t, h, w, use_norm, seed=0, batch=2):
    rng = np.random.default_rng(seed)
    blk = DepthWiseConv(
        c_in, c_out, stride=2, kernel_size=k, expand_ratio=t,
        use_norm=use_norm,
    )
    x = jnp.asarray(rng.normal(0, 1, (batch, h, w, c_in)), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(seed), x)
    params = variables["params"]
    stats = None
    if use_norm:
        stats = jax.tree.map(
            lambda a: a + jnp.asarray(
                rng.uniform(0.1, 0.5, a.shape), a.dtype
            ),
            variables["batch_stats"],
        )
    return params, stats, x


def _run_flat(params, x, k, t, stats, dtype, **kw):
    b, h, w, c = x.shape
    xf = jnp.transpose(x.astype(dtype), (0, 3, 1, 2)).reshape(b, c, h * w)
    yf = flat_s2_block_apply_f(
        params, xf, h, k, t, stats=stats, interpret=True, **kw
    )
    co = yf.shape[1]
    return jnp.transpose(
        yf.reshape(b, co, h // 2, w // 2), (0, 2, 3, 1)
    )


def test_tap_geometry():
    """Every tap maps to a legal (plane, row offset, shift) triple and
    the patch sources are same-parity, in-roll-set (parity preservation
    under reflection)."""
    for k in (3, 5):
        p = (k - 1) // 2
        for di, dj, q, ro, s in _s2_taps(k):
            # plane row offset never exceeds the slab halo
            assert 0 <= ro <= p if q < 2 else ro <= p - 1
            assert s in (-1, 0, 1)
        # patch sanity is asserted inside; exercise for several widths
        for w in (64, 128, 256, 320):
            _s2_patch_pairs(k, w)
            _s2_needed_tiles(k, w)
    assert len(_s2_patch_pairs(3, 256)) == 1
    assert len(_s2_patch_pairs(5, 256)) == 3


def test_eligibility():
    assert s2_eligible(512, 512)       # e2 at 512px: out W=256
    assert s2_eligible(256, 256)       # e4: out W=128
    assert not s2_eligible(128, 128)   # e7: out W=64 -> 50% pad waste
    assert not s2_eligible(97, 128)    # odd H
    assert not s2_eligible(256, 320)   # out W=160 -> ws=256, waste > 1/3
    assert s2_eligible(640, 640)       # out W=320 -> ws=384, waste <= 1/3


CASES = [
    # (c_in, c_out, k, t, H, W, use_norm) — H, W are INPUT dims
    (16, 24, 3, 6, 32, 256, True),    # e2-shaped (k3 t6, folded BN)
    (24, 40, 5, 6, 32, 256, True),    # e4-shaped (k5 t6, folded BN)
    (40, 80, 3, 4, 24, 256, True),    # e7-shaped (k3 t4)
    (16, 24, 3, 6, 30, 192, False),   # padded stride: out W=96 -> ws=128
    (24, 24, 5, 4, 20, 256, False),   # k5, c_out == c_in (still no id)
    (8, 16, 3, 6, 18, 256, True),     # tail-row masking (out H=9)
]


@pytest.mark.parametrize(
    "case", CASES,
    ids=lambda c: f"{c[0]}-{c[1]}s2k{c[2]}t{c[3]}_{c[4]}x{c[5]}"
                  f"{'n' if c[6] else ''}",
)
def test_s2_block_matches_xla_f32(case):
    c_in, c_out, k, t, h, w, use_norm = case
    params, stats, x = _make(c_in, c_out, k, t, h, w, use_norm)
    ref = xla_block_apply(
        params, x, k, 2, t, stats=stats, dtype=jnp.float32
    )
    got = _run_flat(params, x, k, t, stats, jnp.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_s2_block_bf16_close():
    """bf16 I/O path stays within bf16 rounding of the f32 reference."""
    params, stats, x = _make(16, 24, 3, 6, 32, 256, True)
    ref = xla_block_apply(
        params, x, 3, 2, 6, stats=stats, dtype=jnp.float32
    )
    got = _run_flat(params, x, 3, 6, stats, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=0.05, atol=0.1
    )


def test_s2_nonresident_matches_resident():
    params, stats, x = _make(24, 40, 5, 6, 32, 256, True)
    res = _run_flat(params, x, 5, 6, stats, jnp.float32,
                    force_resident=True)
    hbm = _run_flat(params, x, 5, 6, stats, jnp.float32,
                    force_resident=False)
    np.testing.assert_allclose(
        np.asarray(res), np.asarray(hbm), rtol=1e-6, atol=1e-6
    )


def test_encode_flat_routes_flat2_and_matches():
    """encode_flat at 256px routes e2 (16->24 s2 k3, out W=128) through
    the space-to-depth kernel (e4/e7 outputs are lane-ineligible at this
    size) and must match encode_fused exactly."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.encoder import Encoder
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        encode_flat,
        encoder_descs,
        _plan_impls,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        encode_fused,
    )

    cfg = ModelConfig()
    descs = encoder_descs(cfg.enc_conv_shapes, 256, 256,
                          cfg.enc_out_layers, cfg.expand_ratio)
    # "all" routes every eligible block through the flat kernels (the A/B
    # mode); the "tail"/untuned heuristic routes k3 stride-2 to xla since
    # the 512px tuning showed flat2 loses on the thin-channel k3 instance.
    impls = _plan_impls(descs, "all")
    assert impls[1] == "flat2"  # e2 @256: out W=128, eligible
    assert _plan_impls(descs, "tail")[1] == "xla"

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)), jnp.float32)
    enc = Encoder()
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.1, 0.5, a.shape), a.dtype
        ),
        stats,
    )
    ref = encode_fused(
        params, stats, x, cfg.enc_conv_shapes, cfg.enc_out_layers,
        expand_ratio=cfg.expand_ratio, dtype=jnp.float32,
        min_fused_size=10**9,
    )
    got = encode_flat(
        params, stats, x, cfg.enc_conv_shapes, cfg.enc_out_layers,
        expand_ratio=cfg.expand_ratio, dtype=jnp.float32, interpret=True,
        flat_blocks="all",
    )
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )


def test_encode_flat_chained_runs_match():
    """Encoder halo chaining: a run of two consecutive flat blocks, a
    flat2 downsample halo-chained into a following flat block, and a tap
    breaking the chain — all must match encode_fused exactly."""
    from arbitrarystyletransfer_tpu.models.encoder import Encoder
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import encode_flat
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        encode_fused,
    )

    shapes = (
        (3, 16, 1, 3, 1),
        (16, 16, 1, 3, 6),   # e1 @128: flat (run of 2 with e2)
        (16, 16, 1, 3, 6),   # e2 @128: flat, tap -> run breaks here
        (16, 24, 2, 3, 6),   # e3 s2 @128 -> wait: out W=64 ineligible
        (24, 24, 1, 3, 6),   # e4
    )
    # Use 256px so e3's output width is 128 (s2-eligible) and e4 chains.
    import dataclasses

    from arbitrarystyletransfer_tpu.config import ModelConfig

    out_layers = (2, 4)
    cfg = dataclasses.replace(
        ModelConfig(), enc_conv_shapes=shapes, enc_out_layers=out_layers
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 256, 3)), jnp.float32)
    enc = Encoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            rng.uniform(0.1, 0.5, a.shape), a.dtype
        ),
        stats,
    )
    ref = encode_fused(
        params, stats, x, shapes, out_layers, expand_ratio=3,
        dtype=jnp.float32, min_fused_size=10**9,
    )
    got = encode_flat(
        params, stats, x, shapes, out_layers, expand_ratio=3,
        dtype=jnp.float32, interpret=True, flat_blocks="all",
    )
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )


def test_s2_out_pad_halo_layout():
    """out_pad emits the consumer's prepadded layout: valid rows at
    [out_pad, out_pad+Ho), reflect halo rows in place."""
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        plan_flat_block,
    )

    c_in, c_out, k, t, h, w = 16, 24, 3, 6, 32, 256
    params, stats, x = _make(c_in, c_out, k, t, h, w, True)
    ho, wo = h // 2, w // 2
    # consumer: a stride-1 k3 block at output res
    nxt = plan_flat_block(c_out, c_out * 6, c_out, 3, ho, wo)
    out_rows = max(
        nxt["pad"] + 0, nxt["n_rg"] * nxt["th"] + 2 * nxt["pad"]
    )

    b = x.shape[0]
    xf = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
    xf = xf.reshape(b, c_in, h * w)
    y_pad = flat_s2_block_apply_f(
        params, xf, h, k, t, stats=stats, interpret=True,
        out_pad=nxt["pad"], out_rows=out_rows,
    )
    y_ref = flat_s2_block_apply_f(
        params, xf, h, k, t, stats=stats, interpret=True,
    )
    op = nxt["pad"]
    ws = nxt["ws"]
    y4 = y_pad.reshape(b, y_pad.shape[1], -1, ws)
    valid = y4[:, :c_out, op : op + ho, :wo].reshape(b, c_out, ho * wo)
    np.testing.assert_allclose(
        np.asarray(valid), np.asarray(y_ref), rtol=1e-6, atol=1e-6
    )
    # reflect halo rows written in place
    np.testing.assert_allclose(
        np.asarray(y4[:, :c_out, op - 1, :wo]),
        np.asarray(y4[:, :c_out, op + 1, :wo]),
    )
    np.testing.assert_allclose(
        np.asarray(y4[:, :c_out, op + ho, :wo]),
        np.asarray(y4[:, :c_out, op + ho - 2, :wo]),
    )
