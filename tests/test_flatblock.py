"""Parity tests for the flat-lane NCHW megakernel (ops/pallas/flatblock).

Same contract as tests/test_megablock.py: the kernel must reproduce
``fused_block.xla_block_apply`` — the torch-golden-tested functional
composition of a DepthWiseConv block (reference mobilenetv2.py:95-181)
with folded-BN inference semantics — for every block shape it dispatches
on.  Interpret mode on CPU; f32 for tight parity.
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
from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
    _patch_pairs,
    flat_block_apply,
    flat_block_apply_f,
)


def _make(c_in, c_out, k, t, h, w, use_norm, seed=0):
    rng = np.random.default_rng(seed)
    blk = DepthWiseConv(
        c_in, c_out, stride=1, kernel_size=k, expand_ratio=t,
        use_norm=use_norm,
    )
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, c_in)), jnp.float32)
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


def test_patch_pairs_counts():
    """p(p+1) boundary patches, all sources within the k main rolls."""
    assert len(_patch_pairs(3, 128)) == 2
    assert len(_patch_pairs(5, 128)) == 6
    for k in (3, 5):
        for dj, c, src in _patch_pairs(k, 128):
            assert 0 <= src < k


CASES = [
    # (c_in, c_out, k, t, H, W, use_norm)
    (16, 16, 3, 6, 24, 128, False),   # identity path
    (40, 24, 5, 6, 24, 128, False),   # k5, c_out != c_in
    (24, 24, 3, 1, 33, 128, False),   # expand==1, odd H (tail masking)
    (40, 40, 5, 4, 24, 256, True),    # folded BN, W=256
    (16, 8, 3, 6, 16, 128, True),     # c_out not a multiple of 16
    (8, 16, 3, 3, 9, 128, True),      # H < row_group minimum
    (16, 16, 3, 6, 16, 96, False),    # padded stride: W=96 -> ws=128
    (24, 24, 5, 4, 12, 320, True),    # padded stride: W=320 -> ws=384, k5
    (16, 16, 3, 1, 11, 96, False),    # padded stride + expand==1 + odd H
]


@pytest.mark.parametrize(
    "case", CASES,
    ids=lambda c: f"{c[0]}-{c[1]}k{c[2]}t{c[3]}_{c[4]}x{c[5]}"
                  f"{'n' if c[6] else ''}",
)
def test_flat_block_matches_xla_f32(case):
    c_in, c_out, k, t, h, w, use_norm = case
    params, stats, x = _make(c_in, c_out, k, t, h, w, use_norm)
    ref = xla_block_apply(params, x, k, 1, t, stats=stats, dtype=jnp.float32)
    got = flat_block_apply(
        params, x, k, t, stats=stats, interpret=True, dtype=jnp.float32
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_flat_block_bf16_ulp_parity():
    params, stats, x = _make(40, 40, 5, 4, 24, 128, True)
    ref = xla_block_apply(
        params, x.astype(jnp.bfloat16), 5, 1, 4, stats=stats
    ).astype(jnp.float32)
    got = flat_block_apply(
        params, x, 5, 4, stats=stats, interpret=True
    ).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=0.02 * scale, rtol=0.03
    )


def test_flat_block_forced_hbm_hidden():
    params, stats, x = _make(24, 24, 3, 6, 32, 128, True)
    a = flat_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
    )
    b = flat_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
        row_group=8, force_resident=False,
    )
    ref = xla_block_apply(params, x, 3, 1, 6, stats=stats, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_flat_block_chunked_matches_unchunked():
    """Hidden-channel chunking partitions the expand dot's OUTPUT rows
    only (the contraction is unchanged), so results agree to matmul
    reassociation noise (the interpret-mode CPU matmul blocks
    differently per shape; on the MXU the per-element order is fixed)."""
    params, stats, x = _make(16, 16, 3, 6, 16, 128, False)
    a = flat_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
        chunk_e=None,
    )
    b = flat_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
        chunk_e=32,
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
    )


def test_halo_chained_blocks_match_unchained():
    """A chain of flat blocks linked through the padded halo layout
    (in_prepadded/out_pad — the XLA pad/slice round trips between blocks
    elided, reflect halo rows written in-kernel) must match running the
    same blocks through the plain layout."""
    rng = np.random.default_rng(5)
    h, w = 19, 128  # odd H: tail row-group garbage must stay masked
    specs = [
        (16, 16, 3, 6),   # identity
        (16, 24, 5, 4),   # k3 -> k5 halo (out_pad 2), c_out change
        (24, 24, 5, 6),   # identity, k5 t6
        (24, 16, 3, 6),   # k5 -> k3 halo (out_pad 1)
    ]
    blocks = []
    x = jnp.asarray(rng.normal(0, 1, (2, h, w, specs[0][0])), jnp.float32)
    v = x
    for c_in, c_out, k, t in specs:
        blk = DepthWiseConv(c_in, c_out, stride=1, kernel_size=k,
                            expand_ratio=t, use_norm=False)
        params = blk.init(jax.random.PRNGKey(len(blocks)), v)["params"]
        blocks.append(params)
        v = blk.apply({"params": params}, v)

    # Reference: plain layout block-by-block.
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        flat_block_apply_f,
        plan_flat_block,
    )

    xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(2, specs[0][0], h * w)
    ref = xf
    for params, (c_in, c_out, k, t) in zip(blocks, specs):
        ref = flat_block_apply_f(params, ref, h, k, t, interpret=True)

    # Halo-chained: entry prep once, padded layout between blocks, plain
    # exit.
    plans = [
        plan_flat_block(c_in, c_in * t, c_out, k, h, w, expand=t != 1)
        for c_in, c_out, k, t in specs
    ]
    got = xf
    for i, (params, (c_in, c_out, k, t)) in enumerate(zip(blocks, specs)):
        last = i == len(specs) - 1
        if not last:
            nxt = plans[i + 1]
            out_pad = nxt["pad"]
            out_rows = max(
                out_pad + plans[i]["n_rg"] * plans[i]["th"],
                nxt["n_rg"] * nxt["th"] + 2 * nxt["pad"],
            )
        got = flat_block_apply_f(
            params, got, h, k, t, interpret=True,
            in_prepadded=i > 0, w_dim=w if i > 0 else None,
            out_pad=0 if last else out_pad,
            out_rows=None if last else out_rows,
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_upsample_smooth_nchw_matches_nhwc():
    """upsample_smooth_apply_nchw is the NCHW twin of the phase-folded
    upsample+smooth — identical math and rounding."""
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
        upsample_smooth_apply_nchw,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        upsample_smooth_apply,
    )

    rng = np.random.default_rng(3)
    c = 16
    blk = DepthWiseConv(c, c, stride=1, kernel_size=3, expand_ratio=1,
                        use_norm=False)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 20, c)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    ref = upsample_smooth_apply(params, x, dtype=jnp.float32)
    x4 = jnp.transpose(x, (0, 3, 1, 2))
    got4 = upsample_smooth_apply_nchw(params, x4, dtype=jnp.float32)
    got = jnp.transpose(got4, (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_decode_flat_matches_decode_fused():
    """Full flat-chain decoder vs the round-2 decode_fused, f32,
    interpret mode, at the smallest size whose tail is lane-aligned
    (z=16 -> 128px output: blocks 8-13 run through the flat kernel)."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.decoder import Decoder
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import decode_fused
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import decode_flat

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 0.5, (1, 16, 16, 128)), jnp.float32)
    dec = Decoder()
    dec_params = dec.init(jax.random.PRNGKey(0), z)["params"]
    ref = decode_fused(
        dec_params, z, cfg.decoder_conv_shapes, dtype=jnp.float32,
        min_fused_size=10**9,  # pure-XLA reference composition
    )
    got = decode_flat(
        dec_params, z, cfg.decoder_conv_shapes, dtype=jnp.float32,
        interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_encode_flat_matches_encode_fused():
    """Flat-chain encoder vs encode_fused, f32, interpret mode, at a
    lane-aligned input size (128px: block 1 runs through the flat
    kernel)."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.encoder import Encoder
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import encode_fused
    from arbitrarystyletransfer_tpu.ops.pallas.flatblock import encode_flat

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    enc = Encoder()
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    # Randomized running stats make BN folding non-trivial.
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
    )
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
        )


def test_stylize_fused_flat_engine_matches_flax():
    """Full engine with encoder_impl=decoder_impl='flat' vs the flax
    AST.stylize graph, f32, interpret mode, at a lane-aligned size."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.engine import stylize_fused
    from arbitrarystyletransfer_tpu.models.ast import AST

    cfg = ModelConfig(encoder_eval_stats=True)
    ast = AST(cfg)
    rng = np.random.default_rng(7)
    content = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    style = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    variables = ast.init(jax.random.PRNGKey(0), content, style, train=False)
    ref = ast.apply(variables, content, style, 1.0, method=AST.stylize)
    out = stylize_fused(
        variables, content, style, 1.0, cfg=cfg, interpret=True,
        dtype=jnp.float32, decoder_impl="flat", encoder_impl="flat",
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4
    )


def test_flat_form_matches_nhwc_wrapper():
    params, stats, x = _make(16, 16, 3, 6, 16, 128, False)
    ref = flat_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32
    )
    b, h, w, c = x.shape
    xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c, h * w)
    got_f = flat_block_apply_f(params, xf, h, 3, 6, stats=stats,
                               interpret=True)
    got = jnp.transpose(got_f.reshape(b, c, h, w), (0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
    )
