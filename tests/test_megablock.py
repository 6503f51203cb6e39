"""Parity tests for the persistent-VMEM megakernel (ops/pallas/megablock).

The megakernel must reproduce ``fused_block.xla_block_apply`` — the
torch-golden-tested functional composition of a DepthWiseConv block
(reference mobilenetv2.py:95-181) with folded-BN inference semantics —
for every decoder/encoder block shape it dispatches on.

Methodology mirrors tests/test_fused_block.py: interpret mode on CPU,
f32 for tight parity (the kernel's rounding schedule matches the XLA
composition exactly in f32; in bf16 the kernel keeps the depthwise in
f32 where XLA's grouped conv rounds to bf16, so bf16 is compared at
ULP-scale tolerance).
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
from arbitrarystyletransfer_tpu.ops.pallas.megablock import (
    mega_block_apply,
    mega_block_apply_t,
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
        # Randomized running stats make BN folding non-trivial.
        stats = jax.tree.map(
            lambda a: a + jnp.asarray(
                rng.uniform(0.1, 0.5, a.shape), a.dtype
            ),
            variables["batch_stats"],
        )
    return params, stats, x


CASES = [
    # (c_in, c_out, k, t, H, W, use_norm) — decoder-tail + encoder shapes
    # at test-sized H (the kernel's row-group logic only depends on
    # H mod row_group; W must be a multiple of 128).
    (16, 16, 3, 6, 24, 128, False),   # identity path
    (40, 24, 5, 6, 24, 128, False),   # k5, c_out != c_in
    (24, 24, 3, 1, 33, 128, False),   # expand==1, odd H (tail masking)
    (40, 40, 5, 4, 24, 256, True),    # folded BN, W=256
    (16, 8, 3, 6, 16, 128, True),     # c_out not a multiple of 16
    (8, 16, 3, 3, 9, 128, True),      # H < row_group minimum
]


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c[0]}-{c[1]}k{c[2]}t{c[3]}_{c[4]}x{c[5]}{'n' if c[6]else ''}")
def test_mega_block_matches_xla_f32(case):
    c_in, c_out, k, t, h, w, use_norm = case
    params, stats, x = _make(c_in, c_out, k, t, h, w, use_norm)
    ref = xla_block_apply(params, x, k, 1, t, stats=stats, dtype=jnp.float32)
    got = mega_block_apply(
        params, x, k, t, stats=stats, interpret=True, dtype=jnp.float32
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_mega_block_bf16_ulp_parity():
    """bf16 I/O: the kernel is allowed to differ from the XLA composition
    only by bf16 rounding (it keeps the depthwise accumulation in f32)."""
    params, stats, x = _make(40, 40, 5, 4, 24, 128, True)
    ref = xla_block_apply(
        params, x.astype(jnp.bfloat16), 5, 1, 4, stats=stats
    ).astype(jnp.float32)
    got = mega_block_apply(
        params, x, 5, 4, stats=stats, interpret=True
    ).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=0.02 * scale, rtol=0.03
    )


def test_mega_block_transposed_form():
    """The _t form consumes/produces (B, H, C, W) directly."""
    params, stats, x = _make(16, 16, 3, 6, 16, 128, False)
    ref = mega_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32
    )
    xt = jnp.transpose(x, (0, 1, 3, 2))
    got_t = mega_block_apply_t(params, xt, 3, 6, stats=stats, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got_t, (0, 1, 3, 2))),
        np.asarray(ref),
        rtol=1e-6,
        atol=1e-6,
    )


def test_mega_block_forced_hbm_hidden():
    """row_group small enough that the hidden cannot be VMEM-resident in
    the budget model exercises the HBM round-trip path; the result must
    be identical."""
    params, stats, x = _make(24, 24, 3, 6, 32, 128, True)
    a = mega_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
    )
    b = mega_block_apply(
        params, x, 3, 6, stats=stats, interpret=True, dtype=jnp.float32,
        row_group=8, force_resident=False,
    )
    ref = xla_block_apply(params, x, 3, 1, 6, stats=stats, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_upsample_smooth_transposed_matches_nhwc():
    """upsample_smooth_apply_t is the transposed twin of the NHWC
    phase-folded upsample+smooth — identical math and rounding."""
    from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
        upsample_smooth_apply,
    )
    from arbitrarystyletransfer_tpu.ops.pallas.megablock import (
        upsample_smooth_apply_t,
    )

    rng = np.random.default_rng(3)
    c = 16
    blk = DepthWiseConv(c, c, stride=1, kernel_size=3, expand_ratio=1,
                        use_norm=False)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 20, c)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)["params"]
    ref = upsample_smooth_apply(params, x, dtype=jnp.float32)
    xt = jnp.transpose(x, (0, 1, 3, 2))
    got_t = upsample_smooth_apply_t(params, xt, dtype=jnp.float32)
    got = jnp.transpose(got_t, (0, 1, 3, 2))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_decode_mega_matches_decode_fused():
    """Full transposed-chain decoder vs the round-2 decode_fused, f32,
    interpret mode, at the smallest size whose tail is lane-aligned
    (z=16 -> 128px output: blocks 8-13 run through the megakernel)."""
    from arbitrarystyletransfer_tpu.config import ModelConfig
    from arbitrarystyletransfer_tpu.models.decoder import Decoder
    from arbitrarystyletransfer_tpu.ops.pallas.fused_block import decode_fused
    from arbitrarystyletransfer_tpu.ops.pallas.megablock import decode_mega

    cfg = ModelConfig()
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(0, 0.5, (1, 16, 16, 128)), jnp.float32)
    dec = Decoder()
    dec_params = dec.init(jax.random.PRNGKey(0), z)["params"]
    ref = decode_fused(
        dec_params, z, cfg.decoder_conv_shapes, dtype=jnp.float32,
        min_fused_size=10**9,  # pure-XLA reference composition
    )
    got = decode_mega(
        dec_params, z, cfg.decoder_conv_shapes, dtype=jnp.float32,
        interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
