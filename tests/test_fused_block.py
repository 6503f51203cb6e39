"""Fused inference-engine parity tests (Pallas interpret mode on CPU).

The fused inverted-residual kernel + functional decoder must be bit-exact
against the flax Decoder graph when run at f32; the BN-folded encoder and
the full fused stylize engine must match the flax graph under the
running-stats inference semantics (``encoder_eval_stats=True``, the
reference's enc.eval() dance, models.py:539-547).  See
ops/pallas/fused_block.py and engine.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Interpret-mode Pallas kernel parity is minutes-scale on a CPU host; the
# fast CI subset (-m "not slow") excludes these suites (VERDICT r4 item 2).
pytestmark = pytest.mark.slow

from arbitrarystyletransfer_tpu.config import ModelConfig
from arbitrarystyletransfer_tpu.engine import stylize_fused
from arbitrarystyletransfer_tpu.models import AST, Decoder, Encoder
from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
    decode_fused,
    encode_fused,
    fused_block_apply,
    fused_expand_dw,
)


class TestFusedExpandDw:
    @pytest.mark.parametrize("k,c_in,t", [(3, 16, 6), (5, 40, 4), (3, 128, 3)])
    def test_matches_manual_composition(self, k, c_in, t):
        rng = np.random.default_rng(0)
        c_hid = c_in * t
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, c_in)), jnp.float32)
        we = jnp.asarray(rng.normal(0, 0.1, (c_in, c_hid)), jnp.float32)
        wd = jnp.asarray(rng.normal(0, 0.1, (k, k, c_hid)), jnp.float32)

        def hswish(v):
            return v * jnp.clip(v + 3, 0, 6) / 6

        h_ref = hswish(jnp.einsum("bhwc,cd->bhwd", x, we))
        p = (k - 1) // 2
        hp = jnp.pad(h_ref, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        dw_ref = jax.lax.conv_general_dilated(
            hp, wd[:, :, None, :].transpose(0, 1, 2, 3).reshape(k, k, 1, c_hid),
            (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c_hid,
        )
        ref = hswish(dw_ref)

        hidden, sums = fused_expand_dw(x, we, wd, k, pre_act=True, interpret=True)
        # Channels may be zero-padded out to the 128-lane chunk grid; the
        # padded tail must be exactly zero (the epilogue relies on it).
        np.testing.assert_allclose(
            np.asarray(hidden[..., :c_hid]), np.asarray(ref),
            rtol=2e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(hidden[..., c_hid:]),
            np.zeros_like(np.asarray(hidden[..., c_hid:])),
        )
        np.testing.assert_allclose(
            np.asarray(sums[:, :c_hid]), np.asarray(ref.sum(axis=(1, 2))),
            rtol=1e-4, atol=1e-3,
        )


class TestFusedBlock:
    @pytest.mark.parametrize("c_in,c_out,k,t", [(40, 40, 5, 4), (24, 16, 3, 6), (96, 96, 3, 1)])
    def test_matches_flax_block(self, c_in, c_out, k, t):
        block = DepthWiseConv(c_in, c_out, 1, t, kernel_size=k, use_norm=False)
        x = jnp.asarray(
            np.random.default_rng(1).normal(0, 1, (2, 16, 16, c_in)), jnp.float32
        )
        variables = block.init(jax.random.PRNGKey(0), x, train=False)
        ref = block.apply(variables, x, train=False)
        out = fused_block_apply(
            variables["params"], x, k, t, interpret=True, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
        )


class TestFusedBlock2Pass:
    @pytest.mark.parametrize("c_in,c_out,k,t", [(40, 40, 5, 4), (24, 16, 3, 6)])
    def test_matches_flax_block(self, c_in, c_out, k, t):
        from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
            fused_block_apply_2pass,
        )

        block = DepthWiseConv(c_in, c_out, 1, t, kernel_size=k, use_norm=False)
        x = jnp.asarray(
            np.random.default_rng(5).normal(0, 1, (2, 16, 16, c_in)), jnp.float32
        )
        variables = block.init(jax.random.PRNGKey(0), x, train=False)
        ref = block.apply(variables, x, train=False)
        out = fused_block_apply_2pass(
            variables["params"], x, k, t, interpret=True, dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5
        )


class TestFusedEncoder:
    @pytest.mark.parametrize("min_fused_size", [0, 128])
    def test_matches_flax_eval_stats(self, min_fused_size):
        # BN folded from non-trivial running stats must reproduce the flax
        # encoder's running-average normalization (use_batch_stats=False).
        cfg = ModelConfig(encoder_eval_stats=True)
        enc = Encoder(cfg)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
        variables = enc.init(
            jax.random.PRNGKey(0), x, out_layers=(12, 14), train=False
        )
        # Perturb running stats away from the (0, 1) init so folding is
        # actually exercised.
        stats = jax.tree.map(
            lambda a: a + 0.05 * np.random.default_rng(4).uniform(
                0.0, 1.0, a.shape
            ).astype(np.float32),
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": stats}
        ref = enc.apply(
            variables, x, out_layers=(12, 14), train=False,
            use_batch_stats=False,
        )
        # min_fused_size=0 forces every block through the Pallas kernel;
        # 128 exercises the measured dispatch policy (all-XLA at 32px).
        outs = encode_fused(
            variables["params"], variables["batch_stats"], x,
            cfg.enc_conv_shapes, (12, 14), expand_ratio=cfg.expand_ratio,
            interpret=True, dtype=jnp.float32,
            min_fused_size=min_fused_size,
        )
        assert len(outs) == 2
        for o, r in zip(outs, ref):
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(r), rtol=1e-4, atol=1e-4
            )


class TestFusedStylize:
    def test_odd_size_matches_flax(self):
        # Non-multiple-of-8 sizes exercise the kernel's row/col masking
        # and padded-grid slicing in full composition (30 -> 15 -> 8 -> 4
        # through the encoder strides).
        cfg = ModelConfig(encoder_eval_stats=True)
        ast = AST(cfg)
        rng = np.random.default_rng(3)
        c = jnp.asarray(rng.uniform(0, 1, (1, 30, 30, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(0, 1, (1, 30, 30, 3)), jnp.float32)
        variables = ast.init(jax.random.PRNGKey(0), c, s, train=False)
        ref = ast.apply(variables, c, s, 1.0, method=AST.stylize)
        out = stylize_fused(
            variables, c, s, 1.0, cfg=cfg, interpret=True,
            dtype=jnp.float32, min_fused_size=0,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4
        )

    @pytest.mark.parametrize("min_fused_size", [0, 128])
    def test_matches_flax_stylize(self, min_fused_size):
        cfg = ModelConfig(encoder_eval_stats=True)
        ast = AST(cfg)
        rng = np.random.default_rng(7)
        content = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
        style = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
        variables = ast.init(
            jax.random.PRNGKey(0), content, style, train=False
        )
        for alpha in (1.0, 0.5):
            ref = ast.apply(
                variables, content, style, alpha, method=AST.stylize
            )
            out = stylize_fused(
                variables, content, style, alpha, cfg=cfg,
                interpret=True, dtype=jnp.float32,
                min_fused_size=min_fused_size,
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-4, atol=2e-4
            )


class TestFusedDecoder:
    @pytest.mark.parametrize("min_fused_size", [0, 128])
    def test_bit_exact_vs_flax(self, min_fused_size):
        # 0: every block through the Pallas kernel; 128: the measured
        # dispatch policy (all-XLA at these tiny sizes).  Both must be
        # bit-exact against the flax graph at f32.
        dec = Decoder()
        z = jnp.asarray(
            np.random.default_rng(0).normal(0, 0.5, (2, 8, 8, 128)), jnp.float32
        )
        variables = dec.init(jax.random.PRNGKey(0), z)
        ref = dec.apply(variables, z, exporting=True)
        out = decode_fused(
            variables["params"], z, ModelConfig().decoder_conv_shapes,
            exporting=True, interpret=True, dtype=jnp.float32,
            min_fused_size=min_fused_size, fold_upsample=False,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

    def test_folded_upsample_close(self):
        # The phase-folded upsample+smooth pre-sums weights per phase —
        # same math as nearest_upsample_2x + the flax block, different f32
        # rounding, so allclose instead of bit-exact.
        dec = Decoder()
        z = jnp.asarray(
            np.random.default_rng(1).normal(0, 0.5, (2, 8, 8, 128)), jnp.float32
        )
        variables = dec.init(jax.random.PRNGKey(0), z)
        ref = dec.apply(variables, z, exporting=True)
        out = decode_fused(
            variables["params"], z, ModelConfig().decoder_conv_shapes,
            exporting=True, interpret=True, dtype=jnp.float32,
            fold_upsample=True,
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5
        )


class TestUpsampleSmooth:
    def test_matches_upsample_plus_flax_block(self):
        from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
            nearest_upsample_2x,
            upsample_smooth_apply,
        )

        c = 40
        block = DepthWiseConv(c, c, 1, 1, kernel_size=3, use_norm=False)
        # Odd content + edges exercised via a small spatial size.
        x = jnp.asarray(
            np.random.default_rng(2).normal(0, 1, (2, 7, 9, c)), jnp.float32
        )
        up = nearest_upsample_2x(x)
        variables = block.init(jax.random.PRNGKey(0), up, train=False)
        ref = block.apply(variables, up, train=False)
        out = upsample_smooth_apply(variables["params"], x, dtype=jnp.float32)
        # Weight pre-summing changes f32 rounding; the SE gate and the
        # hswish amplify the ~1e-7 per-op differences to ~1e-4 absolute.
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-3, atol=2e-4
        )
