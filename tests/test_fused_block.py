"""Fused decoder runtime parity tests (Pallas interpret mode on CPU).

The fused inverted-residual kernel + functional decoder must be bit-exact
against the flax Decoder graph when run at f32 (see
ops/pallas/fused_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arbitrarystyletransfer_tpu.config import ModelConfig
from arbitrarystyletransfer_tpu.models import Decoder
from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv
from arbitrarystyletransfer_tpu.ops.pallas.fused_block import (
    decode_fused,
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
        np.testing.assert_allclose(
            np.asarray(hidden), np.asarray(ref), rtol=2e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sums), np.asarray(ref.sum(axis=(1, 2))), rtol=1e-4, atol=1e-3
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


class TestFusedDecoder:
    def test_bit_exact_vs_flax(self):
        dec = Decoder()
        z = jnp.asarray(
            np.random.default_rng(0).normal(0, 0.5, (2, 8, 8, 128)), jnp.float32
        )
        variables = dec.init(jax.random.PRNGKey(0), z)
        ref = dec.apply(variables, z, exporting=True)
        out = decode_fused(
            variables["params"], z, ModelConfig().decoder_conv_shapes,
            exporting=True, interpret=True, dtype=jnp.float32,
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
