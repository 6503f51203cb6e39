"""Model-graph parity tests: shapes, taps, downsample factors, and the
AdaAttN math, pinned against the reference's architecture tables
(SURVEY.md §2.1-2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arbitrarystyletransfer_tpu.config import ModelConfig
from arbitrarystyletransfer_tpu.models import (
    AST,
    AdaAttN,
    AutoEncoder,
    Decoder,
    Discriminator,
    Encoder,
    MobileNetV2,
    VGG19Features,
    adaattn_statistics,
)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


class TestEncoder:
    def test_taps_shapes_and_downsample(self, key):
        # Taps 12 and 14 are both 128-channel at 1/8 resolution
        # (reference: conf.py:75-113, stride-2 at blocks 2, 4, 7).
        enc = Encoder()
        x = jnp.zeros((2, 96, 96, 3))
        variables = enc.init(key, x, out_layers=(12, 14), train=False)
        outs = enc.apply(variables, x, out_layers=(12, 14), train=False)
        assert len(outs) == 2
        assert outs[0].shape == (2, 12, 12, 128)
        assert outs[1].shape == (2, 12, 12, 128)

    def test_auto_enc_returns_final_map(self, key):
        enc = Encoder()
        x = jnp.zeros((1, 64, 64, 3))
        variables = enc.init(key, x, auto_enc=True, train=False)
        out = enc.apply(variables, x, auto_enc=True, train=False)
        assert out.shape == (1, 8, 8, 128)

    def test_has_15_blocks_with_batchnorm(self, key):
        enc = Encoder()
        x = jnp.zeros((1, 32, 32, 3))
        variables = enc.init(key, x, auto_enc=True, train=False)
        block_names = {k.split("_")[-1] for k in variables["params"] if "mob_net" in k}
        assert len(variables["params"]) == 15  # mob_net_0..mob_net_14
        assert "batch_stats" in variables  # encoder uses BatchNorm


class TestDecoder:
    def test_upsamples_x8_and_rgb_out(self, key):
        dec = Decoder()
        z = jnp.zeros((2, 12, 12, 128))
        variables = dec.init(key, z)
        out = dec.apply(variables, z)
        assert out.shape == (2, 96, 96, 3)
        # no BatchNorm anywhere in the decoder
        assert "batch_stats" not in variables

    def test_export_clamps(self, key):
        dec = Decoder()
        z = jax.random.normal(key, (1, 4, 4, 128)) * 10
        variables = dec.init(key, z)
        out = dec.apply(variables, z, exporting=True)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
        out_train = dec.apply(variables, z, exporting=False)
        # export output == Hardtanh(0,1) of the unclamped training output
        np.testing.assert_allclose(
            np.asarray(out), np.clip(np.asarray(out_train), 0.0, 1.0),
            rtol=1e-6, atol=1e-7,
        )


class TestDepthwiseLowering:
    @pytest.mark.parametrize("stride", [1, 2])
    @pytest.mark.parametrize("ksize", [3, 5])
    def test_shifts_matches_grouped_conv(self, key, stride, ksize):
        # The "shifts" lowering (strided-slice taps, pure VPU work XLA can
        # fuse) must be numerically identical to the grouped-conv lowering
        # for every (stride, kernel) the encoder/decoder instantiate
        # (reference depthwise conv: mobilenetv2.py:103-148).
        from arbitrarystyletransfer_tpu.ops.blocks import DepthwiseConv2D

        x = jax.random.normal(key, (2, 21, 21, 16), jnp.float32)
        conv = DepthwiseConv2D(16, ksize, stride, impl="conv")
        shifts = DepthwiseConv2D(16, ksize, stride, impl="shifts")
        variables = conv.init(key, x)
        a = conv.apply(variables, x)
        b = shifts.apply(variables, x)
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestReshape:
    def test_matches_torch_view_semantics(self, key):
        # The reference Reshape (mobilenetv2.py:83-93) is a raw row-major
        # NCHW view (B, 4C, H, W) -> (B, C, 2H, 2W) after a learned
        # pos-enc add — not a pixel shuffle.  Pin the exact element
        # mapping via numpy on the NCHW order.
        from arbitrarystyletransfer_tpu.ops.blocks import Reshape

        c, h, w = 3, 4, 6
        x = jax.random.normal(key, (2, h, w, 4 * c), jnp.float32)
        mod = Reshape(c)
        variables = mod.init(key, x)
        out = mod.apply(variables, x)
        assert out.shape == (2, 2 * h, 2 * w, c)

        pos = np.asarray(variables["params"]["pos_enc"])
        ref = (np.asarray(x) + pos).transpose(0, 3, 1, 2)  # NCHW
        ref = ref.reshape(2, c, 2 * h, 2 * w).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(np.asarray(out), ref)


class TestAdaAttN:
    def test_statistics_match_naive_softmax(self, key):
        b, nc, ns, c = 2, 9, 16, 8
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, nc, c))
        k = jax.random.normal(kk, (b, ns, c))
        v = jax.random.normal(kv, (b, ns, c))
        mean, std = adaattn_statistics(q, k, v)
        # naive reference
        attn = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2), axis=-1)
        ref_mean = attn @ v
        ref_ev2 = attn @ (v**2)
        ref_std = jnp.sqrt(jnp.maximum(ref_ev2 - ref_mean**2, 0.0))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(std), np.asarray(ref_std), rtol=1e-4, atol=1e-5)

    def test_module_output_shape_and_identity_style(self, key):
        mod = AdaAttN(16)
        c = jax.random.normal(key, (1, 6, 6, 16))
        variables = mod.init(key, c, c)
        out = mod.apply(variables, c, c)
        assert out.shape == c.shape

    def test_different_style_resolution(self, key):
        # Style map may have different spatial dims than content.
        mod = AdaAttN(8)
        c = jax.random.normal(key, (1, 4, 4, 8))
        s = jax.random.normal(jax.random.fold_in(key, 1), (1, 6, 5, 8))
        variables = mod.init(key, c, s)
        out = mod.apply(variables, c, s)
        assert out.shape == c.shape


class TestAutoEncoder:
    def test_reconstruction_shape(self, key):
        ae = AutoEncoder()
        x = jnp.zeros((2, 96, 96, 3))
        variables = ae.init(key, x, train=False)
        out = ae.apply(variables, x, train=False)
        assert out.shape == x.shape

    def test_latent_roundtrip(self, key):
        ae = AutoEncoder()
        x = jnp.zeros((1, 64, 64, 3))
        variables = ae.init(key, x, train=False)
        z = ae.apply(variables, x, train=False, method=AutoEncoder.encode_latent)
        assert z.shape == (1, 8, 8, 128)
        out = ae.apply(variables, z, method=AutoEncoder.decode_latent)
        assert out.shape == x.shape


class TestAST:
    @pytest.fixture(scope="class")
    def ast_and_vars(self, key):
        ast = AST()
        c = jnp.zeros((2, 96, 96, 3))
        s = jnp.zeros((2, 96, 96, 3))
        variables = ast.init(key, c, s, train=False)
        return ast, variables

    def test_training_forward_structure(self, ast_and_vars):
        ast, variables = ast_and_vars
        c = jnp.full((2, 96, 96, 3), 0.4)
        s = jnp.full((2, 96, 96, 3), 0.6)
        (t_cs, (sm1, sm2), org_out), mutated = ast.apply(
            variables, c, s, 1.0, train=True, mutable=["batch_stats"]
        )
        assert t_cs.shape == (2, 96, 96, 3)
        assert sm1.shape == (2, 12, 12, 128)
        assert sm2.shape == (2, 12, 12, 128)
        assert org_out.shape == (2, 96, 96, 3)
        assert "batch_stats" in mutated

    def test_alpha_zero_equals_identity_path(self, ast_and_vars):
        # alpha=0 decodes the pure content identity feature: t_cs == org_out.
        ast, variables = ast_and_vars
        c = jnp.full((1, 96, 96, 3), 0.3)
        s = jnp.full((1, 96, 96, 3), 0.9)
        (t_cs, _, org_out), _ = ast.apply(
            variables, c, s, 0.0, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(t_cs), np.asarray(org_out), rtol=1e-4, atol=1e-5
        )

    def test_export_clamped(self, ast_and_vars):
        ast, variables = ast_and_vars
        c = jnp.full((1, 96, 96, 3), 0.4)
        s = jnp.full((1, 96, 96, 3), 0.6)
        out = ast.apply(variables, c, s, method=AST.export)
        assert out.shape == (1, 96, 96, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_rectangular_and_mixed_resolutions(self, ast_and_vars):
        # Multi-resolution training: content/style at different rectangular
        # sizes from the {96,128,160} bucket grid (conf.py:4).
        ast, variables = ast_and_vars
        c = jnp.full((1, 96, 128, 3), 0.4)
        s = jnp.full((1, 160, 96, 3), 0.6)
        out = ast.apply(variables, c, s, method=AST.stylize)
        assert out.shape == (1, 96, 128, 3)


class TestVGG:
    def test_tap_widths_and_resolutions(self, key):
        vgg = VGG19Features()
        x = jnp.zeros((1, 96, 96, 3))
        variables = vgg.init(key, x)
        taps = vgg.apply(variables, x)
        widths = [t.shape[-1] for t in taps]
        assert widths == [64, 128, 256, 512, 512, 512]
        hs = [t.shape[1] for t in taps]
        assert hs == [96, 48, 24, 12, 6, 6]

    def test_early_exit_truncates_params(self, key):
        # Params only exist up to conv_15 (early exit at relu_15).
        vgg = VGG19Features()
        variables = vgg.init(key, jnp.zeros((1, 32, 32, 3)))
        convs = sorted(variables["params"].keys())
        assert "conv_16" not in convs
        assert "conv_15" in convs


class TestMobileNetV2:
    def test_classifier_logits(self, key):
        net = MobileNetV2(num_classes=10)
        x = jnp.zeros((1, 96, 96, 3))
        variables = net.init(key, x, method=MobileNetV2.predict_class, train=False)
        logits = net.apply(
            variables, x, train=False, method=MobileNetV2.predict_class
        )
        assert logits.shape == (1, 10)

    def test_feature_taps(self, key):
        net = MobileNetV2()
        x = jnp.zeros((1, 64, 64, 3))
        variables = net.init(key, x, method=MobileNetV2.predict_class, train=False)
        outs = net.apply(variables, x, out_layers=(0, 2), train=False)
        assert len(outs) == 2

    def test_discriminator_sigmoid_range(self, key):
        disc = Discriminator()
        x = jnp.zeros((2, 96, 96, 3))
        variables = disc.init(key, x, train=False)
        p = disc.apply(variables, x, train=False)
        assert p.shape == (2, 1)
        assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0
