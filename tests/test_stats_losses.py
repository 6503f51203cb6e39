"""Golden-value tests for stat primitives and losses against torch (CPU).

The reference's numerics are pinned by running the same math in torch
(available CPU-only in this image) on identical random inputs — a
reconstruction of the reference formulas, not an import of its code.
Covers SURVEY.md §2.3 and the stat-flavor subtleties in §7 "hard parts".
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from arbitrarystyletransfer_tpu import losses
from arbitrarystyletransfer_tpu.ops import stats


def _rand_nhwc(rng, shape):
    return rng.standard_normal(shape).astype(np.float32)


class TestChannelStats:
    def test_matches_torch_unbiased_std(self, rng):
        x = _rand_nhwc(rng, (2, 7, 5, 3))
        mean, std = stats.channel_stats(jnp.asarray(x))
        t = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
        t_mean = t.mean(dim=(2, 3), keepdim=True)
        t_std = t.std(dim=(2, 3), keepdim=True)  # unbiased
        np.testing.assert_allclose(
            np.asarray(mean)[:, 0, 0, :], t_mean.numpy()[:, :, 0, 0],
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(std)[:, 0, 0, :], t_std.numpy()[:, :, 0, 0],
            rtol=1e-5, atol=1e-6,
        )

    def test_calc_mean_std_eps_placement(self, rng):
        # eps is added to the *variance* before sqrt (reference models.py:59).
        x = _rand_nhwc(rng, (2, 4, 4, 8))
        _, std = stats.calc_mean_std(jnp.asarray(x), eps=1e-5)
        t = torch.tensor(x).permute(0, 3, 1, 2)
        var = t.reshape(2, 8, -1).var(dim=2) + 1e-5
        np.testing.assert_allclose(
            np.asarray(std)[:, 0, 0, :], var.sqrt().numpy(), rtol=1e-5
        )

    def test_mean_variance_norm(self, rng):
        x = _rand_nhwc(rng, (2, 6, 6, 4))
        out = stats.mean_variance_norm(jnp.asarray(x))
        m = np.asarray(out).mean(axis=(1, 2))
        np.testing.assert_allclose(m, np.zeros_like(m), atol=1e-5)

    def test_instance_norm_matches_torch(self, rng):
        x = _rand_nhwc(rng, (2, 5, 5, 6))
        out = stats.instance_norm(jnp.asarray(x))
        t = torch.tensor(x).permute(0, 3, 1, 2)
        ref = torch.nn.InstanceNorm2d(6)(t).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


class TestLosses:
    def test_huber_matches_torch(self, rng):
        a = _rand_nhwc(rng, (2, 4, 4, 3)) * 3
        b = _rand_nhwc(rng, (2, 4, 4, 3)) * 3
        ours = losses.huber_loss(jnp.asarray(a), jnp.asarray(b))
        ref = F.huber_loss(torch.tensor(a), torch.tensor(b)).item()
        assert abs(float(ours) - ref) < 1e-6

    def test_gram_matches_torch(self, rng):
        x = _rand_nhwc(rng, (2, 5, 7, 4))
        ours = np.asarray(losses.gram_matrix(jnp.asarray(x)))
        t = torch.tensor(x).permute(0, 3, 1, 2)  # (B,C,H,W)
        B, C, H, W = t.shape
        flat = t.reshape(B, C, H * W)
        ref = torch.bmm(flat, flat.transpose(1, 2)) / (C * H * W)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_style_loss_matches_torch_formula(self, rng):
        x = _rand_nhwc(rng, (2, 6, 6, 4))
        y = _rand_nhwc(rng, (2, 6, 6, 4))
        ours = float(losses.compute_style_loss(jnp.asarray(x), jnp.asarray(y)))

        tx = torch.tensor(x).permute(0, 3, 1, 2)
        ty = torch.tensor(y).permute(0, 3, 1, 2)

        def ch_stats(t):
            return t.mean(dim=(2, 3), keepdim=True), t.std(dim=(2, 3), keepdim=True)

        def gram(t):
            B, C, H, W = t.shape
            f = t.reshape(B, C, H * W)
            return torch.bmm(f, f.transpose(1, 2)) / (C * H * W)

        mx, sx = ch_stats(tx)
        my, sy = ch_stats(ty)
        ref = (
            F.huber_loss(mx, my) * 1.25
            + F.huber_loss(sx, sy) * 1.25
            + F.huber_loss(gram(tx), gram(ty)) * 10
        ).item()
        assert abs(ours - ref) < 1e-5

    def test_tv_loss_matches_torch_sum(self, rng):
        x = _rand_nhwc(rng, (2, 8, 8, 3))
        ours = float(losses.tv_loss(jnp.asarray(x)))
        t = torch.tensor(x).permute(0, 3, 1, 2)
        w = torch.sum((t[:, :, :, :-1] - t[:, :, :, 1:]) ** 2)
        h = torch.sum((t[:, :, :-1, :] - t[:, :, 1:, :]) ** 2)
        ref = (h + w).item()
        assert abs(ours - ref) < 1e-5 * max(1.0, abs(ref))

    def test_soft_histogram_sums_to_one(self, rng):
        x = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        hist = np.asarray(losses.soft_histogram(jnp.asarray(x)))
        assert hist.shape == (2, 256)
        # sigmoid-bump kernel sums to ~1 with correct normalization
        np.testing.assert_allclose(hist.sum(axis=1), [1.0, 1.0], atol=0.05)

    def test_emd_zero_for_identical(self, rng):
        x = rng.uniform(0, 1, (2, 6, 6, 3)).astype(np.float32)
        h = losses.soft_histogram(jnp.asarray(x))
        emd = np.asarray(losses.earth_movers_distance(h, h))
        np.testing.assert_allclose(emd, np.zeros(2), atol=1e-10)

    def test_emd_matches_torch_triangular_matmul(self, rng):
        hx = rng.uniform(0, 1, (2, 16)).astype(np.float32)
        hy = rng.uniform(0, 1, (2, 16)).astype(np.float32)
        ours = np.asarray(
            losses.earth_movers_distance(jnp.asarray(hx), jnp.asarray(hy))
        )
        r = torch.arange(16)
        s, t = torch.meshgrid(r, r, indexing="ij")
        tt = (t >= s).float()
        cdf_x = torch.tensor(hx) @ tt
        cdf_y = torch.tensor(hy) @ tt
        ref = torch.sum((cdf_x - cdf_y) ** 2, dim=1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_hist_loss_positive(self, rng):
        x = rng.uniform(0, 0.5, (2, 8, 8, 3)).astype(np.float32)
        y = rng.uniform(0.5, 1.0, (2, 8, 8, 3)).astype(np.float32)
        val = float(losses.compute_hist_loss(jnp.asarray(x), jnp.asarray(y)))
        assert val > 0

    def test_discriminator_loss_matches_torch_bce(self, rng):
        p = rng.uniform(0.01, 0.99, (4, 1)).astype(np.float32)
        lbl = np.array([[1.0], [0.0], [0.8], [0.0]], dtype=np.float32)
        ours = float(losses.discriminator_loss(jnp.asarray(p), jnp.asarray(lbl)))
        ref = F.binary_cross_entropy(torch.tensor(p), torch.tensor(lbl)).item()
        assert abs(ours - ref) < 1e-5


class TestColor:
    def test_rgb_lab_roundtrip(self, rng):
        from arbitrarystyletransfer_tpu.ops import color

        x = rng.uniform(0.05, 0.95, (1, 8, 8, 3)).astype(np.float32)
        lab = color.rgb2lab(jnp.asarray(x))
        back = np.asarray(color.lab2rgb(lab))
        np.testing.assert_allclose(back, x, atol=5e-3)

    def test_rgb2lab_matches_skimage_range(self, rng):
        from arbitrarystyletransfer_tpu.ops import color

        # white -> L=100 -> rescaled (100/100+1)/2 = 1.0 on the L channel
        white = jnp.ones((1, 2, 2, 3))
        lab = np.asarray(color.rgb2lab(white))
        np.testing.assert_allclose(lab[..., 0], 1.0, atol=1e-3)
