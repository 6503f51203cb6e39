"""BatchNorm2D semantics tests: torch parity of train-mode normalization and
running-stat updates, plus the decoupled stat-source controls
(see ops/norm.py and ModelConfig.encoder_eval_stats)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from arbitrarystyletransfer_tpu.ops.norm import BatchNorm2D


def _apply(bn, variables, x, use_batch_stats, update_stats):
    if update_stats:
        return bn.apply(
            variables, x, use_batch_stats=use_batch_stats,
            update_stats=True, mutable=["batch_stats"],
        )
    return (
        bn.apply(variables, x, use_batch_stats=use_batch_stats, update_stats=False),
        variables,
    )


class TestBatchNorm2D:
    def setup_method(self):
        self.bn = BatchNorm2D()
        self.x = np.random.default_rng(0).normal(
            1.5, 2.0, (4, 6, 6, 5)
        ).astype(np.float32)
        self.variables = self.bn.init(
            jax.random.PRNGKey(0), jnp.asarray(self.x),
            use_batch_stats=True, update_stats=False,
        )

    def _torch_bn(self):
        t = torch.nn.BatchNorm2d(5, eps=1e-5, momentum=0.1)
        t.weight.data.fill_(1.0)
        t.bias.data.zero_()
        return t

    def test_train_mode_matches_torch(self):
        out, mut = _apply(self.bn, self.variables, jnp.asarray(self.x), True, True)
        t = self._torch_bn().train()
        ref = t(torch.tensor(self.x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(0, 2, 3, 1).detach().numpy(),
            rtol=1e-4, atol=1e-5,
        )
        # Running stats updated with the UNBIASED batch var (torch semantics).
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            t.running_mean.numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            t.running_var.numpy(), rtol=1e-5, atol=1e-6,
        )

    def test_eval_mode_matches_torch(self):
        # Feed one train batch through both, then compare eval outputs.
        _, mut = _apply(self.bn, self.variables, jnp.asarray(self.x), True, True)
        variables = {
            "params": self.variables["params"],
            "batch_stats": mut["batch_stats"],
        }
        t = self._torch_bn().train()
        t(torch.tensor(self.x).permute(0, 3, 1, 2))
        t.eval()
        x2 = np.random.default_rng(1).normal(0, 1, (2, 6, 6, 5)).astype(np.float32)
        out, _ = _apply(self.bn, variables, jnp.asarray(x2), False, False)
        ref = t(torch.tensor(x2).permute(0, 3, 1, 2))
        np.testing.assert_allclose(
            np.asarray(out), ref.permute(0, 2, 3, 1).detach().numpy(),
            rtol=1e-4, atol=1e-5,
        )

    def test_batch_stats_without_update(self):
        # use_batch_stats=True + update_stats=False: normalizes by the batch
        # but leaves running stats untouched (and needs no mutable).
        out, _ = _apply(self.bn, self.variables, jnp.asarray(self.x), True, False)
        m = np.asarray(out).mean(axis=(0, 1, 2))
        np.testing.assert_allclose(m, np.zeros(5), atol=1e-5)

    def test_dead_channel_eval_amplification_avoided(self):
        # A dead (constant) channel collapses running var toward 0; eval-mode
        # normalization then amplifies by ~1/sqrt(eps).  Batch-stat mode must
        # stay tame on the same input.
        variables = {
            "params": self.variables["params"],
            "batch_stats": {
                "mean": jnp.zeros(5),
                "var": jnp.full((5,), 1e-20),  # collapsed
            },
        }
        x = jnp.asarray(np.random.default_rng(2).normal(0, 1, (2, 6, 6, 5)).astype(np.float32))
        out_eval, _ = _apply(self.bn, variables, x, False, False)
        out_batch, _ = _apply(self.bn, variables, x, True, False)
        assert float(jnp.abs(out_eval).max()) > 100  # the hazard is real
        assert float(jnp.abs(out_batch).max()) < 10  # robust mode avoids it
