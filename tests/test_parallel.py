"""Sharding/mesh tests on the virtual 8-device CPU mesh, plus the driver
entry points (__graft_entry__)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arbitrarystyletransfer_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
)


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_batch_is_sharded_over_data_axis(self):
        mesh = create_mesh()
        batch = np.zeros((16, 8, 8, 3), np.float32)
        sharded = shard_batch(mesh, batch)
        assert sharded.sharding.is_equivalent_to(
            batch_sharding(mesh), ndim=sharded.ndim
        )
        # Each device holds 16/8 = 2 examples.
        shard_shapes = {s.data.shape for s in sharded.addressable_shards}
        assert shard_shapes == {(2, 8, 8, 3)}

    def test_replicated_params(self):
        mesh = create_mesh()
        tree = {"w": np.ones((4, 4), np.float32)}
        rep = replicate(mesh, tree)
        assert len(rep["w"].addressable_shards) == 8
        shard_shapes = {s.data.shape for s in rep["w"].addressable_shards}
        assert shard_shapes == {(4, 4)}

    def test_jit_inserts_allreduce_semantics(self):
        # A sharded-in, replicated-out reduction must see all shards.
        mesh = create_mesh()
        x = shard_batch(mesh, np.arange(8, dtype=np.float32).reshape(8, 1))

        @jax.jit
        def total(x):
            return jnp.sum(x)

        assert float(total(x)) == float(np.arange(8).sum())


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == args[0].shape
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)
