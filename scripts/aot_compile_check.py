#!/usr/bin/env python
"""AOT-compile a Pallas block kernel for v5e WITHOUT hardware.

Uses the local libtpu compiler through a compile-only PJRT topology
(jax.experimental.topologies) — no TPU attachment, no remote-compile
tunnel.  This catches Mosaic compile regressions (VMEM overflows,
ApplyVectorLayoutPass crashes) that interpret-mode tests cannot see:
the ragged-chunk SIGABRT and the k5 VMEM overflow were both invisible
on CPU and cost a real-chip round trip each to find.

Run as a subprocess (a Mosaic crash SIGABRTs the process):
    python scripts/aot_compile_check.py flat 40 40 5 4 512 8

Exit code 0 + "COMPILED OK" on success.
"""

import os
import sys
import time

# The axon sitecustomize registers the tunnel backend at interpreter
# start; these must be cleared in the PARENT environment for a truly
# local run (the test harness does).  Cleared here too for direct use
# before any jax import in case sitecustomize was skipped.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = ""

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main(argv):
    impl = argv[0]
    c_in, c_out, k, t, size, batch = (int(x) for x in argv[1:7])

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices[:1]), ("d",))
    rep = NamedSharding(mesh, P())

    from arbitrarystyletransfer_tpu.ops.blocks import DepthWiseConv

    if impl == "flat":
        from arbitrarystyletransfer_tpu.ops.pallas.flatblock import (
            flat_block_apply as apply_fn,
        )
    elif impl == "mega":
        from arbitrarystyletransfer_tpu.ops.pallas.megablock import (
            mega_block_apply as apply_fn,
        )
    else:
        raise SystemExit(f"unknown impl {impl!r}")

    blk = DepthWiseConv(c_in, c_out, stride=1, kernel_size=k,
                        expand_ratio=t, use_norm=False)
    x_init = jnp.zeros((2, 32, 128, c_in), jnp.float32)
    params = jax.jit(blk.init, backend="cpu")(
        jax.random.PRNGKey(0), x_init
    )["params"]

    xs = jax.ShapeDtypeStruct((batch, size, size, c_in), jnp.bfloat16)
    ps = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                      params)
    fn = jax.jit(
        lambda p, v: apply_fn(p, v, k, t),
        in_shardings=(jax.tree.map(lambda _: rep, ps), rep),
        out_shardings=rep,
    )
    t0 = time.time()
    lowered = fn.trace(ps, xs).lower()
    lowered.compile()
    print(f"COMPILED OK in {time.time() - t0:.1f}s  "
          f"[{impl} {c_in}->{c_out} k{k} t{t} @{size} b{batch}]",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
