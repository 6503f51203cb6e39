"""Test configuration: run everything on a virtual 8-device CPU mesh.

The standard JAX substitute for a fake distributed backend (SURVEY.md §4):
force the CPU platform with 8 virtual devices so sharding/collective code
paths execute for real, deterministically, regardless of attached hardware.

Note: the environment may pre-register an accelerator plugin that overrides
``JAX_PLATFORMS`` from the environment, so the platform is forced through
``jax.config`` (which wins) before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles of the train steps dominate
# suite runtime; cache them across pytest sessions.  Tests get their OWN
# cache dir — the default one is shared with the TPU CLIs, whose remote
# compile service writes CPU AOT entries for a different host machine
# (observed: "+prefer-no-scatter not supported on the host machine").
from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/ast_tpu_xla_cputests"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
