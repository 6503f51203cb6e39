"""Persistent XLA compilation cache setup.

TPU compiles of the full AST training step run minutes; the bucketed
multi-resolution training compiles one executable per (H, W) bucket
(SURVEY.md §7).  A persistent on-disk cache makes every rerun and resume
start instantly.  Call before the first jit execution.
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "AST_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ast_tpu_xla")
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    path = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
