"""Measured per-block dispatch policy for the fused inference engine.

The engine has three lowerings for an inverted-residual block — the
round-2 fused kernel + XLA epilogue (``fused_block.fused_block_apply``),
the flat-lane NCHW megakernel (``flatblock.flat_block_apply_f``), and the
plain XLA composition (``fused_block.xla_block_apply``) — and which one
wins depends on (channels, kernel size, expand ratio, resolution) in ways
that were only ever knowable by measuring on the target chip
(README.md "Performance status": the same kernel is 1.3x faster at
16ch@512 and par at 80ch@256).

``scripts/autotune_blocks.py`` times every block instance the model
actually executes at a given inference size and writes the winners to a
JSON policy table; this module loads that table and answers "which impl
for this block?".  The engine's ``decoder_impl/encoder_impl="auto"`` mode
consults it per block and falls back to the hand-measured heuristics for
shapes the table has not seen.

The table ships checked-in at ``ops/pallas/tuned_policy.json`` (regenerate
on new hardware with the autotuner); ``AST_TUNED_POLICY`` overrides the
path at runtime.
"""

from __future__ import annotations

import functools
import json
import os
from pathlib import Path

_DEFAULT_PATH = Path(__file__).with_name("tuned_policy.json")


def block_key(
    c_in: int, c_out: int, stride: int, k: int, t: float, h: int, w: int
) -> str:
    """Stable policy key for one block instance.

    Batch is deliberately excluded: every candidate kernel grids over the
    batch axis, so per-image cost is batch-independent to first order
    (measured: the 49.4 img/s bench is within 3% between batch 8 and 32).
    """
    return f"{c_in}-{c_out}s{stride}k{k}t{t}@{h}x{w}"


@functools.lru_cache(maxsize=1)
def load_policy() -> dict:
    """The tuned policy table, or {} when absent/unreadable."""
    path = os.environ.get("AST_TUNED_POLICY", str(_DEFAULT_PATH))
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {}
    return data.get("cases", {})


def best_impl(
    c_in: int, c_out: int, stride: int, k: int, t: float, h: int, w: int
) -> str | None:
    """The measured-fastest impl name ("flat" | "fused" | "xla") for this
    block, or None when the table has no entry (caller falls back to the
    built-in heuristics)."""
    entry = load_policy().get(block_key(c_in, c_out, stride, k, t, h, w))
    if not entry:
        return None
    return entry.get("best")
