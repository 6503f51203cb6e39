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


def plan_chain(blocks: list[dict]) -> list[str] | None:
    """Layout-aware dispatch plan for a chain of inverted-residual blocks.

    The tuned table's ``flat_ms`` is measured in the kernel's NATIVE
    flat-NCHW layout while ``fused_ms``/``xla_ms`` are NHWC-native, so
    picking each block's minimum independently ignores the NHWC<->flat
    transpose a layout change costs at every boundary (``tp_ms`` in the
    table, one-way).  This runs the exact two-state DP instead:

        state       = activation layout entering the next block
        cost(i, s)  = block i's fastest impl available in state s
        transition  = tp_ms of the CONSUMING block's input tensor

    ``blocks``: per-block dicts with keys
        key        — ``block_key(...)`` string
        flat_ok    — hard kernel eligibility (stride/lane rules)
        stride2    — stride-2 block; its flat-state option is the
                     space-to-depth "flat2" kernel (chain-breaking: it
                     cannot accept a prepadded halo input, so a
                     preceding flat block pays its exit slice)
        force_nhwc — block must run in NHWC (stride-2 XLA path where
                     the s2 kernel is ineligible)
        nhwc_out   — an NHWC copy of this block's output is consumed
                     elsewhere even if the chain continues flat
                     (encoder taps); charges tp once to the flat state
    The chain is assumed to enter AND leave in NHWC (stem/ada_out in,
    taps/head out).  Returns one impl name per block, or None when any
    needed stride-1 table entry is missing (caller falls back to
    heuristics).  Stride-2 entries may be absent: both impls then cost
    the same and only the transition terms decide.
    """
    table = load_policy()
    INF = float("inf")

    # rows: (nhwc_opts, flat_opt=(impl_name, ms)|None, (tp, bnd), blk, brk)
    rows = []
    for blk in blocks:
        row = table.get(blk["key"])
        if blk.get("force_nhwc"):
            # NHWC-pinned stride-2 blocks contribute a constant to every
            # plan, so cost 0 — only the layout transition into them
            # matters.  tp falls back to a bandwidth estimate when
            # untuned (2 HBM passes of the input at ~300 GB/s measured
            # transpose rate, batch 8).
            tp = (row or {}).get("tp_ms")
            if tp is None:
                tp = blk.get("est_bytes", 0) * 2 / 300e9 * 1e3
            rows.append(({"xla": 0.0}, None, (tp, 0.0), blk, True))
            continue
        if blk.get("stride2"):
            tp = (row or {}).get("tp_ms")
            if tp is None:
                tp = blk.get("est_bytes", 0) * 2 / 300e9 * 1e3
            xla_ms = (row or {}).get("xla_ms", 0.0)
            f2 = (row or {}).get("flat2_ms", xla_ms)
            rows.append(
                ({"xla": xla_ms}, ("flat2", f2), (tp, 0.0), blk, True)
            )
            continue
        if not row:
            return None
        nhwc_opts = {
            n: row[f"{n}_ms"] for n in ("fused", "xla") if f"{n}_ms" in row
        }
        if not nhwc_opts or "tp_ms" not in row:
            return None
        flat_ms = row.get("flat_ms") if blk.get("flat_ok", True) else None
        # flati_ms (halo-chain interior: prepadded in, halo out) splits
        # the isolated flat cost into interior + boundary prep/slice —
        # an interior block is charged flati_ms, and each flat<->nhwc
        # transition is charged half of (flat_ms - flati_ms) on top of
        # the transpose.
        bnd = 0.0
        if flat_ms is not None and row.get("flati_ms") is not None:
            bnd = max(0.0, (flat_ms - row["flati_ms"]) / 2)
            flat_ms = row["flati_ms"]
        flat_opt = None if flat_ms is None else ("flat", flat_ms)
        rows.append((nhwc_opts, flat_opt, (row["tp_ms"], bnd), blk, False))

    # DP over states 0=nhwc, 1=flat; entry is NHWC.  A flat<->nhwc
    # transition costs one transpose (tp of the block at the boundary)
    # plus the prep/slice boundary share (bnd): entering flat pays the
    # entered block's bnd (its prep), leaving flat pays the PREVIOUS
    # flat block's bnd (its exit slice).  A chain-breaking flat-state
    # block (flat2) charges the previous flat block's exit slice even
    # when the chain stays flat, and resets the carried boundary share.
    cost = [0.0, INF]
    choice: list[list[tuple[str, int] | None]] = []
    prev_bnd = 0.0
    for nhwc_opts, flat_opt, (tp, bnd), blk, brk in rows:
        best_nhwc = min(nhwc_opts, key=nhwc_opts.get)
        nxt = [INF, INF]
        pick: list[tuple[str, int] | None] = [None, None]
        arrive_nhwc = min(
            (cost[0], 0), (cost[1] + tp + prev_bnd, 1), key=lambda p: p[0]
        )
        nxt[0] = arrive_nhwc[0] + nhwc_opts[best_nhwc]
        pick[0] = (best_nhwc, arrive_nhwc[1])
        if flat_opt is not None:
            name, flat_ms = flat_opt
            stay = cost[1] + (prev_bnd if brk else 0.0)
            arrive_flat = min(
                (cost[0] + tp + bnd, 0), (stay, 1), key=lambda p: p[0]
            )
            extra = tp if blk.get("nhwc_out") else 0.0
            nxt[1] = arrive_flat[0] + flat_ms + extra
            pick[1] = (name, arrive_flat[1])
        cost = nxt
        choice.append(pick)
        prev_bnd = 0.0 if brk else bnd

    # exit back to NHWC
    exit_tp = rows[-1][2][0] + rows[-1][2][1]
    state = 0 if cost[0] <= cost[1] + exit_tp else 1
    impls: list[str] = []
    for pick in reversed(choice):
        sel = pick[state]
        assert sel is not None
        impls.append(sel[0])
        state = sel[1]
    impls.reverse()
    return impls
