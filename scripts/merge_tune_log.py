#!/usr/bin/env python
"""Merge autotune_blocks per-case log lines into the policy table.

The autotuner prints each tuned case as a one-line JSON object and only
writes the merged table at the end of the run; when a run is cut short
(wall-clock budget, tunnel outage) this recovers the completed cases
from the log into ``tuned_policy.json`` so partial tuning is never lost.

Usage: python scripts/merge_tune_log.py /tmp/tune256.log [--size 256]
"""

import argparse
import json


def main(args):
    rows = {}
    with open(args.log) as fh:
        for line in fh:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            for k, v in obj.items():
                if isinstance(v, dict) and (
                    "best" in v or any(kk.endswith("_ms") for kk in v)
                ):
                    rows[k] = v
    try:
        with open(args.out) as fh:
            table = json.load(fh)
    except (OSError, json.JSONDecodeError):
        table = {"meta": {}, "cases": {}}
    before = len(table.get("cases", {}))
    table.setdefault("cases", {}).update(rows)
    meta = table.setdefault("meta", {})
    if args.size:
        sizes = meta.get("sizes") or ([meta["size"]] if "size" in meta else [])
        meta["sizes"] = sorted({*sizes, args.size})
        meta.pop("size", None)
    with open(args.out, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"merged {len(rows)} cases from {args.log} "
          f"({before} -> {len(table['cases'])} total)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--size", type=int, default=None)
    p.add_argument(
        "--out",
        default="arbitrarystyletransfer_tpu/ops/pallas/tuned_policy.json",
    )
    main(p.parse_args())
