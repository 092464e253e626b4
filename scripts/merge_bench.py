"""Merge benchmark rows from a partial run into BENCH_ALL.json.

`bench_all.py --models <subset> --out partial.json` writes ONLY the subset
rows; overwriting BENCH_ALL.json with that would drop every other model's
record. This helper replaces/appends rows by their `model` tag instead:

    python scripts/merge_bench.py partial.json [BENCH_ALL.json]

Rows with an `error` field never overwrite a previous good row (a TPU-worker
flake must not erase a real measurement).
"""

from __future__ import annotations

import json
import sys
import time


def merge(partial_path: str, all_path: str = "BENCH_ALL.json") -> int:
    with open(partial_path) as f:
        partial = json.load(f)["results"]
    with open(all_path) as f:
        full = json.load(f)

    by_tag = {r["model"]: i for i, r in enumerate(full["results"])}
    replaced = appended = skipped = 0
    for row in partial:
        i = by_tag.get(row["model"])
        if row.get("error") and i is not None and not full["results"][i].get("error"):
            skipped += 1
            continue
        if i is None:
            full["results"].append(row)
            by_tag[row["model"]] = len(full["results"]) - 1
            appended += 1
        else:
            full["results"][i] = row
            replaced += 1

    full["timestamp"] = time.time()
    with open(all_path, "w") as f:
        json.dump(full, f, indent=2)
    print(f"[merge_bench] {all_path}: {replaced} replaced, {appended} "
          f"appended, {skipped} error rows skipped")
    return 0


if __name__ == "__main__":
    sys.exit(merge(*sys.argv[1:]))
