"""Harvest completed bench rows from a bench_all --isolate log.

``bench_all.py --isolate`` prints each finished row as a JSON line but only
writes its ``--out`` file at the END of the sweep — a tunnel stall or wall-
clock cutoff mid-sweep would lose every completed measurement. This reads
the captured stdout log, keeps the LAST row per model tag (isolate retries
print one line per attempt), writes a partial-results file, and optionally
merges it into BENCH_ALL.json via merge_bench (error rows never clobber
good ones there).

    python scripts/harvest_bench_log.py /tmp/bench_all_r5.log [--merge]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def harvest(log_path: str) -> list[dict]:
    rows: dict[str, dict] = {}
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not (line.startswith("{") and '"model"' in line):
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            tag = row.get("model")
            if not tag:
                continue
            # keep a good row over a later error row (isolate already
            # retries; the parent prints the final outcome last, but a
            # re-run of the harvester over a concatenated log must not
            # regress a good measurement)
            if tag in rows and "error" not in rows[tag] and "error" in row:
                continue
            rows[tag] = row
    return list(rows.values())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--out", default="BENCH_HARVEST.json")
    ap.add_argument("--merge", action="store_true",
                    help="merge harvested rows into BENCH_ALL.json")
    args = ap.parse_args()

    rows = harvest(args.log)
    good = [r for r in rows if "error" not in r]
    print(f"[harvest] {len(rows)} rows ({len(good)} good) from {args.log}")
    with open(args.out, "w") as f:
        json.dump({"timestamp": time.time(), "results": rows}, f, indent=2)
    if args.merge and rows:
        root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
        return subprocess.call(
            [sys.executable, os.path.join(root, "scripts", "merge_bench.py"),
             args.out, os.path.join(root, "BENCH_ALL.json")])
    return 0


if __name__ == "__main__":
    sys.exit(main())
