"""Render a scale_analytics artifact's operator timings as the
markdown table BENCH.md embeds — one source of truth, no orphan
numbers (round-4 verdict "what's wrong" #2).

Usage: python scripts/bench_table.py benchruns/r04/scale_analytics.json
"""

import json
import sys


def main(path: str) -> None:
    with open(path) as f:
        art = json.load(f)
    print("| operator | sec | result rows |")
    print("|---|---:|---:|")
    for name, row in art["operators"].items():
        print(f"| {name} | {row['sec']} | {row['rows']} |")


if __name__ == "__main__":
    main(sys.argv[1])
