"""Merge the round-5 scale-analytics passes into one artifact.

Inputs are the per-pass stderr logs (per-op results are parsed from
their `op: Xs rows=N` lines — passes that hit the wrapper timeout or
died on a later op never wrote their JSON, but every COMPLETED op's
measurement is in its log) plus any per-pass JSON files; later inputs
win for re-run ops.

Usage: python scripts/merge_scale_runs.py OUT.json INPUT...
  (INPUT = .stderr.log to parse, or .json to merge verbatim)
"""

import json
import re
import sys

OPLINE = re.compile(r"([a-z_0-9]+): ([0-9.]+)s rows=([0-9]+)")
CRAWL = re.compile(r"crawl: (\{.*?\})")


def main(out_path: str, inputs: list) -> None:
    ops = {}
    crawl = None
    meta = {}
    for path in inputs:
        if path.endswith(".json"):
            with open(path) as fh:
                p = json.load(fh)
            ops.update(p["operators"])
            meta = {"corpus": p["corpus"], "docs": p["docs"]}
            crawl = crawl or p.get("crawl")
            continue
        with open(path) as fh:
            text = fh.read()
        for m in OPLINE.finditer(text):
            ops[m.group(1)] = {
                "sec": float(m.group(2)),
                "rows": int(m.group(3)),
            }
        cm = CRAWL.search(text)
        if cm:
            crawl = json.loads(cm.group(1))
    out = {
        **meta,
        "crawl": crawl,
        "operators": ops,
        "note": (
            "merged from multiple passes over the same cached corpus/"
            "docs; per-op rows parsed from pass logs where a pass"
            " ended before its JSON dump (timeout / later-op failure)"
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
