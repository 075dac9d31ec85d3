"""Merge the round-5 scale-analytics passes into one artifact.

Pass 1 hit the wrapper's wall-clock timeout after its last op
completed but before the final JSON dump, so its per-op results are
reconstructed from the stderr log's `op: Xs rows=N` lines; pass 2's
JSON is merged on top (pass-2 values win for re-run ops).

Usage: python scripts/merge_scale_runs.py \
           benchruns/r05/scale_analytics.stderr.log \
           benchruns/r05/scale_analytics_p2.json \
           benchruns/r05/scale_analytics.json
"""

import json
import re
import sys

OPLINE = re.compile(r"([a-z_0-9]+): ([0-9.]+)s rows=([0-9]+)")
CRAWL = re.compile(r"crawl: (\{.*?\})")


def main(log_path: str, p2_path: str, out_path: str) -> None:
    ops = {}
    crawl = None
    with open(log_path) as fh:
        text = fh.read()
    for m in OPLINE.finditer(text):
        ops[m.group(1)] = {
            "sec": float(m.group(2)),
            "rows": int(m.group(3)),
        }
    cm = CRAWL.search(text)
    if cm:
        crawl = json.loads(cm.group(1))
    with open(p2_path) as fh:
        p2 = json.load(fh)
    ops.update(p2["operators"])
    out = {
        "corpus": p2["corpus"],
        "docs": p2["docs"],
        "crawl": crawl or p2["crawl"],
        "operators": ops,
        "note": (
            "pass 1 (dedup/sketch/graph tiers) reconstructed from the"
            " stderr log after the wrapper timeout hit post-last-op;"
            " pass 2 (remaining tiers) merged on top"
        ),
    }
    with open(out_path, "w") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
