"""Pool N-vs-4N scaling reps across bench sessions at the same commit.

Reads the per-session summary JSONs written by ``bench_scaling.py
--seq K`` and reports the three estimators BENCH.md documents, over
the pooled rep set:

* best-of-K raw        = (max 4N rate / max N rate) / 4
* median probe-normalized = (median(rate/probe) 4N / median(rate/probe) N) / 4
* raw median           = (median 4N rate / median N rate) / 4

Usage: python scripts/pool_scaling.py benchruns/r03/seq_*.json
(only sessions at the final engine commit should be passed — the
pre-optimization ``seq_240k_3rep.json`` is excluded from the pooled
table in BENCH.md for that reason).
"""

from __future__ import annotations

import json
import statistics
import sys


def main(paths: list[str]) -> int:
    raw_n: list[float] = []
    raw_4n: list[float] = []
    norm_n: list[float] = []
    norm_4n: list[float] = []
    per_session = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        runs = d.get("runs", [])
        sn = [r for r in runs if r["cpus"] == 2]
        s4 = [r for r in runs if r["cpus"] == 8]
        raw_n += [r["pages_per_sec"] for r in sn]
        raw_4n += [r["pages_per_sec"] for r in s4]
        norm_n += [r["norm_rate"] for r in sn if "norm_rate" in r]
        norm_4n += [r["norm_rate"] for r in s4 if "norm_rate" in r]
        import statistics as _st

        sess = {
            "file": p,
            "reps": min(len(sn), len(s4)),
            "best": round(
                max(r["pages_per_sec"] for r in s4)
                / max(r["pages_per_sec"] for r in sn)
                / 4,
                3,
            )
            if sn and s4
            else None,
        }
        if sn and s4:
            sess["raw_median"] = round(
                _st.median(r["pages_per_sec"] for r in s4)
                / _st.median(r["pages_per_sec"] for r in sn)
                / 4,
                3,
            )
            nn = [r["norm_rate"] for r in sn if "norm_rate" in r]
            n4 = [r["norm_rate"] for r in s4 if "norm_rate" in r]
            if nn and n4:
                sess["normalized"] = round(
                    _st.median(n4) / _st.median(nn) / 4, 3
                )
        per_session.append(sess)
    # SESSION-BLOCKED aggregation: each session's ratio compares arms
    # run within the SAME box-weather window (the blocking unit the
    # protocol interleaves for); the flat pool below additionally mixes
    # rates across sessions hours apart, re-importing exactly the
    # epoch confound the within-session design removes — so the
    # blocked medians are the headline and the flat pool is reported
    # as the conservative unblocked view.
    blocked = {
        "sessions": len(per_session),
        "median_session_best": round(
            statistics.median(s["best"] for s in per_session if s["best"]), 3
        ),
        "median_session_raw_median": round(
            statistics.median(
                s["raw_median"] for s in per_session if "raw_median" in s
            ),
            3,
        ),
        "median_session_normalized": round(
            statistics.median(
                s["normalized"] for s in per_session if "normalized" in s
            ),
            3,
        ),
    }
    out = {
        "sessions": per_session,
        "session_blocked": blocked,
        "n_reps": min(len(raw_n), len(raw_4n)),
        "rate_n_best": max(raw_n),
        "rate_4n_best": max(raw_4n),
        "pooled_best_of_k": round(max(raw_4n) / max(raw_n) / 4, 3),
        "pooled_raw_median": round(
            statistics.median(raw_4n) / statistics.median(raw_n) / 4, 3
        ),
        "pooled_median_normalized": round(
            statistics.median(norm_4n) / statistics.median(norm_n) / 4, 3
        )
        if norm_n and norm_4n
        else None,
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
