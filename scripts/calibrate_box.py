"""Pinned box-capacity probe for the scaling bench's denominator.

Measures how much aggregate CPU work this sandbox actually delivers to
k pinned cores vs 1, using the same kind of work the crawl's dominant
stage does (stdlib html.parser over a ~32 KiB page). On a virtualized
bursty box, k busy vCPUs receive less than k× the host CPU of 1 busy
vCPU (steal/turbo); that host-side loss is not engine inefficiency, so
BENCH.md reports it next to the engine's measured scaling.

Usage: python scripts/calibrate_box.py [k ...]   (default: 2 8)
Prints one JSON line: {"arms": {k: parses_per_sec}, "capacity_ratio_2_to_8": r}
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

SECONDS = float(os.environ.get("CALIBRATE_SECONDS", "20"))


def make_page(kb: int = 32) -> str:
    import random

    rng = random.Random(7)
    words = ["the", "quick", "brown", "crawler", "fetches", "pages", "links"]
    parts = ["<html><head><title>t</title></head><body>"]
    while sum(len(p) for p in parts) < kb * 1024:
        parts.append("<p>" + " ".join(rng.choice(words) for _ in range(20)) + "</p>")
        parts.append('<a href="/r%d">l</a>' % rng.randrange(10**6))
    parts.append("</body></html>")
    return "".join(parts)


def worker(core: int, page: str, out, stop_t: float) -> None:
    os.sched_setaffinity(0, {core})
    from html.parser import HTMLParser

    class P(HTMLParser):
        def handle_data(self, d):
            self.n = getattr(self, "n", 0) + len(d)

    n = 0
    while time.time() < stop_t:
        p = P()
        p.feed(page)
        p.close()
        n += 1
    out.put(n)


def arm(k: int, page: str) -> float:
    q: mp.Queue = mp.Queue()
    stop_t = time.time() + SECONDS + 0.5
    procs = [
        mp.Process(target=worker, args=(c, page, q, stop_t)) for c in range(k)
    ]
    t0 = time.time()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    dt = time.time() - t0
    total = sum(q.get() for _ in procs)
    return total / dt


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [2, 8]
    page = make_page()
    rates = {k: round(arm(k, page), 1) for k in ks}
    out = {"arms": rates, "seconds_per_arm": SECONDS}
    if 2 in rates and 8 in rates and rates[2]:
        out["capacity_ratio_2_to_8"] = round(rates[8] / rates[2], 3)
        out["capacity_efficiency_2_to_8"] = round(rates[8] / rates[2] / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
