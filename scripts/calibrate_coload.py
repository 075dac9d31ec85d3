"""Co-load calibration for the probe-normalized scaling protocol.

The headline protocol (scripts/bench_scaling.py --seq) divides each
arm's pages/s by the rate of a pinned html-parse probe running on
cores disjoint from the arm, to remove hypervisor CPU-delivery
weather. That is only unbiased if the arm itself does not depress the
probe. On one socket the arms and probe share memory bandwidth and
LLC, so an 8-core arm may slow the probe more than a 2-core arm —
which would credit the 4N arm's self-inflicted contention to
"weather" and inflate the normalized efficiency.

This script measures that bias directly: probe rate on cores 16-19
with (a) no co-load, (b) a 2-core pure-Python busy co-load on cores
0-1, (c) an 8-core co-load on cores 0-7 — the same core windows the
arms use. The co-load is the same html-parse loop as the probe (the
closest pure-CPU stand-in for the crawl's Python-side parse work).

Output: one JSON line with the three probe rates and the depression
factors f2 = rate_with_2core / rate_idle and f8 = rate_with_8core /
rate_idle. bench_scaling's normalized rates can then be co-load
corrected: corrected_norm(cpus) = pages_per_sec / (probe_rate / f_cpus),
i.e. the probe reading taken during an arm window is first scaled back
to what an idle-box probe would have read under that arm's own
co-load, so only genuine external weather is normalized away.

Usage: python scripts/calibrate_coload.py [--secs 60]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

PROBE_CORES = tuple(
    int(c)
    for c in os.environ.get("SPARK_GRAFT_BENCH_PROBE_CORES", "16,17,18,19").split(",")
)


def _parse_loop(core: int, idx, counts, stop) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    from html.parser import HTMLParser

    from calibrate_box import make_page

    page = make_page(32)

    class P(HTMLParser):
        def handle_data(self, d):
            pass

    while not stop.is_set():
        p = P()
        p.feed(page)
        p.close()
        counts[idx] += 1


class _Loops:
    def __init__(self, cores):
        self.stop = mp.Event()
        self.counts = mp.Array("l", len(cores))
        self.procs = [
            mp.Process(target=_parse_loop, args=(c, i, self.counts, self.stop), daemon=True)
            for i, c in enumerate(cores)
        ]
        for p in self.procs:
            p.start()

    def total(self) -> int:
        return sum(self.counts)

    def kill(self) -> None:
        self.stop.set()
        for p in self.procs:
            p.join(timeout=5)


def measure(coload_cores: tuple[int, ...], secs: float) -> float:
    """Probe parses/s on PROBE_CORES while `coload_cores` run the same
    loop (empty tuple = idle box)."""
    co = _Loops(coload_cores) if coload_cores else None
    probe = _Loops(PROBE_CORES)
    time.sleep(2)  # warmup: fork + first parses
    t0, c0 = time.time(), probe.total()
    time.sleep(secs)
    rate = (probe.total() - c0) / (time.time() - t0)
    probe.kill()
    if co:
        co.kill()
    return rate


def main() -> None:
    """Rapid alternation: [idle, 2core, idle, 8core] x reps with short
    windows, each co-load window ratioed against the MEAN of its two
    adjacent idle windows, median over reps. The box's CPU-delivery
    weather swings +/-12% on a minutes timescale (measured: back-to-
    back 60 s idle windows read 1659/1346/1624 parses/s), so a single
    long co-load window cannot be compared to a single idle window —
    pairing each short co-load window with its immediate neighbors
    cancels drift slower than ~2 windows."""
    import statistics

    secs = 15.0
    if "--secs" in sys.argv:
        secs = float(sys.argv[sys.argv.index("--secs") + 1])
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    seq: list[dict] = []
    f2s, f8s = [], []
    prev_idle = measure((), secs)
    seq.append({"load": "idle", "rate": round(prev_idle, 1)})
    for rep in range(reps):
        r2 = measure((0, 1), secs)
        mid_idle = measure((), secs)
        r8 = measure(tuple(range(8)), secs)
        next_idle = measure((), secs)
        f2s.append(r2 / ((prev_idle + mid_idle) / 2))
        f8s.append(r8 / ((mid_idle + next_idle) / 2))
        seq += [
            {"load": "2core", "rate": round(r2, 1)},
            {"load": "idle", "rate": round(mid_idle, 1)},
            {"load": "8core", "rate": round(r8, 1)},
            {"load": "idle", "rate": round(next_idle, 1)},
        ]
        prev_idle = next_idle
    f2, f8 = statistics.median(f2s), statistics.median(f8s)
    out = {
        "probe_cores": list(PROBE_CORES),
        "secs_per_window": secs,
        "reps": reps,
        "f2": round(f2, 4),
        "f8": round(f8, 4),
        "f2_all": [round(x, 4) for x in f2s],
        "f8_all": [round(x, 4) for x in f8s],
        "relative_bias_8_vs_2": round(f2 / f8, 4),
        "windows": seq,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
