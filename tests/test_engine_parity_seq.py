"""Total-order crawl parity, sequential mode (SURVEY.md §5.3).

With one (priority,host)-min host and one URL per round, the engine's
round loop is the same discrete-event system as the reference's heap
(W1 tie-break by host name, W2 priority algebra incl. the medium
(currMax-currMin)/2 rule, W4 virtual-clock waits) — so the *total*
attempt order must equal the simulator's, not just the sets.

The full-graph run takes ~50 one-pop rounds; to keep the suite fast
this test crawls with a budget that still exercises first-host-0,
medium-priority admission, re-queue after fetch, skip-without-delay,
and the exact-budget stop.
"""

from __future__ import annotations

import pytest

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.simulator import ReferenceSimulator, pages_df_to_dict
from webcrawler_spark.sources.synthetic_web import SEEDS, build_pages, seeds_df

LIMIT = 18


@pytest.fixture(scope="module")
def pages(spark):
    return build_pages(spark).localCheckpoint()


def test_sequential_total_order_matches_simulator(spark, pages):
    sim = ReferenceSimulator(pages_df_to_dict(pages.collect()), limit=LIMIT)
    simres = sim.run(SEEDS)

    cfg = CrawlConfig.sequential_parity_mode(limit=LIMIT)
    cfg.max_rounds = 80
    cfg.collect_metrics = False
    eng = CrawlEngine(spark, pages, config=cfg)
    eng.run(seeds_df(spark))

    rows = eng.seen().collect()
    eng_order = [r["url"] for r in sorted(rows, key=lambda r: r["round"])]
    sim_order = [u for u, _, _ in simres.attempt_order]
    assert eng_order == sim_order

    # fetch timestamps agree too (virtual-clock politeness parity, W4)
    eng_ts = {r["url"]: r["attempt_ts"] for r in rows if r["fetched"]}
    sim_ts = {u: ts for u, ts, fetched in simres.attempt_order if fetched}
    assert set(eng_ts) == set(sim_ts)
    for u in sim_ts:
        assert abs(eng_ts[u] - sim_ts[u]) < 1e-6, u
