"""Resumption from snapshot (north_rule; SURVEY.md §5.2 layer 4).

Run K rounds against a durable ParquetCatalog, throw the driver away,
build a fresh engine on a fresh catalog handle pointing at the same
root, resume, and finish. Final tables must equal an uninterrupted run.
"""

from __future__ import annotations

import pytest

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.sources.synthetic_web import build_pages, seeds_df
from webcrawler_spark.tables import ParquetCatalog


@pytest.fixture(scope="module")
def pages(spark):
    return build_pages(spark).localCheckpoint()


def _seen_set(eng):
    return {(r["url"], r["fetched"], r["round"]) for r in eng.seen().collect()}


def test_resume_equals_uninterrupted(spark, pages, tmp_path_factory):
    cfg = CrawlConfig(max_rounds=40)

    # uninterrupted reference run (memory catalog)
    ref = CrawlEngine(spark, pages, config=cfg)
    ref.run(seeds_df(spark))
    ref_seen = _seen_set(ref)
    ref_texts = {r["url"]: r["text"] for r in ref.pages_fetched().collect()}

    # interrupted run: 2 rounds, drop the driver, resume on new objects
    root = str(tmp_path_factory.mktemp("catalog"))
    eng1 = CrawlEngine(
        spark, pages, catalog=ParquetCatalog(spark, root), config=cfg
    )
    eng1.init_from_seeds(seeds_df(spark))
    eng1.run_round()
    eng1.run_round()
    partial_state = eng1.state.to_json()
    del eng1  # "kill the driver at a round boundary" (SURVEY.md §4)

    eng2 = CrawlEngine(
        spark, pages, catalog=ParquetCatalog(spark, root), config=cfg
    )
    eng2.resume()
    assert eng2.state.to_json() == partial_state
    eng2.run()  # no seeds — continue from snapshot

    assert _seen_set(eng2) == ref_seen
    texts = {r["url"]: r["text"] for r in eng2.pages_fetched().collect()}
    assert texts == ref_texts


def test_resume_after_midround_crash(spark, pages, tmp_path_factory):
    """A crash AFTER data dirs are written but BEFORE commit_round leaves
    orphan dirs at seq numbers the resumed run will re-allocate (it
    restores _seq from the last committed manifest row). The resumed
    round must clobber those garbage dirs, not die on
    PATH_ALREADY_EXISTS, and still converge to the reference run."""
    cfg = CrawlConfig(max_rounds=40)

    ref = CrawlEngine(spark, pages, config=cfg)
    ref.run(seeds_df(spark))
    ref_seen = _seen_set(ref)

    root = str(tmp_path_factory.mktemp("catalog"))
    cat1 = ParquetCatalog(spark, root)
    eng1 = CrawlEngine(spark, pages, catalog=cat1, config=cfg)
    eng1.init_from_seeds(seeds_df(spark))
    eng1.run_round()
    eng1.run_round()
    # round 3 "crashes" mid-round: its parquet dirs land on disk but the
    # manifest row is never published (commit_round is the commit point)
    cat1.commit_round = lambda round_no, state: None
    eng1.run_round()
    del eng1, cat1

    eng2 = CrawlEngine(
        spark, pages, catalog=ParquetCatalog(spark, root), config=cfg
    )
    eng2.resume()  # restores round-2 state; round 3's orphan dirs exist
    eng2.run()
    assert _seen_set(eng2) == ref_seen


def test_time_travel_snapshots(spark, pages, tmp_path_factory):
    """Each round commit is a recoverable snapshot: the manifest keeps
    every round's table versions (Iceberg-snapshot emulation)."""
    import json
    import os

    root = str(tmp_path_factory.mktemp("catalog"))
    eng = CrawlEngine(
        spark, pages, catalog=ParquetCatalog(spark, root),
        config=CrawlConfig(max_rounds=3),
    )
    eng.run(seeds_df(spark))
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    rounds = manifest["rounds"]
    assert len(rounds) >= 3
    # every referenced data dir still exists (append-only, no rewrites)
    for r in rounds:
        for dirs in r["tables"].values():
            for d in dirs:
                assert os.path.isdir(d), d
    # seen grows monotonically across snapshots
    sizes = []
    for r in rounds:
        dirs = r["tables"].get("seen", [])
        if dirs:
            sizes.append(spark.read.parquet(*dirs).count())
    assert sizes == sorted(sizes)
