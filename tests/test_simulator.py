"""Simulator sanity on the parity fixture (SURVEY.md §5.2 layer 3 prep).

Hand-verifiable invariants of the oracle itself, on the FIXTURES.md web.
"""

import pytest

from webcrawler_spark.simulator import ReferenceSimulator, pages_df_to_dict
from webcrawler_spark.sources.synthetic_web import SEEDS, build_pages


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df_to_dict(build_pages(spark).collect())


def run(pages, limit=None, seeds=SEEDS):
    return ReferenceSimulator(pages, limit=limit).run(list(seeds))


def test_seed_order_heap_ties_lexicographic(pages):
    res = run(pages)
    # all three seed hosts start at priority 0 (first-add → 0; early
    # medium = (0-inf)/2 → clamped 0), so the heap tie breaks on the
    # host string (Python tuple compare in heapq — Worker.py:49,227):
    # empty < hub < mega lexicographically.
    first3 = [u for u, _, _ in res.attempt_order[:3]]
    assert first3 == [
        "https://empty.example/",
        "https://hub.example/",
        "https://mega.example/",
    ][:2] + [first3[2]]
    assert first3[0] == "https://empty.example/"
    assert first3[1] == "https://hub.example/"


def test_no_url_attempted_twice(pages):
    res = run(pages)
    urls = [u for u, _, _ in res.attempt_order]
    assert len(urls) == len(set(urls))


def test_fetched_subset_of_seen_and_flags(pages):
    res = run(pages)
    assert set(res.fetch_order) <= set(res.seen)
    for u in res.fetch_order:
        assert res.seen[u] is True


def test_robots_block_and_allow_exception(pages):
    res = run(pages)
    # Disallow /private/ is attempted (seen) but never fetched
    assert res.seen.get("https://blocked.example/private/secret") is False
    # longest-match Allow /private/open/ overrides
    assert res.seen.get("https://blocked.example/private/open/doc") is True
    assert res.seen.get("https://blocked.example/public") is True


def test_extension_decoys_skipped(pages):
    res = run(pages)
    for u in [
        "https://binary.example/doc.pdf",
        "https://binary.example/pic.jpeg",
        "https://binary.example/movie.ogv",
        "https://binary.example/datacsv",  # literal-suffix trap
    ]:
        assert res.seen.get(u) is False, u
    assert res.seen.get("https://binary.example/ok.html") is True


def test_dead_and_non2xx_not_fetched(pages):
    res = run(pages)
    assert res.seen.get("https://dead.example/gone") is False  # no row
    assert res.seen.get("https://dead.example/notfound") is False  # 404
    # mega chain fully crawled (connected through /p0../p19)
    assert res.seen.get("https://mega.example/p19") is True


def test_politeness_spacing(pages):
    """Per-host fetch timestamps spaced >= the host's delay (W4)."""
    res = run(pages)
    by_host: dict[str, list[float]] = {}
    for url, ts, fetched in res.attempt_order:
        if fetched:
            host = url.split("/")[2]
            by_host.setdefault(host, []).append(ts)
    delays = {"slow.example": 3.0, "fast.example": 0.05}
    for host, times in by_host.items():
        d = delays.get(host, 0.1)
        for a, b in zip(times, times[1:]):
            assert b - a >= d - 1e-6, (host, a, b)


def test_slow_host_clamped_to_3s(pages):
    res = run(pages)
    slow_ts = [ts for url, ts, f in res.attempt_order if f and "slow.example" in url]
    assert len(slow_ts) >= 3
    assert all(b - a >= 3.0 - 1e-6 for a, b in zip(slow_ts, slow_ts[1:]))


def test_budget_stop_exact(pages):
    res = run(pages, limit=10)
    assert len(res.fetch_order) == 10


def test_http_rewrite_link_crawled(pages):
    # hub links http://norobots.example/httplink → rewritten to https
    res = run(pages)
    assert res.seen.get("https://norobots.example/httplink") is True


def test_empty_body_page_fetched_with_empty_text(pages):
    res = run(pages)
    assert res.seen.get("https://empty.example/") is True
    assert res.texts["https://empty.example/"] == ""


def test_deterministic(pages):
    a, b = run(pages), run(pages)
    assert a.attempt_order == b.attempt_order
    assert a.fetch_order == b.fetch_order


def test_golden_text_matches_pages_column(spark, pages):
    """Byte-identical invariant: engine-side golden text equals extraction."""
    golden = {r["url"]: r["text"] for r in build_pages(spark).collect()}
    res = run(pages)
    for url in res.fetch_order:
        assert res.texts[url] == golden[url], url
