"""Property layer (SURVEY.md §5.2 layer 5): seeded random webs.

For several seeded pseudo-random link graphs (random robots rules,
crawl delays, dead links, non-HTML decoys, cross-host links, cycles),
the BSP engine must agree with the heap simulator on every
order-independent contract, and the crawl invariants must hold:

  * no URL attempted twice;
  * seen ⊇ fetched;
  * frontier ∩ seen = ∅ at termination (here: frontier empty);
  * per-host fetch timestamps spaced ≥ the host's delay;
  * byte-identical text per fetched url.
"""

from __future__ import annotations

import random

import pytest

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.simulator import ReferenceSimulator, pages_df_to_dict
from webcrawler_spark.sources.synthetic_web import PAGES_SCHEMA


def _random_web(seed: int):
    rng = random.Random(seed)
    n_hosts = rng.randint(3, 7)
    hosts = [f"https://h{i}.rnd" for i in range(n_hosts)]
    pages = {}
    all_urls = []
    for h in hosts:
        for p in range(rng.randint(2, 10)):
            suffix = rng.choice(["", "", "", ".pdf", ".html"])
            all_urls.append(f"{h}/p{p}{suffix}")
    for url in all_urls:
        kind = rng.random()
        if kind < 0.08:
            continue  # dead link target: referenced but no row
        links = rng.sample(all_urls, k=min(len(all_urls), rng.randint(0, 5)))
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        html = (
            f"<html><head><title>t {url}</title></head>"
            f"<body><p>content of {url} word{rng.randint(0, 9)}</p>{body}</body></html>"
        )
        status = rng.choice([200] * 8 + [404, 301])
        ct = rng.choice(["text/html; charset=utf-8"] * 9 + ["application/json"])
        pages[url] = (html.encode(), status, ct)
    for h in hosts:
        r = rng.random()
        if r < 0.4:
            body = f"User-agent: *\nCrawl-delay: {rng.choice([0.05, 0.3, 1, 5])}\n"
            if rng.random() < 0.5:
                body += f"Disallow: /p{rng.randint(0, 3)}\n"
            pages[f"{h}/robots.txt"] = (body.encode(), 200, "text/plain")
    seeds = rng.sample(hosts, k=min(3, len(hosts)))
    return pages, [f"{h}/p0" for h in seeds]


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_web_parity_and_invariants(spark, seed):
    pages_map, seeds = _random_web(seed)
    rows = [
        (url, None, html, None, None, status, ct)
        for url, (html, status, ct) in pages_map.items()
    ]
    pages_df = spark.createDataFrame(rows, PAGES_SCHEMA).localCheckpoint()

    sim = ReferenceSimulator(pages_df_to_dict(pages_df.collect()))
    simres = sim.run(seeds)

    seeds_df = spark.createDataFrame(
        [(u, i) for i, u in enumerate(seeds)], "url string, seed_order int"
    )
    eng = CrawlEngine(spark, pages_df, config=CrawlConfig(max_rounds=60))
    eng.run(seeds_df)

    seen_rows = eng.seen().collect()

    # parity: URL-seen set + fetched flags
    eng_seen = {r["url"]: r["fetched"] for r in seen_rows}
    assert eng_seen == simres.seen, f"seed={seed}"

    # invariant: no URL attempted twice
    urls = [r["url"] for r in seen_rows]
    assert len(urls) == len(set(urls))

    # invariant: frontier drained at quiescence
    assert eng.cat.read("frontier").count() == 0

    # invariant: politeness spacing per host
    hs = {r["host"]: r["delay"] for r in eng.cat.read("host_state").collect()}
    by_host: dict[str, list[float]] = {}
    for r in seen_rows:
        if r["fetched"]:
            by_host.setdefault(r["host"], []).append(r["attempt_ts"])
    for host, ts in by_host.items():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            assert b - a >= hs[host] - 1e-5, (seed, host)

    # parity: byte-identical text
    texts = {r["url"]: r["text"] for r in eng.pages_fetched().collect()}
    assert texts == simres.texts, f"seed={seed}"

    # parity: per-host attempted counts
    counts = {r["host"]: r["n"] for r in eng.host_counts().collect()}
    assert counts == simres.host_counts
