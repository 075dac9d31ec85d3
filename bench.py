"""Benchmark harness — prints ONE JSON line.

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32):

* ``crawl``      — a budgeted crawl of the web synthesized from the
                   documents table (the engine's real workload: J1-J3
                   joins, W1-W4 windows, parse UDF, snapshot writes).
* analytics      — aggregation / join / window / dedup / similarity
                   operators from ``__spark_entry__.queries()``.

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": <float>,
         "crawl": {pages, urls, pages_per_sec, urls_per_sec}}

The N-vs-4N scaling-efficiency evidence (north_rule) is produced by
``scripts/bench_scaling.py`` (separate JVMs per parallelism level) and
recorded in BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# queries() entries benched at sf0.1 (the heavier representatives)
BENCH_QUERIES = [
    "pricing_summary",
    "broadcast_dim_join",
    "fetch_join_filter",
    "fifo_first_event",
    "exact_dedup",
    "minhash_lsh_pairs",
    "incremental_dedup",
    "simhash",
    "text_quality",
    "cosine_topk",
    "near_dup_pipeline",
    "duplicate_clusters",
    "host_pagerank",
    "opic_importance",
    "gopher_quality",
    "segment_dedup",
    "repetition_stats",
    "ngram_contamination",
    "decontaminate",
    "unigram_logprob",
    "bigram_logprob",
    "duplicated_ngrams",
    "mixture_sample",
    "source_report",
    "vocab_build",
    "encode_docs",
    "bpe_merges",
    "bpe_encode",
    "pack_chunks",
    "pack_greedy",
    "redact_pii",
    "exact_substring_dedup",
    "c4_clean",
    "justext_blocks",
    "domain_cap",
    "sitemap_parse",
    "anchor_topk",
    "quality_mixture",
    "tfidf_top_terms",
    "hll_estimate",
    "cms_topk_est",
    "embedding_near_dup",
    "dsir_topk",
    "nb_langid",
    "lr_quality",
    "trap_hosts",
    "recrawl_priority",
    "rank_priority",
    "politeness_schedule",
    "sessionize",
    "tumbling_events",
    "hits_scores",
    "heavy_hitters",
    "ccnet_buckets",
    "surt_keys",
    "cdx_roundtrip",
    "containment_pairs",
    "kmv_estimate",
    "kmv_intersection",
    "image_dhash_pairs",
    "image_dhash_png",
    "image_dhash_jpeg",
    "audio_fp_pairs",
    "pipeline_funnel",
]


def _isolate(spark) -> None:
    """Per-query isolation, run OUTSIDE the timers: the iterative
    operators (connected components, pagerank, OPIC) return
    localCheckpoint-truncated DataFrames whose RDD blocks stay pinned
    until Python's GC drops the py4j refs and the ContextCleaner runs;
    left alone, the accumulated blocks put the block manager under
    memory pressure and were measured to slow the NEXT iterative query
    up to 7× (4.4 s → 31 s for host_pagerank after duplicate_clusters
    at sf0.1). Standard benchmark hygiene: collect, clear, GC."""
    import gc

    gc.collect()
    spark.catalog.clearCache()
    # localCheckpoint blocks whose py4j refs are gone still wait on the
    # async ContextCleaner; unpersist them NOW so no timed query starts
    # under leftover block-manager pressure (measured: semantic_dedup
    # 52 s after the iterative queries without this, ~7 s with)
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(True)
    spark.sparkContext._jvm.System.gc()


def _sf_of(path: str) -> float:
    name = os.path.basename(path.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_crawl_bench(spark) -> tuple[float, dict]:
    from webcrawler_spark.engine import CrawlConfig
    from webcrawler_spark.plans.crawl import crawl
    from webcrawler_spark.sources.synthetic_web import (
        document_web_seeds,
        pages_from_documents,
    )

    import tempfile

    pages_dir = os.path.join(tempfile.mkdtemp(prefix="docweb-"), "pages")
    pages_from_documents(spark, SF_DIR).write.parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    seeds = document_web_seeds(spark, SF_DIR, n_seeds=8)
    cfg = CrawlConfig(
        max_rounds=6,
        collect_metrics=False,
        max_urls_per_host_per_round=500,
        round_window=60.0,
    )
    t0 = time.time()
    session = crawl(spark, pages, seeds, config=cfg)
    dt = time.time() - t0
    eng = session.engine
    pages_fetched = eng.state.total_fetched
    urls = eng.state.total_attempted
    return dt, {
        "pages": pages_fetched,
        "urls": urls,
        "rounds": len(session.history),
        "pages_per_sec": round(pages_fetched / dt, 1),
        "urls_per_sec": round(urls / dt, 1),
        "pages_per_sec_per_core": round(pages_fetched / dt / CPUS, 3),
    }


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    from webcrawler_spark.session import apply_perf_conf

    spark = (
        apply_perf_conf(
            SparkSession.builder.master(f"local[{CPUS}]")
            .appName("webcrawler-spark-bench")
            .config("spark.driver.memory", "16g")
            .config("spark.sql.shuffle.partitions", str(CPUS))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    crawl_sec, crawl_stats = run_crawl_bench(spark)
    timings["crawl"] = round(crawl_sec, 3)
    print(f"[bench] crawl: {timings['crawl']}s", file=sys.stderr)

    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        _isolate(spark)
        t0 = time.time()
        # count() forces full execution without driver-collecting rows
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr)

    # production 64-bit simhash tier (pytest-verified vs the 32-bit
    # oracle tier; not a queries() entry because DuckDB lacks xxhash64)
    from webcrawler_spark.operators.dedup import simhash64_near_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    _isolate(spark)
    t0 = time.time()
    simhash64_near_pairs(docs, max_hamming=3).count()
    timings["simhash64_near_pairs"] = round(time.time() - t0, 3)

    # SemDeDup scale tier (k-means-clustered pairwise; the queries()
    # entry is the exact n_clusters=1 oracle tier, quadratic by design)
    from pyspark.sql import functions as F

    from webcrawler_spark.operators.semdedup import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    )
    _isolate(spark)
    t0 = time.time()
    semantic_dedup(emb, threshold=0.4, n_clusters=16).count()
    timings["semantic_dedup_k16"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "crawl+analytics wall seconds at sf"
                f"{_sf_of(SF_DIR)} on local[{CPUS}]",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(SF_DIR),
                "crawl": crawl_stats,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
