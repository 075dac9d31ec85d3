"""Analytics-tier scale stress (round-3 verdict ask #4).

The per-round bench times the dedup/cleaning/sketch operators at sf0.1
(5k short docs). This script runs the heavy representatives over the
output of a REAL 240k-page crawl of the 640k-page / ~20 GiB bench
corpus — 48× the docs, ~3000× the bytes — at local[32], and emits one
JSON blob for BENCH.md's BENCH_scale section.

Corpus: ``build_big_web(body_mode="diverse")`` — same page sizes and
crawl cost as the scaling-bench corpus, but per-page unique two-tier
vocabulary text so dedup/sketch/LM operators see realistic shingle
diversity (the default "repeat" filler makes every page one of 97
near-identical classes, which degenerates MinHash into an all-pairs
explosion — a real hazard, handled by candidate-bounding, but not a
useful throughput measurement). 5% of docs get planted exact mirrors
so the dedup tiers have true positives to find.

Usage: python scripts/bench_scale_analytics.py [out.json]
Env:   SPARK_GRAFT_SCALE_DIR   corpus+work dir (default /tmp/bigweb-r04-scale)
       SPARK_GRAFT_SCALE_OPS   comma list to restrict the op set
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

HOSTS = int(os.environ.get("SPARK_GRAFT_SCALE_HOSTS", "16000"))
PAGES_PER_HOST = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "40"))
BODY_KB = int(os.environ.get("SPARK_GRAFT_SCALE_BODY_KB", "32"))
LIMIT = int(os.environ.get("SPARK_GRAFT_SCALE_LIMIT", "240000"))

WORK = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/bigweb-r04-scale")


def get_spark():
    from pyspark.sql import SparkSession

    from webcrawler_spark.session import apply_perf_conf

    spark = (
        apply_perf_conf(
            SparkSession.builder.master("local[32]")
            .appName("scale-analytics")
            .config("spark.driver.memory", "48g")
            # local-mode localCheckpoint of a corpus-sized table books
            # its blocks against task-result accounting; the 1g default
            # aborts the funnel's stage-1 checkpoint at 252k docs
            .config("spark.driver.maxResultSize", "0")
            .config("spark.sql.shuffle.partitions", "64")
            .config("spark.sql.files.maxPartitionBytes", "64m")
            .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
            .config("spark.ui.enabled", "false")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def ensure_corpus(spark) -> str:
    from webcrawler_spark.sources.synthetic_web import build_big_web

    pages_dir = os.path.join(WORK, "pages")
    if not os.path.isdir(pages_dir):
        t0 = time.time()
        df = build_big_web(
            spark,
            num_hosts=HOSTS,
            pages_per_host=PAGES_PER_HOST,
            partitions=64,
            body_kb=BODY_KB,
            body_mode="diverse",
        )
        df.repartition(64, df.url).write.parquet(pages_dir)
        print(f"corpus built in {time.time() - t0:.0f}s", file=sys.stderr)
    return pages_dir


def ensure_docs(spark) -> tuple[str, dict]:
    """Crawl 240k pages, persist the fetched text as a documents-shaped
    table (doc_id, text, lang, source). Returns (docs_dir, crawl_stats)."""
    from pyspark.sql import functions as F

    from webcrawler_spark.engine import CrawlConfig
    from webcrawler_spark.plans.crawl import crawl
    from webcrawler_spark.sources.synthetic_web import big_web_seeds

    docs_dir = os.path.join(WORK, "docs")
    edges_dir = os.path.join(WORK, "edges")
    stats_path = os.path.join(WORK, "crawl_stats.json")
    if (
        os.path.isdir(docs_dir)
        and os.path.isdir(edges_dir)
        and os.path.exists(stats_path)
    ):
        return docs_dir, json.load(open(stats_path))
    pages = spark.read.parquet(ensure_corpus(spark))
    seeds = big_web_seeds(spark, num_hosts=HOSTS, every=1)
    cfg = CrawlConfig(
        limit=LIMIT,
        max_rounds=8,
        collect_metrics=False,
        max_urls_per_host_per_round=50,
        round_window=10.0,
        n_buckets=32,
    )
    t0 = time.time()
    session = crawl(spark, pages, seeds, config=cfg)
    dt = time.time() - t0
    eng = session.engine
    # the REAL crawled host link graph (round-4 verdict ask #4: run
    # the graph loop over it, not a synthetic doc->partner graph)
    from webcrawler_spark.functions.urltools import host_col

    (
        eng.pages_fetched()
        .select(F.col("host").alias("src"), F.explode("links").alias("_l"))
        .select("src", host_col(F.col("_l")).alias("dst"))
        .where((F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .repartition(64)
        .write.mode("overwrite")
        .parquet(edges_dir)
    )
    fetched = eng.pages_fetched().select("url", "host", "text")
    docs = fetched.select(
        F.abs(F.xxhash64("url")).alias("doc_id"),
        F.col("text"),
        F.lit("en").alias("lang"),
        F.col("host").alias("source"),
    )
    # planted exact mirrors: every 20th doc re-appears under a new id,
    # so exact/near dedup have true positives at scale
    docs = docs.unionByName(
        docs.where(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + F.lit(1)).alias("doc_id"),
            "text", "lang", "source",
        )
    )
    docs.repartition(64, "doc_id").write.mode("overwrite").parquet(docs_dir)
    stats = {
        "wall_s": round(dt, 1),
        "pages": eng.state.total_fetched,
        "urls": eng.state.total_attempted,
        "rounds": len(session.history),
        "pages_per_sec": round(eng.state.total_fetched / dt, 1),
    }
    json.dump(stats, open(stats_path, "w"))
    print("crawl:", json.dumps(stats), file=sys.stderr)
    return docs_dir, stats


def _isolate(spark) -> None:
    import gc

    gc.collect()
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    while it.hasNext():
        it.next().unpersist(True)
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark()
    docs_dir, crawl_stats = ensure_docs(spark)
    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()
    total_chars = docs.agg(F.sum(F.length("text"))).first()[0]

    from webcrawler_spark.operators.bpe import (
        init_symbols,
        pair_counts,
        word_freqs,
    )
    from webcrawler_spark.operators.cleaning import (
        c4_line_filter,
        dedup_text_segments,
        gopher_quality_flags,
    )
    from webcrawler_spark.operators.dedup import (
        lsh_candidate_pairs,
        near_duplicate_pairs,
    )
    from webcrawler_spark.operators.graph import duplicate_clusters
    from webcrawler_spark.operators.packing import (
        pack_concat_chunks,
        token_count_col,
    )
    from webcrawler_spark.operators.sketches import (
        cms_registers,
        heavy_hitters,
        hll_registers,
    )
    from webcrawler_spark.operators.textstats import words_col

    import __spark_entry__ as _entry
    from webcrawler_spark.operators.boilerplate import (
        classify_blocks as _classify_blocks,
    )
    from webcrawler_spark.operators.boilerplate import (
        html_blocks as _html_blocks,
    )
    from webcrawler_spark.operators.classifier import (
        hash_features as _hash_features,
    )
    from webcrawler_spark.operators.classifier import (
        lr_score as _lr_score,
    )
    from webcrawler_spark.operators.classifier import (
        lr_train as _lr_train,
    )
    from webcrawler_spark.operators.graph import opic as _opic
    from webcrawler_spark.operators.graph import pagerank as _pagerank
    from webcrawler_spark.operators.langid import fit_nb_langid as _fit_nb
    from webcrawler_spark.operators.langid import nb_langid as _nb_langid
    from webcrawler_spark.sources.cdx import cdx_lines as _raw_cdx_lines
    from webcrawler_spark.sources.cdx import write_cdx as _write_cdx
    from webcrawler_spark.sources.warc import write_warc as _write_warc

    _funnel = _entry._q_pipeline_funnel
    edges_dir = os.path.join(WORK, "edges")

    def edges():
        return spark.read.parquet(edges_dir)

    def _cdx_lines(df):
        return _raw_cdx_lines(
            df.withColumn(
                "warc_ts", F.col("fetch_ts").cast("timestamp")
            ).withColumn("mime", F.col("content_type"))
        )

    def _lr_at_scale(d):
        feats = _hash_features(d)
        labels = d.select(
            F.col("doc_id").alias("id"),
            (
                F.size(
                    F.filter(F.split("text", " "), lambda w: w.startswith("w1"))
                )
                >= 40
            ).cast("double").alias("y"),
        )
        w = _lr_train(feats, labels, n_iter=3, lr=1.0)
        return _lr_score(feats, w).count()

    def words():
        return docs.select(
            "source", F.explode(words_col(F.col("text"))).alias("term")
        )

    def lined():
        # the diverse corpus carries natural sentence terminals every
        # 12 words ("... w11."), so line structure is one LINEAR regex
        # pass (a slice-per-line reconstruction like _lined_docs would
        # be O(words²) per doc — measured pathological at 4k words)
        return docs.select(
            "doc_id",
            F.regexp_replace("text", r"\. ", ".\n").alias("text"),
        )

    OPS = {
        "exact_dedup_keeper": lambda: docs.withColumn("dig", F.md5("text"))
        .groupBy("dig")
        .agg(F.min("doc_id"))
        .count(),
        # 1-row bands (the oracle tier) admit ~bands·J background
        # candidates — measured 4.5M junk pairs at this corpus (J
        # ~2e-4 between unrelated diverse-vocab docs), whose verify
        # join dwarfs the real work. rows_per_band=3 is the production
        # S-curve setting: background collision J³≈1e-11, true dups
        # J≈1 still certain.
        "minhash_lsh_candidates": lambda: lsh_candidate_pairs(
            docs.select("doc_id", "text")
        ).count(),
        "minhash_lsh_candidates_r3": lambda: lsh_candidate_pairs(
            docs.select("doc_id", "text"), rows_per_band=3
        ).count(),
        # round-4 verdict ask #2: the Arrow signature tier (one
        # mapInPandas pass, no 5e8-row explode->aggregate) vs the md5
        # tier above — the headline ≥2x claim is r3_arrow vs r3
        "minhash_lsh_candidates_r3_arrow": lambda: lsh_candidate_pairs(
            docs.select("doc_id", "text"),
            rows_per_band=3,
            signature_tier="arrow",
        ).count(),
        "near_dup_pipeline": lambda: near_duplicate_pairs(
            docs.select("doc_id", "text"), threshold=0.5, rows_per_band=3
        ).count(),
        "near_dup_pipeline_arrow": lambda: near_duplicate_pairs(
            docs.select("doc_id", "text"),
            threshold=0.5,
            rows_per_band=3,
            signature_tier="arrow",
        ).count(),
        # both Arrow tiers: zero-shuffle signatures AND in-row verify
        # (no shingle explode anywhere in the pipeline)
        "near_dup_pipeline_arrow_full": lambda: near_duplicate_pairs(
            docs.select("doc_id", "text"),
            threshold=0.5,
            rows_per_band=3,
            signature_tier="arrow",
            verify_tier="arrow",
        ).count(),
        "duplicate_clusters": lambda: duplicate_clusters(
            docs.select("doc_id", "text"),
            threshold=0.5,
            rows_per_band=3,
            signature_tier="arrow",
        ).count(),
        "segment_dedup": lambda: dedup_text_segments(
            docs.select("doc_id", "text"), words_per_segment=8, max_dupes=1
        ).count(),
        "c4_gopher_funnel": lambda: (
            lambda c4: c4.where("keep")
            .select("doc_id", F.regexp_replace("clean_text", "\n", " ").alias("text"))
            .join(
                gopher_quality_flags(
                    c4.where("keep").select(
                        "doc_id",
                        F.regexp_replace("clean_text", "\n", " ").alias("text"),
                    ),
                    min_words=50,
                    max_words=100000,
                    min_avg_word_len=1.0,
                    max_avg_word_len=20.0,
                    max_symbol_ratio=0.2,
                    min_stopword_hits=0,
                    max_dup_2gram_ratio=0.8,
                ).where("keep").select("doc_id"),
                "doc_id",
            )
            .count()
        )(c4_line_filter(lined(), min_words=3)),
        # k=200: the diverse vocab's 100-word head carries ~0.7% of
        # tokens each, so the exact >n/(k+1) bar must sit under that
        "heavy_hitters": lambda: heavy_hitters(
            words().select("term"), "term", k=200
        ).count(),
        "hll_registers": lambda: hll_registers(
            words(), "term", key="source"
        ).count(),
        "cms_registers": lambda: cms_registers(
            words().select("term"), "term"
        ).count(),
        "bpe_pair_counts": lambda: pair_counts(
            init_symbols(word_freqs(docs, text_col="text"))
        ).count(),
        "pack_chunks": lambda: pack_concat_chunks(
            docs.select(
                "doc_id", token_count_col("text").cast("long").alias("n_tokens")
            ),
            seq_len=2048,
        ).count(),
        # ---- round-4 verdict ask #4: the remaining tiers ------------
        # graph loop over the REAL crawled link graph
        "host_pagerank": lambda: _pagerank(edges(), n_iter=5).count(),
        "opic_importance": lambda: _opic(edges(), n_iter=5).count(),
        # langid: fit on the even half, predict the whole corpus.
        # max_chars=2000 is the production prefix cap (fastText/CLD
        # practice) — language ID saturates in 1-2 KB, and grams over
        # the full 25 KB pages would be pure waste
        "nb_langid_train_predict": lambda: (
            lambda mp: _nb_langid(docs, mp[0], mp[1], max_chars=2000).count()
        )(
            _fit_nb(
                docs.where(F.col("doc_id") % 2 == 0),
                max_vocab=300,
                max_chars=2000,
            )
        ),
        # LR quality classifier: hashed features, 3 GD iterations,
        # synthetic label = 'has >= 2 common-word hits'
        "lr_quality_train_predict": lambda: _lr_at_scale(docs),
        # jusText boilerplate over the raw corpus html (126k subset)
        "justext_blocks": lambda: _classify_blocks(
            _html_blocks(
                spark.read.parquet(ensure_corpus(spark))
                .where(~F.col("url").endswith("/robots.txt"))
                .limit(126000)
                .select(
                    F.xxhash64("url").alias("doc_id"),
                    F.col("html").cast("string").alias("html"),
                )
            )
        ).count(),
        # WARC / WET / CDX sinks at corpus scale: write + manifest
        "warc_sink": lambda: _write_warc(
            docs.select(
                F.concat(F.col("source"), F.lit("/d"), F.col("doc_id")).alias("url"),
                F.lit(200).alias("status"),
                F.lit("text/html").alias("content_type"),
                F.encode("text", "utf-8").alias("payload"),
            ),
            os.path.join(WORK, "warc_out"),
        ).count(),
        "cdx_sink": lambda: _write_cdx(
            _cdx_lines(
                docs.select(
                    F.concat(
                        F.col("source"), F.lit("/d"), F.col("doc_id")
                    ).alias("url"),
                    F.lit(200).alias("status"),
                    F.lit("text/html").alias("content_type"),
                    F.encode("text", "utf-8").alias("payload"),
                    F.lit(1.7e9).alias("fetch_ts"),
                )
            ),
            os.path.join(WORK, "cdx_out"),
        ).count(),
        # the eleven-stage funnel, approx quality tier (verdict ask #5)
        "pipeline_funnel_approx": lambda: (
            _funnel(
                spark, None, quality_tier="approx",
                docs_df=docs, lined_df=lined(),
                # retuned to the 4k-word crawl-page shape (the sf
                # defaults would cut every doc at max_words=80)
                gopher_overrides=dict(
                    min_words=50, max_words=100000,
                    min_avg_word_len=1.0, max_avg_word_len=20.0,
                    max_symbol_ratio=0.2, min_stopword_hits=0,
                    max_dup_2gram_ratio=0.8,
                ),
                neardup_overrides=dict(
                    rows_per_band=3,
                    signature_tier="arrow",
                    verify_tier="arrow",
                ),
            ).first()["n_mix"]
        ),
    }
    only = os.environ.get("SPARK_GRAFT_SCALE_OPS")
    if only:
        keep = set(only.split(","))
        ops = {k: v for k, v in OPS.items() if k in keep}
    else:
        ops = OPS

    results = {}
    for name, fn in ops.items():
        _isolate(spark)
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        results[name] = {"sec": round(dt, 1), "rows": rows}
        print(f"{name}: {dt:.1f}s rows={rows}", file=sys.stderr)

    out = {
        "corpus": {
            "hosts": HOSTS,
            "pages_per_host": PAGES_PER_HOST,
            "body_kb": BODY_KB,
            "body_mode": "diverse",
            "crawl_limit": LIMIT,
        },
        "docs": {"n_docs": n_docs, "total_chars": total_chars},
        "crawl": crawl_stats,
        "operators": results,
    }
    line = json.dumps(out)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
