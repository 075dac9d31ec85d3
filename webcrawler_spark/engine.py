"""Batch-iterative crawl engine: one Spark job per round (SURVEY.md §3.2).

This is the PySpark-native replacement for the reference's 80 threads +
locks + mailboxes (Crawler.py / Worker.py / WorkersPipeline.py): a
driver-side round loop over five snapshot tables. Every cross-worker
interaction of the reference is a shuffle here; every lock is gone.

Scheduling semantics implemented (citations → /root/reference/):

* W1 host order   — (priority, host) min-first          Worker.py:49,227-228
* W2 priorities   — first host 0; new hosts (max-min)/2; re-queued
                    hosts last_fetch + delay             Worker.py:119-147
* W3 per-host FIFO — discovered_seq order                Host.py:59-69
* W4 politeness   — delay law 0.1/verbatim/3.0 clamp     Host.py:95-114
* F1-F8 gates, J1-J3 joins, A1-A5 aggregates             SURVEY.md §2
* seen = every URL ever popped (attempted), not fetched  Worker.py:202

Virtual clock: all politeness is computed in *virtual seconds* with
native window arithmetic (no sleeps, no wall clock), which makes runs
deterministic and lets the offline bench crank through simulated hours
in wall-clock seconds. A live deployment flips ``live_politeness`` to
sleep inside the applyInPandas fetch executor instead (same law).

Determinism contract (§5.3): with ``sequential_parity_mode()`` config
(one host, one URL per round) the engine reproduces the reference
simulator's total attempt order exactly; in full-parallel BSP mode the
fetch SET, per-host FIFO order, per-host counts, and extracted text
are exact, and the politeness law holds per host in virtual time.

Scale design (10^10 URLs, 1000 executors):
* frontier/seen are bucketed by ``pmod(xxhash64(host), n_buckets)`` —
  the J1 anti-join, the W3 window, and the host_state join all shuffle
  on host, so one well-chosen layout serves every stage (O3/O12).
* the scheduling table is SLIM (host, delay, priority, ever_popped) and
  broadcast (J2, O4) behind a size gate (O13) that falls back to a
  shuffle-hash join; robots bodies live in an append-only host_robots
  table joined per-wave only. pages gate-join reads only
  (url, status, content_type) and the html column is joined *only for
  fetched rows* — the reference's HEAD-before-GET two-phase fetch
  becomes column pruning (O2).
* the seen anti-join takes the partitioned-Bloom pre-pass (O5) when
  ``use_bloom``; mega-host skew is broken by two-phase salted FIFO
  selection (O9) when ``salt_n > 1``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webcrawler_spark.functions.parse import parse_page_udf
from webcrawler_spark.functions.robots import (
    MAX_DELAY_SECONDS,
    MIN_DELAY_SECONDS,
    clamp_delay,
    parse_robots,
    robots_allowed_udf,
)
from webcrawler_spark.functions.urltools import (
    extension_filter_col,
    host_col,
    normalize_url_udf,
    resource_col,
)
from webcrawler_spark.operators.bloom import anti_join_with_bloom
from webcrawler_spark.operators.prefix import attach_prefix_count
from webcrawler_spark.simulator import VIRTUAL_CLOCK_START
from webcrawler_spark.sparkutil import checkpoint, free
from webcrawler_spark.tables import MemoryCatalog, ParquetCatalog

SEQ_STRIDE = 1 << 40  # per-round discovered_seq base; FIFO across rounds


def _join_jobs(*thunks):
    """Run independent Spark actions from concurrent driver threads.

    Spark's scheduler accepts jobs from any driver thread; small
    bookkeeping writes (seen append, host_state overwrite) rarely fill
    the executor slots, so overlapping them with the round's big job
    removes their full wall-clock cost instead of serializing ~1s of
    fixed latency per table per round. Results keep argument order;
    the first raised exception propagates after all jobs settle."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


@dataclass
class CrawlConfig:
    limit: Optional[int] = None          # A1 page budget (-n)
    max_rounds: Optional[int] = None     # safety valve
    hosts_per_round: Optional[int] = None  # None = all schedulable hosts
    max_urls_per_host_per_round: int = 50
    round_window: float = 3.0            # virtual seconds per round (W4 budget)
    n_buckets: int = 8                   # host-hash bucket count (O12)
    use_bloom: bool = False              # O5 seen pre-filter
    # O5 variant selector: None defers to use_bloom; "bloom" | "cuckoo"
    # pick the probabilistic pre-pass (cuckoo supports deletion —
    # operators/cuckoo.py — for revisit policies); both are routing
    # accelerators over the same exact anti-join semantics.
    seen_filter: Optional[str] = None
    salt_n: int = 1                      # O9 two-phase FIFO selection fan
    # trap filtering (opt-in; default OFF preserves reference-ordering
    # parity): drop hosts whose fetched content is mostly duplicate —
    # the Mercator/IRLbot crawler-trap signal (operators/traps.py),
    # tracked cumulatively via mergeable per-host HLL digest sketches
    # (operators/sketches.py — 256 registers/host, bounded state at any
    # crawl length). A flagged host's frontier rows are removed at the
    # next round's read and never scheduled again.
    trap_filter: bool = False
    trap_min_urls: int = 20              # flag only after this many fetches
    trap_dup_threshold: float = 0.5      # flag when dup fraction ≥ this
    # sitemap seeding (opt-in; default OFF preserves reference-ordering
    # parity — the reference discovers URLs only from anchors,
    # Parser.py:56-66): at init each seed host's /sitemap.xml, when the
    # corpus has one, is parsed (functions/sitemap.py) and its <loc>
    # entries join the round-0 frontier at depth 1, FIFO-after the
    # seeds. Robots, extension, and seen gates still apply to them at
    # scheduling time like any discovered link.
    use_sitemaps: bool = False
    # URL-level filtering (opt-in; default OFF preserves reference
    # parity — the reference's only URL gate is the extension
    # blocklist, Parser.py:18-24): discovered links whose host is a
    # listed domain (or any subdomain of one), or whose URL's weighted
    # bad-word score reaches the threshold, never enter the frontier —
    # the RefinedWeb §2.1 pre-fetch cut (operators/urlfilter.py). Both
    # gates compile to pure codegen expressions (literal-array
    # arrays_overlap over the ancestor-domain chain; a fixed when-sum)
    # so the link path gains zero joins and zero shuffles. For
    # UT1-scale million-row blocklists use the operator's join form on
    # the corpus instead of this config list.
    url_blocklist: Optional[list] = None
    url_word_weights: Optional[dict] = None
    url_word_threshold: float = 1.0
    # W2 generalized — importance-aware host scheduling (opt-in;
    # default "fifo" preserves reference-ordering parity byte-for-byte,
    # Worker.py:49/227-228 has no importance signal). When a round is
    # host-limited (hosts_per_round), the W1 host order becomes
    # (rank_score DESC, priority, host):
    #   "pagerank" | "opic" — every priority_refresh_rounds rounds the
    #     engine rebuilds a (host, rank_score) table by running the
    #     public algorithm over the ACCUMULATED crawled link graph
    #     (pages_fetched src-host → link-host edges, operators/graph);
    #   "recrawl" — Cho–Garcia-Molina staleness (operators/recrawl):
    #     hosts whose pages are oldest/most-changed rank first.
    # Hosts absent from the rank table (not yet linked-to) sort after
    # every ranked host, FIFO among themselves. Scale note: refresh
    # cost is one scan of pages_fetched's links every k rounds; at
    # 10^10 pages a deployment appends a per-round host-edge delta
    # table instead and ranks over that (same operators, incremental
    # input) — the rank loop itself is the bucketed per-iteration
    # shuffle audited in operators/graph.
    priority_mode: str = "fifo"
    priority_refresh_rounds: int = 4
    priority_rank_iters: int = 5
    collect_metrics: bool = True         # S7 per-round metrics table
    agent: str = "*"                     # Host.py:9
    # W4 executor: "native" = window-arithmetic virtual clock (codegen,
    # default); "apply_in_pandas" = grouped-map per-host executor — the
    # shape a LIVE crawler needs, where the group function can actually
    # time.sleep between fetches (live_politeness) and call out to the
    # network. Both produce identical timestamps (tested).
    fetch_executor: str = "native"
    live_politeness: bool = False        # real sleeps inside the group fn
    # LIVE transport plug (sources/transport.py): an object exposing
    # head(url) / get(url) per the reference's access contract
    # (WebAccesser.py:35-100). When set, the round's HEAD probe (S3)
    # and GET fetch (S4) happen INSIDE the per-host applyInPandas
    # executor through this object instead of the offline corpus
    # joins; FakeTransport(corpus) reproduces the offline crawl
    # byte-for-byte (tests/test_live_fetch.py), Urllib3Transport is
    # the real-network client. Must be picklable (ships to executors).
    transport: Optional[Any] = None
    # O7: bounded output files per snapshot — the WARC 1,000-records
    # rotation analog (WarcFileSave.py:9). 0 = let Spark size files;
    # the CLI sets 1000 for reference-parity output layout.
    records_per_file: int = 0
    # compact the delta-accumulating tables (seen, host_robots) every
    # N rounds (0 = never): bounds the delta fan-in the J1 anti-join /
    # per-wave robots join must read on very long crawls
    compact_seen_every: int = 16
    # snapshot-retention GC (durable catalogs only, 0 = keep forever):
    # after each compaction, expire manifest rounds older than the
    # newest N and delete data dirs referenced only by them — bounds
    # disk and manifest size on thousand-round crawls while keeping N
    # rounds of time travel / resume points (tables.ParquetCatalog.gc)
    gc_keep_rounds: int = 0
    # O13: max rows on the small side of a wave join before the engine
    # stops broadcasting it and falls back to a shuffle-hash join. A
    # round wave is hosts × max_urls_per_host_per_round and is unbounded
    # at 10^10-URL scale; past this cap a broadcast would exceed driver/
    # executor memory and fail the round. 0 forces the fallback path
    # everywhere (used by the equivalence test).
    wave_broadcast_max_rows: int = 4_000_000

    @staticmethod
    def sequential_parity_mode(limit: Optional[int] = None) -> "CrawlConfig":
        """One (priority,host)-min host, one URL, per round — the exact
        discrete-event order of the reference heap (SURVEY.md §5.3)."""
        return CrawlConfig(
            limit=limit, hosts_per_round=1, max_urls_per_host_per_round=1
        )


@dataclass
class CrawlState:
    """The driver scalars the reference kept under locks
    (WorkersPipeline.py:24-26) — tiny, JSON-serializable, checkpointed
    into the catalog manifest each round."""

    round: int = 0
    clock: float = VIRTUAL_CLOCK_START
    curr_min: Optional[float] = None     # None ⇒ +inf (Worker.py:50)
    curr_max: float = 0.0
    total_fetched: int = 0
    total_attempted: int = 0
    total_hosts: int = 0                 # drives the O13 scheduling-join gate
    first_host_assigned: bool = False
    done: bool = False
    # W2 medium priority snapshot for hosts discovered last round:
    # in the reference, a new host's medium is computed at add_link
    # time (Worker.py:144-147), interleaved with any revive bumps of
    # currMaxDelay from earlier links in the same loop
    # (Worker.py:128-132). Round-granular approximation: pending_medium
    # carries the pre-bump value across the round boundary. (The
    # post-fetch re-push, Worker.py:199-200, never bumps currMax.)
    pending_medium: Optional[float] = None
    # row count of the committed frontier snapshot, observed for free
    # on the overwrite (Observation API) — makes the D4 quiescence
    # check a dict lookup instead of a per-round isEmpty() job.
    # None ⇒ unknown (fresh init / pre-upgrade manifest): fall back to
    # isEmpty() once.
    frontier_rows: Optional[int] = None
    # frontier rows whose host had NOT been admitted (host_state) when
    # the snapshot was written — observed for free on the same
    # overwrite. 0 ⇒ next round's S2 robots admission is provably a
    # no-op and its joins/UDF/delta-write jobs are skipped (in steady
    # state, rounds discover no new hosts). None ⇒ unknown (fresh
    # init / pre-upgrade manifest): run admission, which is always
    # safe.
    pending_new_hosts: Optional[int] = None

    def to_json(self) -> dict:
        return self.__dict__.copy()

    @staticmethod
    def from_json(d: dict) -> "CrawlState":
        s = CrawlState()
        s.__dict__.update(d)
        return s

    @property
    def medium_priority(self) -> float:
        """W2 new-host priority: max(0,(currMax-currMin)/2), -inf-safe
        (Worker.py:143-147 with Worker.py:50-51 initial values)."""
        if self.curr_min is None:
            return 0.0
        return max(0.0, (self.curr_max - self.curr_min) / 2)


# scheduling state is SLIM (no robots bodies): it is broadcast into the
# frontier join every round, and at 10^8 hosts a broadcast carrying
# every robots.txt ever fetched would be the engine's scale-killer.
_HOST_STATE_SCHEMA = (
    "host string, delay double, priority double, ever_popped boolean"
)
# immutable per-host admission record, append-only (one delta per round
# holding only that round's NEW hosts): robots verdict + body + the
# initial priority. Bodies are joined back per-wave, never broadcast
# wholesale.
_HOST_ROBOTS_SCHEMA = (
    "host string, robots_ok boolean, robots_body string, delay double,"
    " priority double"
)
_FRONTIER_SCHEMA = (
    "url string, host string, resource string, bucket int, depth int,"
    " discovered_seq long"
)
_SEEN_SCHEMA = (
    "url string, host string, bucket int, fetched boolean, round int,"
    " attempt_ts double, discovered_seq long"
)
# trap-filter state (only written when cfg.trap_filter): per-host HLL
# registers of content digests (xxhash64 production tier — bucket is a
# bigint pmod) and per-host fetched counts; both append one small delta
# per round and are merge-compacted on the compact_seen_every cadence.
_HOST_DIGESTS_SCHEMA = "host string, bucket bigint, rho int"
_HOST_FETCH_N_SCHEMA = "host string, n long"


class CrawlEngine:
    """Driver loop + per-round job over catalog tables."""

    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        catalog=None,
        config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.cfg = config or CrawlConfig()
        self.cat = catalog if catalog is not None else MemoryCatalog(spark)
        self.state = CrawlState()
        # O2 column pruning: the gate join never touches html
        self.pages_meta = pages.select("url", "status", "content_type")
        self.pages_html = pages.select("url", "html")
        self.pages_robots = (
            pages.select("url", "html", "status")
            .filter(F.col("url").endswith("/robots.txt"))
        )
        self._robots_side = None  # materialized lazily, once per session
        self._robots_side_thread = None  # background materialization (init overlap)
        # priority_mode rank table: derived state, recomputed every
        # priority_refresh_rounds (and from scratch after a resume —
        # it is a pure function of the committed pages_fetched table,
        # so it is deliberately NOT checkpointed)
        self._rank_df: Optional[DataFrame] = None
        self._rank_round: int = -(10**9)

    # ------------------------------------------------------------------
    # setup / resume
    # ------------------------------------------------------------------
    _TRACE = bool(__import__("os").environ.get("WCSPARK_TRACE"))

    def _t(self, label: str, t0: float) -> float:
        import time as _time

        now = _time.time()
        if self._TRACE:
            print(
                f"    [trace] {label}: {now - t0:.2f}s @{now % 100000:.2f}",
                flush=True,
            )
        return now

    def _bucket(self, host: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(host), F.lit(self.cfg.n_buckets)).cast("int")

    def _wave_join(
        self, big: DataFrame, small: DataFrame, on, how: str, n_small: int
    ) -> DataFrame:
        """O13 size-gated wave join: broadcast the small (wave) side
        while it fits, else shuffle-hash. The corpus side is the big
        side either way — it is never collected to the driver, and in
        the fallback it hash-shuffles once on the join key (AQE handles
        skew) instead of failing an over-limit broadcast."""
        if n_small > self.cfg.wave_broadcast_max_rows:
            return big.join(small.hint("shuffle_hash"), on, how)
        return big.join(F.broadcast(small), on, how)

    def _politeness_apply_in_pandas(self, sel: DataFrame, t_round: float) -> DataFrame:
        """W4 as a grouped-map executor (north_star shape): one pandas
        group per host runs its FIFO serially, assigning attempt
        timestamps under the politeness law — and, in live mode,
        actually sleeping out the delays (Worker.py:209-216). The
        virtual-time math is identical to the native window path.

        Skew note (O9): a mega-host group is bounded by the per-round
        budget (max_urls_per_host_per_round), so no group exceeds
        budget rows regardless of frontier skew.
        """
        from pyspark.sql.types import DoubleType, StructField, StructType

        out_schema = StructType(
            list(sel.schema.fields) + [StructField("attempt_ts", DoubleType())]
        )
        live = self.cfg.live_politeness

        def run_host(pdf: pd.DataFrame) -> pd.DataFrame:
            import time as _time

            pdf = pdf.sort_values("rn_host").reset_index(drop=True)
            start = max(t_round, float(pdf["priority"].iloc[0]))
            delay = float(pdf["delay"].iloc[0])
            ts, consumed = [], 0
            for sa in pdf["should_access"]:
                t = start + consumed * delay
                ts.append(t)
                if bool(sa):
                    if live:
                        wait = t - _time.time()
                        if wait > 0:
                            _time.sleep(min(wait, 30.0))
                    consumed += 1
            pdf["attempt_ts"] = ts
            return pdf

        return sel.groupBy("host").applyInPandas(run_host, out_schema)

    def _fetch_apply_in_pandas_live(
        self, sel: DataFrame, t_round: float
    ) -> DataFrame:
        """S3/W4/S4 fused as a LIVE grouped-map executor (the
        north_star plug point): each per-host pandas group walks its
        FIFO and, per row, performs the HEAD probe, the politeness
        wait, and the GET through ``cfg.transport`` (the reference's
        access contract, WebAccesser.py:35-100) instead of the offline
        corpus joins.

        Column semantics mirror the offline path exactly — head miss
        (transport returns None) == corpus miss (F5), 'text/html'
        content gate (F3, WebAccesser.py:100), 2xx gate (F4,
        WebAccesser.py:92-96), and the identical virtual-clock
        politeness law — so a FakeTransport over the same corpus
        yields a byte-identical crawl (tests/test_live_fetch.py).
        ``live_politeness=True`` additionally sleeps the delays out in
        wall time (Worker.py:209-216).

        Skew note (O9): one pandas group per host, bounded by the
        per-round budget, so no group exceeds budget rows; hosts fan
        out across executors like every other host-keyed stage.
        """
        from pyspark.sql.types import (
            BinaryType,
            BooleanType,
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        out_schema = StructType(
            list(sel.schema.fields)
            + [
                StructField("status", LongType()),
                StructField("content_type", StringType()),
                StructField("head_ok", BooleanType()),
                StructField("should_access", BooleanType()),
                StructField("fetched", BooleanType()),
                StructField("attempt_ts", DoubleType()),
                StructField("html", BinaryType()),
            ]
        )
        transport = self.cfg.transport
        live = self.cfg.live_politeness

        def run_host(pdf: pd.DataFrame) -> pd.DataFrame:
            import time as _time

            pdf = pdf.sort_values("rn_host").reset_index(drop=True)
            start = max(t_round, float(pdf["priority"].iloc[0]))
            delay = float(pdf["delay"].iloc[0])
            consumed = 0
            cols: dict[str, list] = {
                "status": [], "content_type": [], "head_ok": [],
                "should_access": [], "fetched": [], "attempt_ts": [],
                "html": [],
            }
            for row in pdf.itertuples(index=False):
                gate = bool(row.allowed) and bool(row.ext_ok)    # F1/F2
                status: int | None = None
                ct: str | None = None
                head_ok = False
                if gate:
                    h = transport.head(row.url)                  # S3
                    if h is not None:
                        status, ct = int(h[0]), h[1]
                        head_ok = ct is not None and "text/html" in ct  # F3
                should = gate and head_ok                        # F5 via None
                t = start + consumed * delay                     # W4
                body = None
                fetched = False
                if should:
                    if live:
                        wait = t - _time.time()
                        if wait > 0:
                            _time.sleep(min(wait, 30.0))
                    consumed += 1
                    if 200 <= status < 300:                      # F4
                        g = transport.get(row.url)               # S4
                        if g is not None:
                            status, ct, body = int(g[0]), g[1], g[2]
                            fetched = True
                cols["status"].append(status)
                cols["content_type"].append(ct)
                cols["head_ok"].append(head_ok)
                cols["should_access"].append(should)
                cols["fetched"].append(fetched)
                cols["attempt_ts"].append(t)
                cols["html"].append(body)
            for name, vals in cols.items():
                pdf[name] = pd.Series(vals, dtype="object")
            return pdf

        return sel.groupBy("host").applyInPandas(run_host, out_schema)

    def init_from_seeds(self, seeds: DataFrame) -> None:
        """S1/D1: seeds (url, seed_order) → round-0 frontier."""
        # overlap the corpus-side robots scan with the seed write: both
        # feed round 1, and neither depends on the other
        self._start_robots_side_async()
        fr = (
            seeds.select(
                normalize_url_udf("url").alias("url"),
                F.col("seed_order").cast("long").alias("discovered_seq"),
            )
            .withColumn("host", host_col(F.col("url")))
            .withColumn("resource", resource_col(F.col("url")))
            .filter(F.col("host") != "")                      # F8
            .dropDuplicates(["url"])                          # A5
            .withColumn("bucket", self._bucket(F.col("host")))
            .withColumn("depth", F.lit(0))
            .select(
                "url", "host", "resource", "bucket", "depth", "discovered_seq"
            )
        )
        if self.cfg.use_sitemaps:
            fr = fr.unionByName(self._sitemap_seeds(fr))
        self.cat.overwrite("frontier", fr.repartition("bucket"))
        empty = self.spark.createDataFrame([], _SEEN_SCHEMA)
        self.cat.register_empty("seen", empty)
        self.cat.register_empty(
            "host_state", self.spark.createDataFrame([], _HOST_STATE_SCHEMA)
        )
        self.cat.register_empty(
            "host_robots", self.spark.createDataFrame([], _HOST_ROBOTS_SCHEMA)
        )
        # registered even when trap_filter is off (job-free) so a crawl
        # resumed with the flag toggled finds the tables in the manifest
        self.cat.register_empty(
            "host_digests", self.spark.createDataFrame([], _HOST_DIGESTS_SCHEMA)
        )
        self.cat.register_empty(
            "host_fetch_n", self.spark.createDataFrame([], _HOST_FETCH_N_SCHEMA)
        )
        self.state = CrawlState()
        self.cat.commit_round(-1, self.state.to_json())

    def _sitemap_seeds(self, fr: DataFrame) -> DataFrame:
        """Sitemap-advertised URLs for the seed hosts (opt-in S1 source,
        sitemaps.org protocol; no reference analog — the reference
        follows anchors only).

        Discovery (both halves of the public protocol):
          1. ``Sitemap:`` directives in each seed host's robots.txt
             (functions/sitemap.extract_robots_sitemaps) — the spec's
             canonical advertisement channel, so custom paths like
             ``/maps/news.xml`` are found;
          2. the well-known ``/sitemap.xml`` path as a fallback probe
             (what crawlers try when robots advertises nothing).
        Fetched files that are sitemap INDEXES (``<sitemap>`` blocks)
        are followed one level to their child files — the spec forbids
        deeper nesting, so one hop is complete.

        Plan shape: three pushed-filter corpus scans at init (suffix
        scan for the well-known path; url equi-joins against BROADCASTs
        of the advertised / child URL sets, which are bounded by
        seed-host count × directives-per-file) — the corpus itself
        never shuffles. Entries normalize and in-batch dedup exactly
        like extracted links (P1/A5), anti-join the seeds, and enter
        the frontier at depth 1 with discovered_seq offset 2^20 so each
        host's FIFO is: seeds first, then sitemap entries ordered by
        (file url, file position) (seed lists are assumed < 2^20 rows;
        round-1 discoveries start at 2^40).
        """
        from webcrawler_spark.functions.sitemap import (
            extract_robots_sitemaps,
            extract_sitemap_urls,
        )

        seed_hosts = fr.select(F.col("host").alias("sm_host")).distinct()
        xml_pages = self.pages_html.select(
            "url", F.col("html").cast("string").alias("xml")
        )

        # -- discovery: robots `Sitemap:` lines + well-known path -----
        robots = self.pages_robots.select(
            host_col(F.col("url")).alias("sm_host"),
            F.col("html").cast("string").alias("robots_body"),
        ).join(F.broadcast(seed_hosts), "sm_host")
        advertised = (
            extract_robots_sitemaps(robots, robots_col="robots_body", id_col="sm_host")
            .select(normalize_url_udf(F.col("sitemap_url")).alias("sm_url"))
            .filter(F.col("sm_url") != "")
            .distinct()
        )
        wellknown = (
            self.pages_html.filter(F.col("url").endswith("/sitemap.xml"))
            .select(host_col(F.col("url")).alias("sm_host"), F.col("url"))
            .join(F.broadcast(seed_hosts), "sm_host")
            .select("url")
        )
        level0 = xml_pages.join(
            F.broadcast(
                advertised.select(F.col("sm_url").alias("url"))
                .unionByName(wellknown)
                .distinct()
            ),
            "url",
        ).select(F.col("url").alias("sm_url"), "xml")

        # -- index recursion (exactly one hop, per spec) ---------------
        child_urls = (
            extract_sitemap_urls(level0, xml_col="xml", id_col="sm_url", block="sitemap")
            .select(normalize_url_udf(F.col("loc")).alias("url"))
            .filter(F.col("url") != "")
            .distinct()
            .join(level0.select(F.col("sm_url").alias("url")), "url", "left_anti")
        )
        children = xml_pages.join(F.broadcast(child_urls), "url").select(
            F.col("url").alias("sm_url"), "xml"
        )
        sm_pages = level0.unionByName(children)

        entries = extract_sitemap_urls(sm_pages, xml_col="xml", id_col="sm_url")
        cand = (
            entries.select(
                "sm_url", "pos", normalize_url_udf(F.col("loc")).alias("url")
            )
            .withColumn("host", host_col(F.col("url")))
            .withColumn("resource", resource_col(F.col("url")))
            .filter(F.col("host") != "")                              # F8
        )
        w_first = Window.partitionBy("url").orderBy("sm_url", "pos")
        cand = (
            cand.withColumn("_rn", F.row_number().over(w_first))      # A5
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .join(fr.select("url"), "url", "left_anti")
        )
        w_disc = Window.partitionBy("host").orderBy("sm_url", "pos", "url")
        return cand.select(
            "url",
            "host",
            "resource",
            self._bucket(F.col("host")).alias("bucket"),
            F.lit(1).alias("depth"),
            (F.lit(1 << 20) + F.row_number().over(w_disc))
            .cast("long")
            .alias("discovered_seq"),
        )

    def _url_filter_gate(self, links: DataFrame) -> DataFrame:
        """Opt-in RefinedWeb-style URL cut on discovered links (see
        CrawlConfig.url_blocklist / url_word_weights): both rules are
        pure whole-stage-codegen filters — the blocklist is a literal
        array checked with arrays_overlap against the link host's
        ancestor-domain chain, the word score a fixed when-sum — so the
        link-admission plan gains zero joins and zero shuffles."""
        from webcrawler_spark.operators.urlfilter import (
            ancestor_domains,
            word_score_col,
        )

        cfg = self.cfg
        out = links
        if cfg.url_word_weights:
            out = out.filter(
                word_score_col(F.col("url"), cfg.url_word_weights)
                < F.lit(float(cfg.url_word_threshold))
            )
        if cfg.url_blocklist:
            bl = F.array(*[F.lit(d.lower()) for d in cfg.url_blocklist])
            bare = F.substring_index(F.col("host"), "://", -1)
            out = out.filter(~F.arrays_overlap(ancestor_domains(bare), bl))
        return out

    def resume(self) -> None:
        """North_rule resumption: state scalars come back from the
        manifest; tables come back as the last committed snapshot."""
        st = self.cat.load_state()
        if st is None:
            raise ValueError("catalog has no committed state to resume from")
        self.state = CrawlState.from_json(st)

    # ------------------------------------------------------------------
    # robots for newly-discovered hosts (S2, lazy per host)
    # ------------------------------------------------------------------
    def _materialize_robots_side(self) -> None:
        self._robots_side = checkpoint(
            self.pages_robots.select(
                F.expr(
                    "substring(url, 1, length(url) - length('/robots.txt'))"
                ).alias("host"),
                F.col("html").alias("robots_html"),
                F.col("status").alias("robots_status"),
            )
        )

    def _ensure_robots_side(self) -> None:
        """Join the background materialization if one is in flight;
        otherwise materialize inline. A failed background attempt falls
        back to the inline path (robots_side is still None then)."""
        t = self._robots_side_thread
        if t is not None:
            t.join()
            self._robots_side_thread = None
        if self._robots_side is None:
            self._materialize_robots_side()

    def _start_robots_side_async(self) -> None:
        """Kick the robots side-table scan off on a driver thread so it
        overlaps init's seed-frontier write. The scan depends only on
        the corpus, not on seeds or crawl state, and round 1's S2
        admission is its first consumer — without the overlap its full
        wall sits on the round-1 critical path (measured 4-7 s of the
        11 s round-1 pre-cand at the 640k-page bench corpus). Spark
        supports concurrent job submission from driver threads; errors
        are swallowed here and the consumer retries inline."""
        if self._robots_side is not None or self._robots_side_thread is not None:
            return
        import threading

        def _run() -> None:
            try:
                self._materialize_robots_side()
            except Exception:  # consumer retries inline via _ensure
                self._robots_side = None

        t = threading.Thread(
            target=_run, name="robots-side-materialize", daemon=True
        )
        t.start()
        self._robots_side_thread = t

    def _trap_hosts(self) -> Optional[DataFrame]:
        """(host) rows currently flagged as crawler traps: at least
        ``trap_min_urls`` pages fetched and an HLL-estimated distinct-
        content fraction ≤ 1 − ``trap_dup_threshold`` (the cumulative
        form of operators/traps.trap_host_stats). Registers merge via
        one groupBy MAX; the flagged set is host-granular and tiny, so
        the caller's anti-join rides the usual size-gated wave join."""
        regs = self.cat.read("host_digests")
        cnts = self.cat.read("host_fetch_n")
        if regs is None or cnts is None:
            return None
        from webcrawler_spark.operators.sketches import hll_estimate, hll_merge

        cfg = self.cfg
        est = hll_estimate(hll_merge(regs, key="host"), key="host")
        tot = cnts.groupBy("host").agg(F.sum("n").alias("n"))
        return (
            est.join(tot, "host")
            .where(
                (F.col("n") >= F.lit(int(cfg.trap_min_urls)))
                & (
                    F.col("estimate") / F.col("n")
                    <= F.lit(1.0 - cfg.trap_dup_threshold)
                )
            )
            .select("host")
        )

    def _refresh_host_ranks(self) -> None:
        """Rebuild the (host, rank_score) table for priority_mode from
        the accumulated crawl, at most once per priority_refresh_rounds.
        The table is localCheckpoint-truncated (reused by every round's
        W1 window until the next refresh) and host-granular — bounded
        by the host universe, never by URL count."""
        cfg, st = self.cfg, self.state
        if (
            self._rank_df is not None
            and st.round - self._rank_round < cfg.priority_refresh_rounds
        ):
            return
        pages = self.cat.read("pages_fetched")
        if pages is None:
            return  # nothing crawled yet: FIFO fallback until round 1+
        from webcrawler_spark.functions.urltools import host_col

        if cfg.priority_mode in ("pagerank", "opic"):
            edges = (
                pages.select(
                    F.col("host").alias("src"),
                    F.explode("links").alias("_l"),
                )
                .select("src", host_col(F.col("_l")).alias("dst"))
                .where((F.col("dst") != "") & (F.col("src") != F.col("dst")))
            )
            if cfg.priority_mode == "pagerank":
                from webcrawler_spark.operators.graph import pagerank

                rank = pagerank(edges, n_iter=cfg.priority_rank_iters).select(
                    F.col("node").alias("host"),
                    F.col("rank").alias("rank_score"),
                )
            else:
                from webcrawler_spark.operators.graph import opic

                rank = opic(edges, n_iter=cfg.priority_rank_iters).select(
                    F.col("node").alias("host"),
                    F.col("importance").alias("rank_score"),
                )
        elif cfg.priority_mode == "recrawl":
            from webcrawler_spark.operators.recrawl import recrawl_priority

            hist = pages.select(
                "url", "round", F.md5("text").alias("digest")
            )
            pri = recrawl_priority(hist, now_round=st.round)
            rank = (
                pages.select("url", "host")
                .join(pri, "url")
                .groupBy("host")
                .agg(F.avg("p_stale").alias("rank_score"))
            )
        else:
            raise ValueError(
                f"unknown priority_mode {cfg.priority_mode!r}"
                " (expected fifo | pagerank | opic | recrawl)"
            )
        old = self._rank_df
        self._rank_df = checkpoint(rank)
        free(old)
        self._rank_round = st.round

    def _robots_for_new_hosts(self, frontier: DataFrame, host_state: DataFrame) -> DataFrame:
        new_hosts = (
            frontier.select("host")
            .distinct()
            .join(host_state.select("host"), "host", "left_anti")
        )
        agent = self.cfg.agent

        # stream the big robots side against a BROADCAST of the small
        # new-host set (inner), then recover robots-less hosts with a
        # small-small left join — the pages table itself never shuffles.
        # The robots side (one row per host that has robots.txt) is
        # materialized ONCE per session: the endswith filter cannot be
        # pushed into parquet, so recomputing it every round would
        # re-scan the html column of the whole corpus. (At 10^10-URL
        # scale this materialization is itself a table — a real
        # deployment maintains a robots table next to the corpus.)
        self._ensure_robots_side()
        matched = self._robots_side.join(F.broadcast(new_hosts), "host")
        joined = new_hosts.join(F.broadcast(matched), "host", "left")

        @F.pandas_udf("robots_ok boolean, robots_body string, delay double")
        def parse_udf(html: pd.Series, status: pd.Series) -> pd.DataFrame:
            from webcrawler_spark.functions.htmltools import decode_html_bytes

            rows = []
            for b, s in zip(html, status):
                ok = b is not None and s is not None and 200 <= s < 300
                if not ok:
                    rows.append((False, None, clamp_delay(None, False)))
                    continue
                body = decode_html_bytes(bytes(b))
                rules = parse_robots(body, agent)
                rows.append((True, body, clamp_delay(rules.crawl_delay, True)))
            return pd.DataFrame(rows, columns=["robots_ok", "robots_body", "delay"])

        parsed = joined.withColumn(
            "_r", parse_udf(F.col("robots_html"), F.col("robots_status"))
        ).select("host", "_r.robots_ok", "_r.robots_body", "_r.delay")

        # W2 priorities for brand-new hosts: the very first host ever
        # gets 0 (Worker.py:121-123); later new hosts get the medium
        # (round-granular curr stats; exact in sequential parity mode).
        medium = (
            self.state.pending_medium
            if self.state.pending_medium is not None
            else self.state.medium_priority
        )
        if not self.state.first_host_assigned:
            first = (
                frontier.groupBy("host")
                .agg(F.min("discovered_seq").alias("s"))
                .orderBy("s", "host")
                .limit(1)
                .select("host")
                .withColumn("_first", F.lit(True))
            )
            parsed = parsed.join(first, "host", "left").withColumn(
                "priority",
                F.when(F.col("_first"), F.lit(0.0)).otherwise(F.lit(medium)),
            ).drop("_first")
            self.state.first_host_assigned = True
        else:
            parsed = parsed.withColumn("priority", F.lit(medium))
        return parsed.select(
            "host", "robots_ok", "robots_body", "delay", "priority"
        )

    # ------------------------------------------------------------------
    # one round (SURVEY.md §3.2 rebuild pipeline)
    # ------------------------------------------------------------------
    def run_round(self) -> dict:
        import time as _time

        _tt = _time.time()
        cfg, st = self.cfg, self.state
        frontier = self.cat.read("frontier")
        host_state = self.cat.read("host_state")
        seen = self.cat.read("seen")

        if cfg.trap_filter:
            # drop trap hosts' pending URLs at the read: everything
            # downstream (scheduling, remaining_frontier, the round-end
            # overwrite) then excludes them permanently, so quiescence
            # still drains the frontier
            traps = self._trap_hosts()
            if traps is not None:
                frontier = self._wave_join(
                    frontier, traps, "host", "left_anti", st.total_hosts
                )

        frontier_empty = (
            st.frontier_rows == 0
            if st.frontier_rows is not None
            else frontier.isEmpty()
        )
        if frontier_empty:                                      # D4 quiescence
            st.done = True
            self.cat.commit_round(st.round, st.to_json())
            return {"round": st.round, "attempted": 0, "fetched": 0, "stopped": "empty"}
        if cfg.limit is not None and st.total_fetched >= cfg.limit:
            st.done = True
            self.cat.commit_round(st.round, st.to_json())
            return {"round": st.round, "attempted": 0, "fetched": 0, "stopped": "budget"}

        # ---- S2: admit new hosts ---------------------------------------
        # the admission record (robots verdict + body + initial priority)
        # is written ONCE as this round's host_robots delta; the slim
        # scheduling row is derived from the written delta, so the
        # robots-parse UDF runs exactly once per new host per crawl and
        # bodies never enter the broadcast scheduling table.
        from pyspark.sql import Observation

        if st.pending_new_hosts == 0:
            # the committed frontier was observed to contain zero rows
            # with unadmitted hosts — admission is provably a no-op;
            # skip its anti-join + robots-parse UDF + delta write
            # (steady-state rounds discover no new hosts, so this
            # removes one fixed-cost job batch per round)
            pass
        else:
            new_hosts = self._robots_for_new_hosts(frontier, host_state)
            hosts_obs = Observation()
            new_delta = self.cat.append_delta(
                "host_robots",
                new_hosts.observe(hosts_obs, F.count(F.lit(1)).alias("n")),
            )
            # observed on the delta write itself — no separate count job
            st.total_hosts += int(hosts_obs.get["n"])
            host_state = host_state.unionByName(
                new_delta.select("host", "delay", "priority").withColumn(
                    "ever_popped", F.lit(False)
                )
            )

        # ---- J2 + W1/W3 scheduling -------------------------------------
        # note: no global clock jump here — a skipped pop must not
        # advance the clock (Worker.py:209-216 waits only on fetches);
        # the per-row greatest(clock, priority) below is the wait.
        t_round = st.clock
        # J2: slim scheduling join (no robots bodies) — broadcast while
        # the host universe fits, shuffle-hash on host past the gate
        cand = self._wave_join(
            frontier, host_state, "host", "inner", st.total_hosts
        )

        if cfg.salt_n > 1:
            # O9: two-phase top-B per host so one mega-host cannot
            # serialize a single window task. Phase 1 ranks within
            # (host, salt); phase 2 ranks the ≤ salt_n*B survivors.
            budget_max = cfg.max_urls_per_host_per_round
            salt = F.pmod(F.xxhash64("url"), F.lit(cfg.salt_n))
            w1 = Window.partitionBy("host", salt).orderBy("discovered_seq")
            cand = (
                cand.withColumn("_rs", F.row_number().over(w1))
                .filter(F.col("_rs") <= budget_max)
                .drop("_rs")
            )
        w_host = Window.partitionBy("host").orderBy("discovered_seq")
        cand = cand.withColumn("rn_host", F.row_number().over(w_host))

        # per-host politeness budget for this round (W4)
        budget = F.least(
            F.lit(cfg.max_urls_per_host_per_round),
            F.greatest(
                F.lit(1),
                F.floor(
                    F.lit(cfg.round_window)
                    / F.greatest(F.col("delay"), F.lit(1e-6))
                ),
            ).cast("int"),
        )
        cand = cand.filter(F.col("rn_host") <= budget)

        if cfg.hosts_per_round is not None:
            # W1 strict host rank — only used in host-limited mode
            # (global sort of the distinct-host set; skipped in scale
            # mode). Under priority_mode != "fifo" the order becomes
            # (rank_score DESC, priority, host): importance-aware
            # crawling, high-rank hosts scheduled first.
            host_set = cand.select("host", "priority").distinct()
            order = [F.col("priority"), F.col("host")]
            if cfg.priority_mode != "fifo":
                self._refresh_host_ranks()
                if self._rank_df is not None:
                    host_set = self._wave_join(
                        host_set, self._rank_df, "host", "left",
                        st.total_hosts,
                    ).withColumn(
                        "rank_score",
                        F.coalesce("rank_score", F.lit(-1.0)),
                    )
                    order = [F.desc("rank_score")] + order
            hosts_ranked = (
                host_set
                .withColumn(
                    "host_rank",
                    F.row_number().over(Window.orderBy(*order)),
                )
                .filter(F.col("host_rank") <= cfg.hosts_per_round)
            )
            cand = cand.join(F.broadcast(hosts_ranked.select("host")), "host")

        # ---- F1/F2 gates + J3 metadata join (HEAD phase, O2) -----------
        # join shape: the corpus-side table is streamed against a
        # BROADCAST of this round's candidate urls (inner), and the
        # left-outer semantics are recovered with a small-small join.
        # The corpus never shuffles — at 10^10 pages a per-round
        # sort-merge of the pages table would dwarf everything else.
        _tt = self._t('pre-cand', _tt)
        # the wave size drives the O13 gates; it rides the checkpoint
        # materialization as an Observation instead of a count() job
        # over the cached blocks (one fewer job barrier per round)
        cand_obs = Observation()
        cand = checkpoint(cand.observe(cand_obs, F.count(F.lit(1)).alias("n")))
        n_cand = int(cand_obs.get["n"])
        _tt = self._t('cand ckpt', _tt)
        # F2 inputs: robots bodies for THIS WAVE's hosts only — joined
        # from the append-only host_robots table, never broadcast
        # wholesale (the scheduling broadcast above is body-free)
        wave_robots = self._wave_join(
            self.cat.read("host_robots").select("host", "robots_body"),
            cand.select("host").distinct(),
            "host",
            "inner",
            n_cand,
        )
        gated = (
            self._wave_join(cand, wave_robots, "host", "left", n_cand)
            .withColumn("ext_ok", extension_filter_col(F.col("url")))       # F1
            .withColumn(
                "allowed", robots_allowed_udf(F.col("url"), F.col("robots_body"))
            )                                                                # F2
            .drop("robots_body")  # bodies must not enter the sel checkpoint
        )
        if cfg.transport is not None:
            # ---- LIVE path: S3 HEAD + W4 wait + S4 GET through the
            # transport inside the per-host executor; the checkpoint
            # below materializes the fetched bytes (a live crawl
            # cannot re-run the network side of the plan)
            sel = self._fetch_apply_in_pandas_live(gated, t_round)
        else:
            cand_meta = self._wave_join(
                self.pages_meta, cand.select("url"), "url", "inner", n_cand
            )
            sel = (
                self._wave_join(gated, cand_meta, "url", "left", n_cand)     # S3/J3
                .withColumn(
                    "head_ok",
                    F.col("status").isNotNull()
                    & F.col("content_type").contains("text/html"),           # F3/F5
                )
                .withColumn(
                    "should_access",
                    F.col("allowed") & F.col("ext_ok") & F.col("head_ok"),
                )
                .withColumn(
                    "fetched",
                    F.col("should_access") & F.col("status").between(200, 299),  # F4
                )
            )

        # ---- W4 politeness: per-host attempt timestamps ----------------
        if cfg.transport is not None:
            pass  # attempt_ts already assigned inside the live executor
        elif cfg.fetch_executor == "apply_in_pandas":
            sel = self._politeness_apply_in_pandas(sel, t_round)
        else:
            # native window arithmetic (virtual clock, codegen path)
            start_h = F.greatest(F.lit(t_round), F.col("priority"))
            w_seq = (
                Window.partitionBy("host")
                .orderBy("rn_host")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            consumed_before = F.coalesce(
                F.sum(F.col("should_access").cast("int")).over(w_seq), F.lit(0)
            )
            sel = sel.withColumn(
                "attempt_ts", start_h + consumed_before * F.col("delay")
            )
        # round scalars (the old locked counters, WorkersPipeline.py:
        # 24-26) ride the sel checkpoint as an Observation — zero
        # dedicated jobs (observe metrics are collected by the
        # localCheckpoint materialization itself; verified eager)
        _SCALAR_AGGS = lambda: (  # noqa: E731 — one-liner per call site
            F.count(F.lit(1)).alias("n_att"),
            F.sum(F.col("fetched").cast("int")).alias("n_fet"),
            F.min("priority").alias("min_popped"),
            F.max(
                F.when(
                    F.col("should_access"),
                    F.col("attempt_ts") + F.col("delay"),
                )
            ).alias("max_requeue"),
            F.max(
                F.when(F.col("should_access"), F.col("attempt_ts"))
            ).alias("max_fetch_ts"),
        )
        from pyspark.sql import Observation as _Obs

        sel_obs = _Obs()
        sel = checkpoint(sel.observe(sel_obs, *_SCALAR_AGGS()))  # reused ≥3×
        _tt = self._t('sel ckpt', _tt)

        scal = sel_obs.get
        _tt = self._t('scalars', _tt)
        n_fetched_round = scal["n_fet"] or 0

        # ---- A1 budget truncation (final-round exact landing) ----------
        # Exact global cumulative fetch count WITHOUT a single-task
        # window (operators/prefix.py: range-partition on the order
        # keys, partition-local cumsum, O(P) driver prefix offsets).
        truncated = False
        if cfg.limit is not None and st.total_fetched + n_fetched_round > cfg.limit:
            remaining = cfg.limit - st.total_fetched
            order_cols = ["attempt_ts", "priority", "host", "rn_host"]
            tagged = attach_prefix_count(sel, order_cols, "fetched", "_cumf")
            trunc_obs = _Obs()
            sel = checkpoint(
                tagged.filter(F.col("_cumf") < F.lit(remaining))
                .drop("_cumf")
                .observe(trunc_obs, *_SCALAR_AGGS())
            )
            free(tagged._prefix_ckpt)
            scal = trunc_obs.get
            n_fetched_round = scal["n_fet"] or 0
            truncated = True

        # ---- GET phase + S5 sink, single pass (O2) ---------------------
        # stream the html column against a broadcast of the fetch wave's
        # keys, parse ONCE inside the pages_fetched parquet write, then
        # re-read only the (links, keys) columns of the delta just
        # written. No row cache: a localCheckpoint here would serialize
        # the full text column twice and anti-scales with cores.
        fetch_keys = sel.filter("fetched").select(
            "url", "host", "bucket", "depth", "priority",
            "rn_host", "attempt_ts", "delay",
        )
        if cfg.transport is not None:
            # live mode: bodies came back from the transport inside
            # the executor — no corpus join exists to re-read them
            fetched_src = sel.filter("fetched")
        else:
            fetched_src = self._wave_join(                                   # S4
                self.pages_html, fetch_keys, "url", "inner", n_fetched_round
            )
        fetched_full = (
            fetched_src
            .withColumn("_p", parse_page_udf(F.col("html"), F.col("host")))  # P6-P11
            .drop("html")
            .select(
                "url", "host", "depth", "priority",
                F.col("_p.text").alias("text"),
                F.col("_p.title").alias("title"),
                F.col("_p.first20").alias("first20"),
                F.col("_p.links").alias("links"),
                F.size("_p.links").alias("n_links"),
                F.col("attempt_ts").alias("fetch_ts"),
                F.lit(st.round).alias("round"),
                F.spark_partition_id().alias("part_id"),        # lineage
            )
        )
        attempts = sel.select(
            "url", "host", "bucket", "fetched", F.lit(st.round).alias("round"),
            "attempt_ts", "discovered_seq",
        )

        # ---- host_state priority updates (W2 re-queue + revive) --------
        # depends only on the checkpointed `sel` + the old host_state
        # dirs, so in scale mode its overwrite (and the metrics append)
        # joins the pages∥seen job batch below and its wall clock is
        # absorbed by the big fetch+parse scan. Parity mode needs the
        # revive collect, which reads this round's new links (i.e. the
        # written pages delta), so there it stays after the batch.
        host_updates = sel.groupBy("host").agg(
            F.max(
                F.when(
                    F.col("should_access"),
                    F.col("attempt_ts") + F.col("delay"),
                )
            ).alias("requeue_ts"),
            F.count("*").alias("attempted"),
            F.sum(F.col("fetched").cast("int")).alias("n_fetched"),
        )

        def _host_state2(revived_rows: list) -> DataFrame:
            # size-gated like every wave join: host_updates has one row
            # per host attempted this round (bounded by n_att), which
            # exceeds broadcast limits on a 10^7-host round
            hs2 = self._wave_join(
                host_state, host_updates, "host", "left", int(scal["n_att"] or 0)
            )
            if revived_rows:
                revived_df = self.spark.createDataFrame(
                    revived_rows, "host string, revive_ts double"
                )
                hs2 = hs2.join(F.broadcast(revived_df), "host", "left")
            else:
                hs2 = hs2.withColumn("revive_ts", F.lit(None).cast("double"))
            return hs2.select(
                "host", "delay",
                F.coalesce("revive_ts", "requeue_ts", "priority").alias("priority"),
                (F.col("ever_popped") | F.col("attempted").isNotNull()).alias(
                    "ever_popped"
                ),
            ).coalesce(self.cfg.n_buckets)
            # ^ the union-with-new-hosts otherwise grows the table's
            # partition count every round (checkpoint preserves
            # partitions, so N rounds would mean ~4N near-empty tasks
            # per stage)

        # ---- metrics (S7 + lineage) ------------------------------------
        metrics_df = None
        if cfg.collect_metrics:
            metrics_df = host_updates.select(
                F.lit(st.round).alias("round"),
                "host",
                "attempted",
                F.coalesce("n_fetched", F.lit(0)).alias("fetched"),
                (
                    F.col("attempted") - F.coalesce("n_fetched", F.lit(0))
                ).alias("skipped"),
                F.spark_partition_id().alias("part_id"),
            )

        # the page write, the seen append, and (scale mode) the
        # host_state overwrite + metrics append all read only the
        # checkpointed `sel` blocks and old snapshot dirs — submit them
        # from driver threads so the small bookkeeping writes ride
        # along with the big fetch+parse scan instead of serializing
        # after it (replaced dirs stay readable until commit_round)
        batch = [
            lambda: self.cat.append_delta(
                "pages_fetched", fetched_full, cfg.records_per_file
            ),
            lambda: self.cat.append("seen", attempts),
        ]
        host_state_written = False
        if cfg.hosts_per_round is None:
            batch.append(
                lambda: self.cat.overwrite("host_state", _host_state2([]))
            )
            if metrics_df is not None:
                _mdf = metrics_df
                batch.append(lambda: self.cat.append("metrics", _mdf))
            host_state_written = True
        results = _join_jobs(*batch)
        fetched_rows, seen = results[0], results[1]
        _tt = self._t('fetch+parse+write || seen append', _tt)

        if cfg.trap_filter:
            # per-host content-duplication state: one HLL register delta
            # + one count delta per round, built from the columnar
            # re-read of the pages delta just written (host + text only;
            # text is digested to 32 bytes before the sketch shuffle)
            from webcrawler_spark.operators.sketches import hll_registers

            digests = fetched_rows.select(
                "host", F.md5(F.col("text")).alias("digest")
            )
            self.cat.append(
                "host_digests",
                hll_registers(digests, "digest", key="host", native_hash=True),
            )
            self.cat.append(
                "host_fetch_n",
                digests.groupBy("host").agg(
                    F.count(F.lit(1)).cast("long").alias("n")
                ),
            )
            _tt = self._t('trap-state append', _tt)

        # ---- new links → frontier (P7/P8 → A5 → J1) --------------------
        # columnar delta read: text/title never leave the parquet files
        links = (
            fetched_rows.select(
                F.col("fetch_ts").alias("parent_ts"),
                F.col("priority").alias("parent_prio"),
                F.col("host").alias("parent_host"),
                F.col("depth").alias("parent_depth"),
                F.explode("links").alias("url"),
            )
            .withColumn("host", host_col(F.col("url")))
            .withColumn("resource", resource_col(F.col("url")))
            .filter(F.col("host") != "")                                      # F8
        )
        if cfg.url_blocklist or cfg.url_word_weights:
            links = self._url_filter_gate(links)
        # A5 in-round dedup keeping the earliest discovery
        w_first = Window.partitionBy("url").orderBy(
            "parent_ts", "parent_prio", "parent_host"
        )
        links = (
            links.withColumn("_rn", F.row_number().over(w_first))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        remaining_frontier = self._wave_join(
            frontier, sel.select("url"), "url", "left_anti", int(scal["n_att"] or 0)
        )
        # J1: never re-attempt (seen) and never double-queue (pending)
        seen_filter = cfg.seen_filter or ("bloom" if cfg.use_bloom else "exact")
        if seen_filter == "cuckoo":
            from webcrawler_spark.operators.cuckoo import anti_join_with_cuckoo

            new_links = anti_join_with_cuckoo(links, seen, "url")
        elif seen_filter == "bloom":
            new_links = anti_join_with_bloom(links, seen, "url")
        else:
            new_links = links.join(seen.select("url"), "url", "left_anti")
        new_links = new_links.join(
            remaining_frontier.select("url"), "url", "left_anti"
        )

        # W3 discovered_seq: FIFO per host in discovery order
        w_disc = Window.partitionBy("host").orderBy(
            "parent_ts", "parent_prio", "parent_host", "url"
        )
        new_links = new_links.select(
            "url",
            "host",
            "resource",
            self._bucket(F.col("host")).alias("bucket"),
            (F.col("parent_depth") + 1).alias("depth"),
            (
                F.lit((st.round + 1) * SEQ_STRIDE)
                + F.row_number().over(w_disc)
            ).alias("discovered_seq"),
            "parent_ts",
        )
        if cfg.hosts_per_round is not None:
            # parity mode reads new_links twice (revive scan + frontier
            # union) — checkpoint so the window/anti-join tree runs once
            new_links = checkpoint(new_links)
            _tt = self._t('new_links ckpt', _tt)
        # scale mode: new_links feeds ONLY the frontier overwrite, so
        # the parquet write below is its one materialization — no extra
        # checkpoint job (every input leaf is already a parquet delta
        # or a cached checkpoint block)

        # tag rows by whether their host is already admitted: only
        # new_links can carry unadmitted hosts (every host present in a
        # frontier is admitted in that round), and the count rides the
        # frontier write's existing Observation so next round can skip
        # the admission jobs when it is zero. Same size-gated join
        # shape the admission itself would run — moved, not added.
        known_hosts = host_state.select("host").withColumn(
            "_known", F.lit(True)
        )
        nl_tagged = self._wave_join(
            new_links.drop("parent_ts"),
            known_hosts,
            "host",
            "left",
            st.total_hosts,
        )
        new_frontier = (
            remaining_frontier.withColumn("_known", F.lit(True))
            .unionByName(nl_tagged)
            .repartition("bucket")
        )

        # revive: a known idle host (off the queue: previously popped,
        # empty FIFO) receiving new links is re-scheduled at
        # first-arrival + delay (Worker.py:127-134)
        if cfg.hosts_per_round is not None:
            # exact revive timing is only needed for the total-order
            # parity contract (sequential mode); in scale mode a
            # revived host keeps its last requeue priority, which is
            # politeness-legal (old requeue ≥ last fetch + delay) and
            # saves one driver job per round
            hosts_with_pending = remaining_frontier.select("host").distinct()
            revived_rows = (
                new_links.groupBy("host")
                .agg(F.min("parent_ts").alias("arrival_ts"))
                .join(hosts_with_pending, "host", "left_anti")
                .join(host_state.select("host", "delay", "ever_popped"), "host")
                .filter(F.col("ever_popped"))
                .select(
                    "host",
                    (F.col("arrival_ts") + F.col("delay")).alias("revive_ts"),
                )
                .collect()  # revived hosts are few (idle + re-linked)
            )
            _tt = self._t('revived collect', _tt)
        else:
            revived_rows = []

        # ---- driver-scalar updates (the old locked globals) ------------
        min_popped = scal["min_popped"]
        max_fetch_ts = scal["max_fetch_ts"]
        n_attempted = scal["n_att"] or 0
        max_revive = max((r["revive_ts"] for r in revived_rows), default=None)

        if min_popped is not None and (
            st.curr_min is None or min_popped < st.curr_min
        ):
            st.curr_min = min_popped                    # Worker.py:185-186
        # snapshot the W2 medium BEFORE this round's revive bumps
        # (see CrawlState.pending_medium note)
        st.pending_medium = st.medium_priority
        # currMax moves ONLY on the revive path: the reference bumps
        # currMaxDelay in addLinkToRequest when a KNOWN idle host
        # receives a link (Worker.py:128-132); the post-fetch re-push
        # (Worker.py:199-200) never touches it. (Earlier versions also
        # bumped on every re-queue — a documented deviation, now fixed;
        # this also removes a whole per-round driver job.)
        if max_revive is not None and max_revive > st.curr_max:
            st.curr_max = max_revive                    # Worker.py:130-132
        if max_fetch_ts is not None and max_fetch_ts > st.clock:
            st.clock = max_fetch_ts

        st.total_fetched += n_fetched_round
        st.total_attempted += int(n_attempted)

        # scale mode already wrote host_state/metrics inside the fetch
        # batch; parity mode writes them here (the revive collect above
        # needed this round's new links first). The overwrites are
        # independent (host_state2 reads only the old host_state dirs +
        # checkpointed sel blocks; new_frontier reads the old frontier
        # dirs + parquet deltas) and the catalog defers reclaiming
        # replaced dirs until commit_round, so they run concurrently
        # from driver threads.
        front_obs = Observation()
        new_frontier = new_frontier.observe(
            front_obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("_known").isNull(), 1).otherwise(0)
            ).alias("new_host_rows"),
        ).drop("_known")
        jobs = [lambda: self.cat.overwrite("frontier", new_frontier)]
        if not host_state_written:
            jobs.append(
                lambda: self.cat.overwrite(
                    "host_state", _host_state2(revived_rows)
                )
            )
            if metrics_df is not None:
                jobs.append(lambda: self.cat.append("metrics", metrics_df))
        _join_jobs(*jobs)
        # next round's D4 quiescence check reads this instead of
        # running an isEmpty() job against the frontier snapshot
        _fo = front_obs.get
        st.frontier_rows = int(_fo["n"])
        st.pending_new_hosts = int(_fo["new_host_rows"] or 0)
        _tt = self._t('host_state || frontier || metrics', _tt)
        # free this round's checkpoint caches (iterative loops leak
        # cached RDD blocks otherwise — OOM after ~50 rounds)
        for _df in (cand, sel, new_links):
            free(_df)
        # drop py4j proxies promptly: every round creates hundreds of
        # JVM-side Dataset/plan objects that stay pinned until the
        # Python GC releases their proxies; a periodic JVM GC nudge
        # lets ContextCleaner reap dropped broadcasts/shuffles in
        # long driver loops (thousands of rounds)
        import gc

        gc.collect()
        if st.round % 10 == 9:
            self.spark.sparkContext._jvm.System.gc()
        round_no = st.round
        st.round += 1
        if cfg.limit is not None and st.total_fetched >= cfg.limit:
            st.done = True
        compacting = (
            cfg.compact_seen_every
            and round_no > 0
            and round_no % cfg.compact_seen_every == 0
        )
        if compacting:
            self.cat.compact("seen")
            self.cat.compact("host_robots")
            if cfg.trap_filter:
                # merge-compact: registers collapse via groupBy MAX,
                # counts via SUM — state stays ≤ 257 rows/host forever
                from webcrawler_spark.operators.sketches import hll_merge

                regs = self.cat.read("host_digests")
                if regs is not None:
                    self.cat.overwrite(
                        "host_digests", hll_merge(regs, key="host")
                    )
                cnts = self.cat.read("host_fetch_n")
                if cnts is not None:
                    self.cat.overwrite(
                        "host_fetch_n",
                        cnts.groupBy("host").agg(F.sum("n").alias("n")),
                    )
        self.cat.commit_round(round_no, st.to_json())
        if compacting and cfg.gc_keep_rounds and self.cat.durable:
            # after the commit so the compacted dirs are referenced by
            # a retained manifest row before anything is deleted
            self.cat.gc(cfg.gc_keep_rounds)
        _tt = self._t('round tail (free/compact/commit)', _tt)
        return {
            "round": round_no,
            "attempted": int(n_attempted),
            "fetched": int(n_fetched_round),
            "truncated": truncated,
        }

    # ------------------------------------------------------------------
    def run(self, seeds: DataFrame | None = None, verbose: bool = False) -> list[dict]:
        """Full crawl: init (unless resuming) + rounds until quiescence
        (D4), budget (A1), or max_rounds."""
        import time as _time

        _t0 = _time.time()
        if seeds is not None:
            self.init_from_seeds(seeds)
        _t0 = self._t('init_from_seeds', _t0)
        history = []
        while not self.state.done:
            if (
                self.cfg.max_rounds is not None
                and self.state.round >= self.cfg.max_rounds
            ):
                break
            m = self.run_round()
            history.append(m)
            if verbose:
                print(m)
        return history

    # -- result accessors ------------------------------------------------
    def pages_fetched(self) -> DataFrame:
        df = self.cat.read("pages_fetched")
        if df is None:
            return self.spark.createDataFrame(
                [], "url string, host string, depth int, text string,"
                " title string, first20 string, fetch_ts double, round int,"
                " part_id int, n_links int"
            )
        return df

    def seen(self) -> DataFrame:
        return self.cat.read("seen")

    def debug_records(self) -> DataFrame:
        """S6: the reference's debug JSON records (DebugPrinter.py:9-18)."""
        pf = self.pages_fetched()
        return pf.select(
            F.to_json(
                F.struct(
                    F.col("url").alias("URL"),
                    F.col("title").alias("Title"),
                    F.col("first20").alias("Text"),
                    F.col("fetch_ts").alias("Timestamp"),
                )
            ).alias("record")
        )

    def host_counts(self) -> DataFrame:
        """A2/A3/A4: per-host attempted counts (Host.py:147-148 semantics)."""
        return self.seen().groupBy("host").agg(F.count("*").alias("n"))
