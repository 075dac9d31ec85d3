"""Partitioned cuckoo URL-seen filter (north_star: "partitioned
Bloom/cuckoo URL-seen filter broadcast-merged per round").

Companion to :mod:`webcrawler_spark.operators.bloom` with the same
routing contract (maybe-seen → exact anti-join, surely-new → bypass)
but a different trade-off, per the public cuckoo-filter construction
(Fan, Andersen, Kaminsky, Mitzenmacher — "Cuckoo Filter: Practically
Better Than Bloom", CoNEXT 2014):

* **deletion support** — a crawl can retire URLs from the seen set
  (re-crawl / revisit policies) without rebuilding, which a Bloom
  filter cannot do;
* lower false-positive rate per bit at high load (16-bit fingerprints,
  4-slot buckets ⇒ fpp ≈ 2b/2^f ≈ 0.012% vs the Bloom default 1%);
* bounded probe cost: exactly two bucket reads per lookup.

Scale design mirrors bloom.py's sharding, but cuckoo tables cannot be
OR-merged, so the build avoids a merge entirely: keys are sharded by
``pmod(xxhash64(url), n_shards)`` and each shard's table is built in a
single ``applyInPandas`` group task with a *vectorized* numpy insertion
(bulk placement passes; the per-item eviction walk only runs for the
tiny residue a ≤0.84-load table leaves). At 10^10 URLs, 4096 shards
are ~5 MiB each and build in parallel with no driver merge step.

Probe topology is size-gated like bloom.py (``anti_join_with_cuckoo``):
small filters collect the shard rows into one broadcast
:class:`CuckooFilter`; past ``broadcast_cap_bytes`` the shards STAY a
``(shard, table, stash)`` DataFrame and candidates meet their shard in
a cogrouped ``applyInPandas`` on the shard key
(operators/seenfilter.py) — at 10^10 URLs the aggregate ~25 GiB filter
never touches the driver or any single broadcast.

No per-row Python on the hot path: the two 64-bit hashes are native
``xxhash64`` columns (whole-stage codegen); Python stages do numpy
array arithmetic only.

Reference parity: the reference's seen set is an exact in-memory
``set`` (Worker.py:110, Host.py:190-194 semantics); this filter is the
at-scale accelerator for that check, never a replacement — false
positives die in the exact anti-join, and the filter has no false
negatives for inserted keys (insert failures overflow to a stash that
always probes positive).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.operators.seenfilter import (
    DEFAULT_BROADCAST_CAP,
    route_with_exact_join,
    tag_maybe_seen_sharded,
)

SLOTS = 4  # slots per bucket (b=4: the paper's sweet spot for ≤0.95 load)
_FP_SALT = "#wcspark-cuckoo-fp"
_ALT_MIX = np.uint64(0x5BD1E995)  # odd multiplier for the alt-bucket hash
_MAX_KICKS = 500


def hash_cols(col: str | Column) -> tuple[Column, Column]:
    """(bucket hash, fingerprint hash) as NATIVE columns; nulls hash
    as '' so build and probe agree on them."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    return F.xxhash64(c), F.xxhash64(c, F.lit(_FP_SALT))


def _as_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    """16-bit fingerprints in [1, 65535]; 0 is the empty-slot marker."""
    return (h2 % np.uint64(65535)).astype(np.uint16) + np.uint16(1)


def _bucket1(h1: np.ndarray, m: int) -> np.ndarray:
    # high bits, decorrelated from the pmod-shard selector on low bits
    return (h1 >> np.uint64(16)) & np.uint64(m - 1)


def _alt_bucket(b: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    """Partial-key cuckoo hashing: the alternate bucket is derivable
    from (bucket, fingerprint) alone, so relocation/deletion never
    needs the original key. m must be a power of two (XOR-closed)."""
    return b ^ ((fp.astype(np.uint64) * _ALT_MIX) & np.uint64(m - 1))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


def table_buckets(expected_items: int, load_factor: float = 0.84) -> int:
    """Bucket count (power of two) for expected_items at load_factor."""
    return max(2, _next_pow2(int(expected_items / (SLOTS * load_factor)) + 1))


# ---------------------------------------------------------------------------
# pure-numpy core (property-tested directly)
# ---------------------------------------------------------------------------


def _lookup_many(
    table: np.ndarray, i1: np.ndarray, fp: np.ndarray, stash: np.ndarray
) -> np.ndarray:
    """Vectorized membership: fp present in bucket i1 or its alternate,
    or fp present in the overflow stash (stash match is fp-only — a
    false-positive source, never a false negative)."""
    if len(i1) == 0:
        return np.zeros(0, dtype=bool)
    m = table.shape[0]
    b2 = _alt_bucket(i1, fp, m)
    hit = (table[i1] == fp[:, None]).any(axis=1)
    hit |= (table[b2] == fp[:, None]).any(axis=1)
    if stash.size:
        hit |= np.isin(fp, stash)
    return hit


def _place_pass(table: np.ndarray, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """One bulk placement pass: each key tries bucket b; keys that fit
    in their bucket's free slots are written (distinct slots assigned
    via within-bucket rank). Returns the placed mask."""
    order = np.argsort(b, kind="stable")
    bs, fs = b[order], fp[order]
    _, start, counts = np.unique(bs, return_index=True, return_counts=True)
    rank = np.arange(len(bs)) - np.repeat(start, counts)
    load = (table[bs] != 0).sum(axis=1)
    fits = rank < (SLOTS - load)
    table[bs[fits], (load + rank)[fits]] = fs[fits]
    placed = np.zeros(len(b), dtype=bool)
    placed[order[fits]] = True
    return placed


def _insert_many(
    table: np.ndarray, i1: np.ndarray, fp: np.ndarray
) -> np.ndarray:
    """Bulk insert (idempotent for a seen-set: duplicate and
    already-present keys are skipped). Mostly-vectorized: alternating
    bulk placement passes, then a bounded random-walk eviction loop for
    the residue; eviction failures go to the returned stash (uint16
    fingerprints) so membership never has a false negative."""
    m = table.shape[0]
    if len(i1) == 0:
        return np.zeros(0, dtype=np.uint16)
    key = (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
    _, uniq_idx = np.unique(key, return_index=True)
    i1, fp = i1[uniq_idx], fp[uniq_idx]
    fresh = ~_lookup_many(table, i1, fp, np.zeros(0, np.uint16))
    b, fp = i1[fresh].copy(), fp[fresh]

    remaining = np.ones(len(b), dtype=bool)
    for _ in range(8):  # alternate b -> alt(b) -> b ... in bulk
        if not remaining.any():
            break
        idx = np.flatnonzero(remaining)
        placed = _place_pass(table, b[idx], fp[idx])
        remaining[idx[placed]] = False
        idx = np.flatnonzero(remaining)
        b[idx] = _alt_bucket(b[idx], fp[idx], m)

    stash: list[int] = []
    rng = np.random.default_rng(0x5EED)  # deterministic kicks
    for j in np.flatnonzero(remaining):
        cur_b, cur_fp = int(b[j]), fp[j]
        for _ in range(_MAX_KICKS):
            row = table[cur_b]
            free = np.flatnonzero(row == 0)
            if free.size:
                row[free[0]] = cur_fp
                break
            s = int(rng.integers(0, SLOTS))
            cur_fp, row[s] = row[s], cur_fp
            cur_b = int(
                _alt_bucket(np.array([cur_b], np.uint64), np.array([cur_fp]), m)[0]
            )
        else:
            stash.append(int(cur_fp))
    return np.array(stash, dtype=np.uint16)


def _delete_many(
    table: np.ndarray, i1: np.ndarray, fp: np.ndarray, stash: np.ndarray
) -> np.ndarray:
    """Remove one occurrence of each (bucket, fp) key; returns the
    updated stash. Deletion is the admin path (revisit policies), so a
    small Python loop over the delete set is acceptable — the crawl hot
    path never calls this.

    Standard cuckoo-filter caveat (Fan et al. §3.3): delete only keys
    that were inserted; distinct keys colliding on (bucket, fp) share a
    slot, so deleting one re-admits the other — which, for a seen
    filter, is exactly the semantic of forcing a re-visit."""
    m = table.shape[0]
    stash_list = stash.tolist()
    for b, f in zip(i1.tolist(), np.asarray(fp).tolist()):
        for bb in (b, int(_alt_bucket(np.array([b], np.uint64), np.array([f], np.uint16), m)[0])):
            slots = np.flatnonzero(table[bb] == f)
            if slots.size:
                table[bb, slots[0]] = 0
                break
        else:
            if f in stash_list:
                stash_list.remove(f)
    return np.array(stash_list, dtype=np.uint16)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@dataclass
class CuckooFilter:
    """n_shards independent cuckoo tables; shard = pmod(xxhash64(key),
    n_shards). Serializable (plain bytes) for Spark broadcast."""

    n_shards: int
    m_buckets: int
    tables: dict[int, bytes]  # shard -> (m, SLOTS) uint16 table
    stashes: dict[int, bytes]  # shard -> uint16 fingerprint stash

    def _arrays(self, shard: int) -> tuple[np.ndarray, np.ndarray]:
        tbl = np.frombuffer(
            self.tables.get(shard, b"\0\0" * (self.m_buckets * SLOTS)),
            dtype=np.uint16,
        ).reshape(self.m_buckets, SLOTS)
        stash = np.frombuffer(self.stashes.get(shard, b""), dtype=np.uint16)
        return tbl, stash

    def lookup_np(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Vectorized membership for raw hash pairs, shard-grouped."""
        out = np.zeros(len(h1), dtype=bool)
        if len(h1) == 0:
            return out
        shard = (h1 % np.uint64(self.n_shards)).astype(np.int64)
        fp = _fingerprints(h2)
        i1 = _bucket1(h1, self.m_buckets)
        for s in np.unique(shard):
            tbl, stash = self._arrays(int(s))
            sel = shard == s
            out[sel] = _lookup_many(tbl, i1[sel], fp[sel], stash)
        return out


def build_cuckoo_shards(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    n_shards: int = 8,
    load_factor: float = 0.84,
) -> tuple[DataFrame, int]:
    """Build the sharded filter as a ``(shard int, table binary, stash
    binary)`` DataFrame plus the per-shard bucket count, fully
    distributed: one applyInPandas task per shard, no driver-side merge
    (shards are disjoint by construction) and no driver residency —
    this is the 100 TB build; ``build_cuckoo`` is the collected
    small-scale tier."""
    if n_shards & (n_shards - 1):
        # probe-side shard = (h1 as uint64) % n_shards; Spark's pmod on
        # the signed value agrees with that only when n_shards | 2^64
        raise ValueError("n_shards must be a power of two")
    n = expected_items if expected_items is not None else max(df.count(), 1)
    m = table_buckets(max(n // n_shards, 1), load_factor)
    c1, c2 = hash_cols(col)
    hashed = df.select(c1.alias("h1"), c2.alias("h2")).withColumn(
        "shard", F.pmod(F.col("h1"), F.lit(n_shards)).cast("int")
    )

    def build_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        h1, h2 = _as_u64(pdf["h1"]), _as_u64(pdf["h2"])
        table = np.zeros((m, SLOTS), dtype=np.uint16)
        stash = _insert_many(table, _bucket1(h1, m), _fingerprints(h2))
        return pd.DataFrame(
            {
                "shard": [key[0]],
                "table": [table.tobytes()],
                "stash": [stash.tobytes()],
            }
        )

    shards = hashed.groupBy("shard").applyInPandas(
        build_shard, "shard int, table binary, stash binary"
    )
    return shards, m


def build_cuckoo(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    n_shards: int = 8,
    load_factor: float = 0.84,
) -> CuckooFilter:
    """Collected tier: run the distributed shard build, then gather the
    shard rows into one :class:`CuckooFilter` for broadcast. Only valid
    when the whole filter is broadcast-sized — the at-scale probe keeps
    the shards as the DataFrame from ``build_cuckoo_shards`` instead."""
    shards, m = build_cuckoo_shards(df, col, expected_items, n_shards, load_factor)
    rows = shards.collect()
    return CuckooFilter(
        n_shards=n_shards,
        m_buckets=m,
        tables={r["shard"]: r["table"] for r in rows},
        stashes={r["shard"]: r["stash"] for r in rows},
    )


def with_maybe_seen(df: DataFrame, col: str, filter_bc) -> DataFrame:
    """Add boolean ``maybe_seen``: False ⇒ certainly not inserted."""

    @F.pandas_udf("boolean")
    def probe(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        cf: CuckooFilter = filter_bc.value
        return pd.Series(cf.lookup_np(_as_u64(h1s), _as_u64(h2s)))

    c1, c2 = hash_cols(col)
    return df.withColumn("maybe_seen", probe(c1, c2))


def _probe_shard_pdf(m_buckets: int):
    """Shard-join-mode membership test for seenfilter.tag_maybe_seen_sharded."""

    def probe(shard_pdf: pd.DataFrame, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        table = np.frombuffer(shard_pdf["table"].iloc[0], dtype=np.uint16).reshape(
            m_buckets, SLOTS
        )
        stash = np.frombuffer(shard_pdf["stash"].iloc[0], dtype=np.uint16)
        return _lookup_many(table, _bucket1(h1, m_buckets), _fingerprints(h2), stash)

    return probe


def anti_join_with_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    col: str = "url",
    n_shards: int = 8,
    expected_items: int | None = None,
    mode: str = "auto",
    broadcast_cap_bytes: int = DEFAULT_BROADCAST_CAP,
) -> DataFrame:
    """J1 with the cuckoo pre-pass: semantically identical to
    ``candidates.join(seen, col, 'left_anti')`` (property-tested) —
    same routing contract and size-gated probe modes as
    bloom.anti_join_with_bloom: ``'auto'`` broadcasts the collected
    filter only while every shard summed fits ``broadcast_cap_bytes``,
    else (or with ``mode='shard_join'``) the shards stay a DataFrame
    and candidates probe them via the cogrouped shard-key join — the
    topology a 10^10-URL filter requires."""
    spark = candidates.sparkSession
    shards, m = build_cuckoo_shards(
        seen, col, expected_items=expected_items, n_shards=n_shards
    )
    total_bytes = n_shards * m * SLOTS * 2
    if mode == "broadcast" or (mode == "auto" and total_bytes <= broadcast_cap_bytes):
        rows = shards.collect()
        cf = CuckooFilter(
            n_shards=n_shards,
            m_buckets=m,
            tables={r["shard"]: r["table"] for r in rows},
            stashes={r["shard"]: r["stash"] for r in rows},
        )
        bc = spark.sparkContext.broadcast(cf)
        tagged = with_maybe_seen(candidates, col, bc)
    else:
        c1, c2 = hash_cols(col)
        tagged = tag_maybe_seen_sharded(
            candidates,
            c1,
            c2,
            F.pmod(c1, F.lit(n_shards)).cast("int"),
            shards,
            "shard",
            _probe_shard_pdf(m),
        )
    return route_with_exact_join(tagged, seen, col)


def delete_keys(cf: CuckooFilter, df: DataFrame, col: str) -> CuckooFilter:
    """Retire df[col] keys from the filter (revisit policy). The delete
    set is collected to the driver — deletion is an admin-scale
    operation, not the crawl hot path — and applied shard by shard.
    Returns a new CuckooFilter (input is not mutated)."""
    c1, c2 = hash_cols(col)
    n = df.count()
    if n > 50_000_000:  # ~800 MB of hashes; beyond admin scale
        raise ValueError(
            f"delete_keys: {n} keys exceeds the driver-collect guard"
            f" (50M). Deletion is an admin-scale revisit operation;"
            f" for bulk retirement rebuild the filter from the"
            f" surviving seen set instead."
        )
    pdf = df.select(c1.alias("h1"), c2.alias("h2")).toPandas()
    h1, h2 = _as_u64(pdf["h1"]), _as_u64(pdf["h2"])
    shard = (h1 % np.uint64(cf.n_shards)).astype(np.int64)
    fp = _fingerprints(h2)
    i1 = _bucket1(h1, cf.m_buckets)
    tables = dict(cf.tables)
    stashes = dict(cf.stashes)
    for s in np.unique(shard):
        tbl, stash = cf._arrays(int(s))
        tbl = tbl.copy()
        sel = shard == s
        new_stash = _delete_many(tbl, i1[sel], fp[sel], stash)
        tables[int(s)] = tbl.tobytes()
        stashes[int(s)] = new_stash.tobytes()
    return CuckooFilter(cf.n_shards, cf.m_buckets, tables, stashes)
