"""IcebergCatalog boundary proof (round-3 verdict ask #10).

Three layers, weakest-to-strongest evidence the swap is real:

1. *Interface parity* — IcebergCatalog exposes the exact catalog
   protocol the engine consumes (methods + signatures matched against
   ParquetCatalog by introspection).
2. *Call-sequence conformance over recorder mocks* — every method is
   driven in-sandbox and asserted to issue the native Iceberg
   DataFrameV2 / SQL-procedure calls (`writeTo(...).using("iceberg")
   .createOrReplace()`, `.append()`, incremental `start-snapshot-id`
   reads, `VERSION AS OF` via `snapshot-id`, `rewrite_data_files`,
   `expire_snapshots`).
3. *Real end-to-end* — the same behavioral suite that runs green on
   MemoryCatalog/ParquetCatalog here, executed against a genuine
   Iceberg Hadoop catalog WHENEVER the runtime jar is on the
   classpath. This sandbox ships pyspark 4.1.2 without
   iceberg-spark-runtime and has no network to fetch it (probe:
   Class.forName("org.apache.iceberg.spark.SparkCatalog") ->
   ClassNotFoundException), so that test skips with the probe result;
   on any cluster with the jar it runs unmodified.
"""

from __future__ import annotations

import inspect
import json
from unittest.mock import MagicMock

import pytest
from pyspark.sql import Row

from webcrawler_spark.tables import (
    IcebergCatalog,
    MemoryCatalog,
    ParquetCatalog,
)

PREFIX = "local.crawl"


# ---------------------------------------------------------------------
# 1. interface parity
# ---------------------------------------------------------------------
def test_interface_matches_parquet_catalog():
    for meth in (
        "read", "overwrite", "register_empty", "append", "append_delta",
        "compact", "commit_round", "load_state", "snapshots",
        "read_as_of", "gc",
    ):
        ice = inspect.signature(getattr(IcebergCatalog, meth))
        ref = inspect.signature(getattr(ParquetCatalog, meth))
        assert ice == ref, f"{meth}: {ice} != {ref}"
    assert IcebergCatalog.durable is True


# ---------------------------------------------------------------------
# 2. call-sequence conformance (recorder mocks, no jar needed)
# ---------------------------------------------------------------------
def _mock_cat(exists: bool = True, snapshot_rows=None):
    spark = MagicMock(name="spark")
    # construction probes crawl_rounds to seed _known (restart
    # recovery); start with no tables so the probe is a no-op, then
    # flip to the test's desired existence state
    spark.catalog.tableExists.return_value = False
    cat = IcebergCatalog(spark, PREFIX)
    spark.catalog.tableExists.return_value = exists
    if snapshot_rows is not None:
        spark.sql.return_value.collect.side_effect = snapshot_rows
    spark.sql.assert_any_call("CREATE NAMESPACE IF NOT EXISTS local.crawl")
    return spark, cat


def test_overwrite_is_create_or_replace():
    spark, cat = _mock_cat()
    df = MagicMock(name="df")
    cat.overwrite("seen", df)
    df.writeTo.assert_called_once_with("local.crawl.seen")
    chain = df.writeTo.return_value
    chain.using.assert_called_once_with("iceberg")
    chain.using.return_value.tableProperty.assert_called_once_with(
        "write.target-file-size-bytes", str(128 << 20)
    )
    (
        chain.using.return_value.tableProperty.return_value
        .createOrReplace.assert_called_once_with()
    )
    spark.table.assert_called_with("local.crawl.seen")


def test_register_empty_writes_schema_only():
    spark, cat = _mock_cat()
    df = MagicMock(name="df")
    cat.register_empty("host_state", df)
    df.limit.assert_called_once_with(0)
    df.limit.return_value.writeTo.assert_called_once_with(
        "local.crawl.host_state"
    )


def test_append_on_existing_table_is_native_append():
    spark, cat = _mock_cat(exists=True)
    df = MagicMock(name="df")
    cat.append("seen", df)
    df.writeTo.assert_called_once_with("local.crawl.seen")
    df.writeTo.return_value.append.assert_called_once_with()
    # no createOrReplace on the append path
    df.writeTo.return_value.using.assert_not_called()


def test_append_creates_when_missing():
    spark, cat = _mock_cat(exists=False)
    df = MagicMock(name="df")
    cat.append("frontier", df)
    df.writeTo.return_value.using.assert_called_once_with("iceberg")


def test_append_delta_incremental_read():
    # snapshot id 41 before the append, 42 after
    spark, cat = _mock_cat(
        exists=True, snapshot_rows=[[Row(snapshot_id=41)], [Row(snapshot_id=42)]]
    )
    df = MagicMock(name="df")
    cat.append_delta("seen", df)
    spark.read.format.assert_called_once_with("iceberg")
    opt = spark.read.format.return_value.option
    opt.assert_called_once_with("start-snapshot-id", 41)
    opt.return_value.option.assert_called_once_with("end-snapshot-id", 42)
    opt.return_value.option.return_value.load.assert_called_once_with(
        "local.crawl.seen"
    )


def test_commit_round_checkpoints_state_and_snapshot_ids():
    spark, cat = _mock_cat(
        exists=True, snapshot_rows=[[Row(snapshot_id=7)]]
    )
    cat._known.add("seen")
    cat.commit_round(3, {"clock": 12.5})
    (data, schema) = spark.createDataFrame.call_args.args
    assert schema == "round bigint, ts double, state string, snapshots string"
    (rnd, _ts, state, snaps) = data[0]
    assert rnd == 3
    assert json.loads(state) == {"clock": 12.5}
    assert json.loads(snaps) == {"seen": 7}
    spark.createDataFrame.return_value.writeTo.assert_called_once_with(
        "local.crawl.crawl_rounds"
    )
    (
        spark.createDataFrame.return_value.writeTo.return_value
        .append.assert_called_once_with()
    )


def _rounds_table(spark, rows):
    tbl = MagicMock(name="crawl_rounds")
    tbl.round.__le__ = MagicMock(return_value=MagicMock(name="pred"))
    tbl.filter.return_value = tbl
    tbl.orderBy.return_value = tbl
    tbl.limit.return_value = tbl
    tbl.collect.return_value = rows
    spark.table.return_value = tbl
    return tbl


def test_read_as_of_uses_recorded_snapshot_id():
    spark, cat = _mock_cat(exists=True)
    _rounds_table(
        spark,
        [Row(round=3, ts=1.0, state='{"clock": 1}', snapshots='{"seen": 42}')],
    )
    cat.read_as_of("seen", 3)
    spark.read.option.assert_called_once_with("snapshot-id", 42)
    spark.read.option.return_value.table.assert_called_once_with(
        "local.crawl.seen"
    )


def test_load_state_reads_latest_checkpoint_row():
    spark, cat = _mock_cat(exists=True)
    _rounds_table(
        spark,
        [Row(round=9, ts=2.0, state='{"clock": 77.0}', snapshots="{}")],
    )
    assert cat.load_state() == {"clock": 77.0}


def test_compact_calls_rewrite_data_files():
    spark, cat = _mock_cat(exists=True)
    cat.compact("seen")
    spark.sql.assert_any_call(
        "CALL local.system.rewrite_data_files(table => 'local.crawl.seen')"
    )


def test_gc_expires_snapshots_and_prunes_checkpoints():
    import datetime

    spark, cat = _mock_cat(exists=True)
    cat._known.add("seen")
    rows = [
        Row(
            round=r,
            ts=float(r),
            state="{}",
            snapshots=json.dumps({"seen": 40 + r}),
        )
        for r in range(1, 5)
    ]
    _rounds_table(spark, rows)
    spark.sql.return_value.collect.return_value = [
        Row(ts=datetime.datetime(2026, 1, 3, 0, 0, 0))
    ]
    out = cat.gc(keep_rounds=2)
    assert out["pruned_rounds"] == 2
    spark.sql.assert_any_call(
        "DELETE FROM local.crawl.crawl_rounds WHERE round < 3"
    )
    # the min(committed_at) probe must cover exactly the snapshot ids
    # pinned by RETAINED rounds (43, 44) — not the pruned ones
    sql_calls = [c.args[0] for c in spark.sql.call_args_list]
    probes = [s for s in sql_calls if "min(committed_at)" in s]
    assert len(probes) == 1
    assert "(43, 44)" in probes[0] and "41" not in probes[0]
    # expiry is by the oldest referenced snapshot's commit time, NOT
    # retain_last => keep_rounds (which counts snapshots, not rounds,
    # and would drop pins when a round commits >1 snapshot per table)
    spark.sql.assert_any_call(
        "CALL local.system.expire_snapshots"
        "(table => 'local.crawl.seen',"
        " older_than => TIMESTAMP '2026-01-03 00:00:00',"
        " retain_last => 1)"
    )


def test_init_seeds_known_from_latest_checkpoint():
    """Restart recovery: _known reseeds from the newest crawl_rounds
    row so the first commit_round after a restart re-pins untouched
    tables instead of silently dropping them (ADVICE r4)."""
    spark = MagicMock(name="spark")
    spark.catalog.tableExists.return_value = True
    _rounds_table(
        spark,
        [
            Row(
                round=5,
                ts=1.0,
                state="{}",
                snapshots='{"seen": 9, "frontier": 11}',
            )
        ],
    )
    cat = IcebergCatalog(spark, PREFIX)
    assert cat._known == {"seen", "frontier"}


def test_read_under_as_of_missing_pin_returns_none():
    """A table with no snapshot pin in the as-of checkpoint row did
    not exist in that era: read() must return None (ParquetCatalog
    parity), never fall through to the current table head."""
    spark = MagicMock(name="spark")
    spark.catalog.tableExists.return_value = True
    _rounds_table(
        spark,
        [Row(round=3, ts=1.0, state="{}", snapshots='{"seen": 42}')],
    )
    cat = IcebergCatalog(spark, PREFIX, as_of_round=3)
    assert cat.read("pages") is None
    assert cat.read("seen") is not None
    spark.read.option.assert_called_once_with("snapshot-id", 42)


def test_snapshot_id_reads_main_branch_ref():
    """Current snapshot comes from the refs metadata table (the main
    branch head) — strictly monotone, immune to committed_at ties
    between a rapid append and compact (ADVICE r4)."""
    spark, cat = _mock_cat(
        exists=True, snapshot_rows=[[Row(snapshot_id=99)]]
    )
    assert cat._snapshot_id("seen") == 99
    spark.sql.assert_any_call(
        "SELECT snapshot_id FROM local.crawl.seen.refs"
        " WHERE name = 'main' AND type = 'BRANCH'"
    )


# ---------------------------------------------------------------------
# 3. behavioral conformance — green on the in-sandbox catalogs, and on
#    IcebergCatalog itself whenever the runtime jar exists
# ---------------------------------------------------------------------
def _conformance(spark, cat):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    # contract note: engine callers pass an already-empty frame;
    # MemoryCatalog records only the schema, ParquetCatalog persists
    # the rows verbatim, IcebergCatalog re-trims with limit(0)
    cat.register_empty("t", df.limit(0))
    got = cat.read("t")
    assert got is not None and got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "v"]

    cat.append("t", df)
    delta = cat.append_delta(
        "t", spark.createDataFrame([(3, "c")], "id long, v string")
    )
    assert delta.count() == 1 and delta.first()["id"] == 3
    assert cat.read("t").count() == 3

    cat.commit_round(1, {"clock": 4.5})
    assert cat.load_state() == {"clock": 4.5}

    cat.overwrite("t", df)
    assert cat.read("t").count() == 2
    cat.commit_round(2, {"clock": 9.0})
    assert cat.load_state() == {"clock": 9.0}

    if cat.durable:
        assert [s["round"] for s in cat.snapshots()] == [1, 2]
        old = cat.read_as_of("t", 1)
        assert old is not None and old.count() == 3


def test_conformance_memory(spark):
    _conformance(spark, MemoryCatalog(spark))


def test_conformance_parquet(spark, tmp_path):
    _conformance(spark, ParquetCatalog(spark, str(tmp_path / "cat")))


def _iceberg_jar_present(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_conformance_iceberg(spark, tmp_path):
    """Runs the identical suite against a real Iceberg Hadoop catalog.

    Skips in this sandbox: pyspark 4.1.2 ships no
    iceberg-spark-runtime jar and there is no network to fetch one —
    the probe below raises ClassNotFoundException. On any cluster with
    the jar (spark.jars.packages org.apache.iceberg:iceberg-spark-
    runtime-4.1_2.13) this test runs as-is.
    """
    if not _iceberg_jar_present(spark):
        pytest.skip(
            "org.apache.iceberg.spark.SparkCatalog not on classpath"
            " (no iceberg runtime jar in sandbox, no egress to fetch)"
        )
    spark.conf.set(
        "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.local.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.local.warehouse", str(tmp_path / "warehouse")
    )
    _conformance(spark, IcebergCatalog(spark, PREFIX))
