"""Snapshot-warehouse semantics (sources/tables.py): the Iceberg-subset
contract the engine relies on — append/overwrite commits, time travel,
rollback, vacuum, and the hive-partitioned layout used by the salted
frontier (including that plain and partitioned layouts are
interchangeable on read)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from scrapeulous_spark.sources.tables import Warehouse

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("host_bucket", T.IntegerType()),
    ]
)


@pytest.fixture()
def table(tmp_path):
    return Warehouse(str(tmp_path)).table("t", SCHEMA)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        (F.col("id") % 4).cast("int").alias("host_bucket"),
    )


def test_append_overwrite_and_time_travel(spark, table):
    s1 = table.append(_df(spark, 0, 5))
    s2 = table.append(_df(spark, 5, 8))
    assert (s1["snapshot_id"], s2["snapshot_id"]) == (1, 2)
    assert s2["parent_id"] == 1
    assert table.read(spark).count() == 8
    # time travel: snapshot 1 still reads the first commit only
    assert table.read(spark, snapshot_id=1).count() == 5
    s3 = table.overwrite(_df(spark, 100, 102))
    assert table.read(spark).count() == 2
    assert table.read(spark, snapshot_id=2).count() == 8
    assert s3["snapshot_id"] == 3


def test_rollback_discards_newer_commits(spark, table):
    table.append(_df(spark, 0, 5))
    table.append(_df(spark, 5, 8))
    table.rollback(1)
    assert table.current()["snapshot_id"] == 1
    assert table.read(spark).count() == 5
    # rollback(0) truncates
    table.rollback(0)
    assert table.current() is None
    assert table.read(spark).count() == 0


def test_vacuum_keeps_only_current(spark, table):
    table.append(_df(spark, 0, 5))
    table.overwrite(_df(spark, 0, 3))
    table.vacuum()
    assert table.read(spark).count() == 3
    # the pre-overwrite snapshot's data dir is gone
    with pytest.raises(Exception):
        table.read(spark, snapshot_id=1).count()


def test_partitioned_and_plain_layouts_interchange(spark, table):
    """The frontier writes hive-partitioned (expand) and plain with the
    bucket as a data column (drain); the schema-specified read must
    serve both — including across commits in one table."""
    table.append(_df(spark, 0, 8), partition_by="host_bucket")
    table.append(_df(spark, 8, 12))  # plain layout, same schema
    got = table.read(spark)
    assert got.count() == 12
    assert set(got.columns) == {"k", "v", "host_bucket"}
    # values survive both layouts
    assert sorted(r.host_bucket for r in got.filter("k in (2, 10)").collect()) == [2, 2]


def test_lineage_recorded_on_snapshot(spark, table):
    snap = table.append(_df(spark, 0, 2), lineage={"superstep": 7, "stage": "x"})
    assert snap["lineage"] == {"superstep": 7, "stage": "x"}
    assert table.current()["lineage"]["superstep"] == 7


def test_merge_upserts_by_key_and_snapshots(spark, table):
    """merge(): same-key rows are replaced, new keys insert, untouched
    rows survive; the merge is a NEW snapshot (time travel shows the
    pre-merge state; rollback undoes the merge)."""
    table.overwrite(_df(spark, 0, 10))  # keys 0..9, v = "v{k}"
    pre = table.current()["snapshot_id"]
    delta = spark.createDataFrame(
        [(5, "UPDATED", 0), (99, "INSERTED", 1)], SCHEMA
    )
    table.merge(spark, delta, ["k"])
    got = {(r.k, r.v) for r in table.read(spark).collect()}
    want = {(k, f"v{k}") for k in range(10) if k != 5} | {(5, "UPDATED"), (99, "INSERTED")}
    assert got == want
    # time travel: the pre-merge snapshot still reads the old state
    old = {(r.k, r.v) for r in table.read(spark, snapshot_id=pre).collect()}
    assert old == {(k, f"v{k}") for k in range(10)}
    # rollback undoes the merge atomically
    table.rollback(pre)
    back = {(r.k, r.v) for r in table.read(spark).collect()}
    assert back == old


def test_merge_is_idempotent_reapplied(spark, table):
    """Re-applying the same delta produces the same table — the
    resume-protocol property: a replayed superstep MERGE cannot
    duplicate rows."""
    table.overwrite(_df(spark, 0, 5))
    delta = spark.createDataFrame([(2, "X", 0), (7, "Y", 1)], SCHEMA)
    table.merge(spark, delta, ["k"])
    once = sorted((r.k, r.v) for r in table.read(spark).collect())
    table.merge(spark, delta, ["k"])
    twice = sorted((r.k, r.v) for r in table.read(spark).collect())
    assert once == twice


def test_merge_rejects_duplicate_and_null_keys(spark, table):
    """Iceberg MERGE cardinality semantics: duplicate source keys and
    NULL keys are rejected up front (a NULL key would silently
    re-insert on every replay)."""
    table.overwrite(_df(spark, 0, 3))
    dup = spark.createDataFrame([(1, "a", 0), (1, "b", 0)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        table.merge(spark, dup, ["k"])
    nul = spark.createDataFrame([(None, "a", 0)], SCHEMA)
    with pytest.raises(ValueError, match="NULL in key"):
        table.merge(spark, nul, ["k"])
    # the failed merges committed nothing
    assert table.current()["snapshot_id"] == 1
