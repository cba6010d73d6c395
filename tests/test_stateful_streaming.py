"""Stateful streaming operators (applyInPandasWithState): cross-batch
URL-seen dedup and per-host budget gating must reproduce a serial
python simulation of the reference semantics exactly."""

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scrapeulous_spark.streaming.frontier_stream import run_to_completion
from scrapeulous_spark.streaming.stateful import (
    stream_host_budget_gate,
    stream_url_seen_dedup,
)

BASE = datetime.datetime(2024, 1, 1)


def _write_batches(d, batches, extra_cols=None):
    """batches: list of list-of-dicts; one parquet file per micro-batch."""
    for i, rows in enumerate(batches):
        cols = {
            "seed_id": pa.array([r["seed_id"] for r in rows], pa.int64()),
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "event_ts": pa.array(
                [BASE + datetime.timedelta(seconds=r["t"]) for r in rows],
                pa.timestamp("us"),
            ),
        }
        for name, (typ, key) in (extra_cols or {}).items():
            cols[name] = pa.array([r[key] for r in rows], typ)
        path = os.path.join(d, f"batch_{i}.parquet")
        pq.write_table(pa.table(cols), path)
        # distinct mtimes pin file-source processing order to batch order
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))


def _read_stream(spark, d, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


# ---------------------------------------------------------------- dedup


@pytest.fixture(scope="module")
def dedup_env():
    # duplicates within a batch, across batches, and a revisit in batch 3
    batches = [
        [
            {"seed_id": 1, "url": "http://a.com/x", "t": 0},
            {"seed_id": 2, "url": "http://a.com/y", "t": 1},
            {"seed_id": 3, "url": "http://a.com/x", "t": 2},  # in-batch dup
        ],
        [
            {"seed_id": 4, "url": "http://a.com/y", "t": 10},  # cross-batch dup
            {"seed_id": 5, "url": "http://b.com/z", "t": 11},
        ],
        [
            {"seed_id": 6, "url": "http://a.com/x", "t": 20},  # revisit
            {"seed_id": 7, "url": "http://c.com/w", "t": 21},
        ],
    ]
    d = tempfile.mkdtemp(prefix="dedup_stream_")
    _write_batches(d, batches)
    return d, batches


def test_stream_url_seen_dedup(spark, dedup_env):
    from scrapeulous_spark.streaming.stateful import DEDUP_OUT

    d, batches = dedup_env
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("seed_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
        ]
    )
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_to_completion(
            stream_url_seen_dedup(_read_stream(spark, d, schema)), ckpt
        ).collect()

    # serial simulation: batch order, (t, seed_id) within batch
    seen, want = set(), []
    for rows in batches:
        for r in sorted(rows, key=lambda r: (r["t"], r["seed_id"])):
            if r["url"] not in seen:
                seen.add(r["url"])
                want.append((r["seed_id"], r["url"]))
    assert sorted((r.seed_id, r.url) for r in got) == sorted(want)
    assert [f.name for f in DEDUP_OUT.fields] == ["seed_id", "url", "event_ts"]


# ----------------------------------------------------------- budget gate


@pytest.fixture(scope="module")
def gate_env():
    # host a: budget 2, failures interleaved (failures must NOT consume
    # budget but ARE admitted); host b: budget 1
    def row(seed, host, path, t, ok, budget):
        return {
            "seed_id": seed,
            "url": f"http://{host}/{path}",
            "t": t,
            "host": host,
            "ok": ok,
            "budget": budget,
        }

    batches = [
        [
            row(1, "a.com", "1", 0, True, 2),
            row(2, "a.com", "2", 1, False, 2),  # admitted, no decrement
            row(3, "b.com", "1", 2, True, 1),
        ],
        [
            row(4, "a.com", "3", 10, True, 2),  # consumes a's last unit
            row(5, "b.com", "2", 11, True, 1),  # b exhausted -> dropped
            row(6, "a.com", "4", 12, False, 2),  # a exhausted -> dropped
        ],
        [
            row(7, "a.com", "5", 20, True, 2),  # still dropped (state persists)
        ],
    ]
    d = tempfile.mkdtemp(prefix="gate_stream_")
    _write_batches(
        d,
        batches,
        extra_cols={
            "host": (pa.string(), "host"),
            "fetch_ok": (pa.bool_(), "ok"),
            "budget": (pa.int64(), "budget"),
        },
    )
    return d, batches


def test_stream_host_budget_gate(spark, gate_env):
    d, batches = gate_env
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("seed_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("event_ts", T.TimestampType()),
            T.StructField("host", T.StringType()),
            T.StructField("fetch_ok", T.BooleanType()),
            T.StructField("budget", T.LongType()),
        ]
    )
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_to_completion(
            stream_host_budget_gate(_read_stream(spark, d, schema)), ckpt
        ).collect()

    # serial simulation of social.js:78-90 semantics
    remaining, want = {}, []
    for rows in batches:
        for r in sorted(rows, key=lambda r: (r["t"], r["seed_id"])):
            rem = remaining.setdefault(r["host"], r["budget"])
            if rem <= 0:
                continue
            if r["ok"]:
                remaining[r["host"]] = rem - 1
            want.append((r["seed_id"], r["host"], remaining[r["host"]]))
    assert sorted((r.seed_id, r.host, r.budget_after) for r in got) == sorted(want)
    # the two exhaustion drops actually happened
    assert {5, 6, 7}.isdisjoint({r.seed_id for r in got})
