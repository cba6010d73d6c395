"""transformWithStateInPandas seen-dedup: batch-seeded streaming state
(the batch<->stream bridge) must reproduce a serial simulation exactly."""

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scrapeulous_spark.streaming.frontier_stream import run_to_completion

# the transformWithState state protocol requires protobuf, absent from
# this sandbox — the operator and this test light up where it exists
pytest.importorskip("google.protobuf")

from scrapeulous_spark.streaming.tws import (  # noqa: E402
    ROCKSDB_PROVIDER,
    stream_url_seen_dedup_tws,
)

BASE = datetime.datetime(2024, 1, 1)

BATCHES = [
    [
        {"seed_id": 1, "url": "http://a.com/x", "t": 0},
        {"seed_id": 2, "url": "http://a.com/y", "t": 1},  # in batch-seen set
        {"seed_id": 3, "url": "http://a.com/x", "t": 2},  # in-batch dup
    ],
    [
        {"seed_id": 4, "url": "http://a.com/y", "t": 10},
        {"seed_id": 5, "url": "http://b.com/z", "t": 11},  # in batch-seen set
        {"seed_id": 6, "url": "http://c.com/w", "t": 12},
    ],
    [
        {"seed_id": 7, "url": "http://c.com/w", "t": 20},  # cross-batch dup
        {"seed_id": 8, "url": "http://d.com/v", "t": 21},
    ],
]
# urls the BATCH warehouse already saw before streaming started
INITIAL_SEEN = ["http://a.com/y", "http://b.com/z", "http://e.com/old"]


@pytest.fixture(scope="module")
def stream_dir():
    d = tempfile.mkdtemp(prefix="tws_stream_")
    for i, rows in enumerate(BATCHES):
        path = os.path.join(d, f"batch_{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "seed_id": pa.array([r["seed_id"] for r in rows], pa.int64()),
                    "url": pa.array([r["url"] for r in rows], pa.string()),
                    "event_ts": pa.array(
                        [BASE + datetime.timedelta(seconds=r["t"]) for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            path,
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return d


def _expected(initial):
    seen, want = set(initial), []
    for rows in BATCHES:
        for r in sorted(rows, key=lambda r: (r["t"], r["seed_id"])):
            if r["url"] not in seen:
                seen.add(r["url"])
                want.append((r["seed_id"], r["url"]))
    return sorted(want)


@pytest.mark.parametrize("with_initial", [False, True])
def test_tws_seen_dedup(spark, stream_dir, with_initial):
    import pyspark.sql.types as T

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        schema = T.StructType(
            [
                T.StructField("seed_id", T.LongType()),
                T.StructField("url", T.StringType()),
                T.StructField("event_ts", T.TimestampType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        init = (
            spark.createDataFrame([(u,) for u in INITIAL_SEEN], ["url"])
            if with_initial
            else None
        )
        with tempfile.TemporaryDirectory() as ckpt:
            got = run_to_completion(
                stream_url_seen_dedup_tws(stream, initial_seen=init), ckpt
            ).collect()
        want = _expected(INITIAL_SEEN if with_initial else [])
        assert sorted((r.seed_id, r.url) for r in got) == want
        # the batch-seeded run must suppress the batch-seen urls
        if with_initial:
            assert {2, 5}.isdisjoint({r.seed_id for r in got})
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
