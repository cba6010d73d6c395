"""Batch->stream bridge: streaming URL-seen dedup seeded from a batch
seen table (stream-static anti-join form, runnable in-sandbox) must
reproduce a serial simulation whose seen set starts non-empty."""

import datetime
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scrapeulous_spark.streaming.frontier_stream import run_to_completion
from scrapeulous_spark.streaming.stateful import stream_url_seen_dedup

BASE = datetime.datetime(2024, 1, 1)

BATCHES = [
    [
        {"seed_id": 1, "url": "http://a.com/x", "t": 0},
        {"seed_id": 2, "url": "http://a.com/y", "t": 1},  # batch-seen
        {"seed_id": 3, "url": "http://a.com/x", "t": 2},  # in-batch dup
    ],
    [
        {"seed_id": 4, "url": "http://a.com/y", "t": 10},  # batch-seen again
        {"seed_id": 5, "url": "http://b.com/z", "t": 11},  # batch-seen
        {"seed_id": 6, "url": "http://c.com/w", "t": 12},
    ],
    [
        {"seed_id": 7, "url": "http://c.com/w", "t": 20},  # cross-batch dup
        {"seed_id": 8, "url": "http://d.com/v", "t": 21},
    ],
]
INITIAL_SEEN = ["http://a.com/y", "http://b.com/z", "http://e.com/old"]


@pytest.fixture(scope="module")
def stream_dir():
    d = tempfile.mkdtemp(prefix="bridge_stream_")
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


def test_batch_seeded_stream_dedup(spark, stream_dir):
    import pyspark.sql.types as T

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
    init = spark.createDataFrame([(u,) for u in INITIAL_SEEN], ["url"])
    with tempfile.TemporaryDirectory() as ckpt:
        got = run_to_completion(
            stream_url_seen_dedup(stream, initial_seen=init), ckpt
        ).collect()

    seen, want = set(INITIAL_SEEN), []
    for rows in BATCHES:
        for r in sorted(rows, key=lambda r: (r["t"], r["seed_id"])):
            if r["url"] not in seen:
                seen.add(r["url"])
                want.append((r["seed_id"], r["url"]))
    assert sorted((r.seed_id, r.url) for r in got) == sorted(want)
    # batch-seen urls were suppressed without entering stream state
    assert {2, 4, 5}.isdisjoint({r.seed_id for r in got})
