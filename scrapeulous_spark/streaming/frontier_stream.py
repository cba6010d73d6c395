"""Structured Streaming variant of the ingest/extract stage.

The reference is batch-iterative (SURVEY.md §2.8) — no watermarks or
event-time windows exist in it — so streaming is an ENGINE EXTENSION:
the natural deployment shape when seed batches arrive continuously
(the cloud-crawler's job queue, README.md:7-11 analog).

Two streaming pipelines, both built from the same operators the batch
engine uses (extraction is the identical column-expression library):

  * stream_seed_entities: seeds arrive as files in a directory
    (file-source micro-batches) -> fetch-join against the page store
    -> per-page entity extraction -> append sink. Stateless,
    exactly-once via checkpoint + idempotent sink.
  * stream_fetch_rate: watermarked sliding-window fetch-rate per host
    — the politeness monitor (crawl_delay accounting) as an event-time
    windowed aggregation with late-data tolerance.

Tested with trigger(availableNow=True) so tests run to completion
deterministically (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.extract import extract_entities_raw
from ..operators.fetch import fetch_join

SEED_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("seed_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def read_seed_stream(spark: SparkSession, seeds_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(SEED_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(seeds_dir)
    )


def stream_seed_entities(seed_stream: DataFrame, pages: DataFrame) -> DataFrame:
    """Stream-static join (stream side = seeds, static side = page
    store), then the batch engine's own extraction expressions. The
    stream never shuffles state: fetch is a per-batch join, extraction
    is narrow — this is the stateless fast path."""
    fetched = fetch_join(seed_stream.select("seed_id", "url", "event_ts"), pages)
    ok = fetched.filter("fetch_ok")
    return extract_entities_raw(
        ok.select("seed_id", F.lit(0).alias("page_order"), "body")
    )


def stream_fetch_rate(seed_stream: DataFrame, pages: DataFrame, window: str = "10 seconds",
                      slide: str = "5 seconds", watermark: str = "30 seconds") -> DataFrame:
    """Politeness monitor: fetches per host per sliding event-time
    window, with a watermark bounding late-data state. The batch twin
    is the window-function rate accounting in frontier.schedule_pops;
    this is its continuous analog (per-host crawl_delay enforcement
    would gate on these counts)."""
    from ..functions import urls as U

    fetched = fetch_join(seed_stream.select("seed_id", "url", "event_ts"), pages)
    return (
        fetched.withColumn("host", U.host_col(F.col("url")))
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window, slide).alias("w"), "host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum(F.col("fetch_ok").cast("long")).alias("n_ok"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_fetches",
            "n_ok",
        )
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch agg_event_sessionize operator
    (operators/pipeline.py): gap-based session windows per key via
    ``session_window`` + watermark. Sessions merge across micro-batches
    in state; a session is FINALIZED (emitted, in append mode) once the
    watermark passes its end (= last event + gap), which bounds state
    to the still-open sessions — the property that lets this run
    indefinitely at 10^10 events where the batch window would need the
    full history. Late events inside the watermark re-open/merge their
    session; later ones are dropped, exactly the documented trade."""
    # watermarks require TIMESTAMP (parquet without isAdjustedToUTC
    # reads as TIMESTAMP_NTZ, which EventTimeWatermark rejects)
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap).alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def _paired_streams(
    requests: DataFrame, responses: DataFrame, max_lag: str, watermark: str
):
    """Shared stream-stream prep: watermarked sides + the interval
    join condition — ONE source of truth so attribution and timeout
    detection can never disagree about what 'paired' means."""
    req = requests.withColumn(
        "event_ts", F.col("event_ts").cast("timestamp")
    ).withWatermark("event_ts", watermark)
    resp = (
        responses.withColumnRenamed("url", "resp_url")
        .withColumn("resp_ts", F.col("resp_ts").cast("timestamp"))
        .withWatermark("resp_ts", watermark)
    )
    cond = F.expr(
        f"""url = resp_url
            AND resp_ts >= event_ts
            AND resp_ts <= event_ts + interval {max_lag}"""
    )
    return req, resp, cond


def stream_fetch_attribution(
    requests: DataFrame,
    responses: DataFrame,
    max_lag: str = "15 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """STREAM-STREAM interval join: attribute each fetch response to
    the request that scheduled it — response within [request_ts,
    request_ts + max_lag] on the same url. The canonical Structured
    Streaming two-stream shape: watermarks on BOTH sides plus the
    time-interval join condition are what let the state store expire
    buffered rows (url-keyed state bounded by watermark + max_lag —
    never unbounded); the url equality key is the shuffle partition
    key, so both streams co-partition and each task joins one url
    range. requests: (seed_id, url, event_ts); responses:
    (url, status, resp_ts)."""
    req, resp, cond = _paired_streams(requests, responses, max_lag, watermark)
    return req.join(resp, cond, "inner").select(
        "seed_id",
        "url",
        "status",
        "event_ts",
        "resp_ts",
        (
            F.unix_millis(F.col("resp_ts")) - F.unix_millis(F.col("event_ts"))
        ).alias("lag_ms"),
    )


def stream_fetch_timeouts(
    requests: DataFrame,
    responses: DataFrame,
    max_lag: str = "15 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Timeout detection as a LEFT-OUTER stream-stream join: a request
    row with a NULL response side means no response arrived within
    max_lag — the streaming analog of the batch timeout_budget gate.
    The outer semantics are the operationally subtle part: a null-match
    can only be emitted once the RESPONSE watermark has passed
    request_ts + max_lag (before that, the match could still arrive),
    so timeout rows trail live traffic by watermark + max_lag — state
    stays bounded for exactly the same reason. Emits every request
    with matched=false for timeouts. Pairing condition shared with
    stream_fetch_attribution via _paired_streams."""
    req, resp, cond = _paired_streams(requests, responses, max_lag, watermark)
    return req.join(resp, cond, "left_outer").select(
        "seed_id",
        "url",
        "event_ts",
        F.col("resp_ts").isNotNull().alias("matched"),
        "status",
    )


def run_to_files(
    stream_df: DataFrame,
    checkpoint: str,
    out_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain all available input with availableNow into a FILE sink and
    return a DataFrame reading the sink directory back — rows never
    round-trip through the driver (executors write parquet; the
    returned plan is an ordinary pruned/pushed-down scan), so the same
    drain shape works at any scale, unlike the memory-sink harness.

    append mode uses the native parquet sink (its _spark_metadata
    commit log makes the read-back exactly the committed files);
    complete mode — which the file sink does not support — uses
    foreachBatch with a full overwrite per micro-batch: each complete
    batch carries the ENTIRE result state, so after the availableNow
    drain the directory holds exactly the final state.

    update mode is rejected: an update batch carries only the keys
    CHANGED in that micro-batch, so overwrite-per-batch would silently
    drop keys updated earlier and absent from the last batch.  A
    correct file materialization would need append-with-batch_id plus
    last-per-key on read-back; no caller needs it, so refuse rather
    than ship the trap."""
    if output_mode == "update":
        raise ValueError(
            "run_to_files does not support output_mode='update': "
            "overwrite-per-batch loses keys not present in the final "
            "micro-batch (use append or complete)"
        )
    if output_mode == "append":
        q = (
            stream_df.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    else:
        def _overwrite(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(out_dir)

        q = (
            stream_df.writeStream.foreachBatch(_overwrite)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    # explicit schema: a zero-row drain leaves nothing to infer from
    return stream_df.sparkSession.read.schema(stream_df.schema).parquet(out_dir)


def run_to_completion(stream_df: DataFrame, checkpoint: str, output_mode: str = "append"):
    """Drain all available input with availableNow and return the
    collected rows from a memory sink (test/driver harness helper)."""
    import re as _re

    # every non-identifier char must go (a '.' in the path would parse
    # as a catalog separator in the SELECT below), and the name must
    # not start with a digit
    name = "stream_out_" + _re.sub(r"[^A-Za-z0-9_]", "_", checkpoint)[-32:]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")
