"""Multimodal column operators: image decode / resize / feature
extraction / video frame sampling over opaque ``binary`` payload
columns with typed metadata — the training-data-pipeline side of the
engine (brief: multimodal columns are first-class).

All ops are Arrow-batched ``mapInPandas`` with iterator-of-batches
per-partition init (the analog of one browser per worker,
/root/reference/crawl/render.js:12 injected ``this.page``) — no
per-row Python dispatch at the plan level. The PNG codec is the
pure-numpy one from codec/png.py (no PIL/cv2 in the sandbox); decode,
resize, and features are REAL; video decode is a clearly-marked STUB
(``_decode_video``) whose Spark-side plumbing — schema, batch shape,
partitioning — is real and tested.

The decode itself is not SQL-expressible, but each op's EXPECTED
output is: the corpus generator writes an `image_expected.parquet`
sidecar (values derived from its pixel arrays before encoding), and
the DuckDB twins read it — so the driver's value-hash compares the
executor-side decode->compute path against generator ground truth.
Invariants are additionally unit-tested in tests/test_multimodal.py.

Scale note: payload bytes never pass through a shuffle here — every op
is a narrow map over the scan, so the plan at 100 TB is
scan -> ArrowEvalPython -> project, with parallelism set by
``spark.sql.files.maxPartitionBytes`` alone.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from .catalog import register

RESIZE_SCHEMA = "image_id string, w int, h int, bytes binary, phash bigint"
FEATURES_SCHEMA = (
    "image_id string, mean_r_x1000 bigint, mean_g_x1000 bigint, mean_b_x1000 bigint, "
    "std_gray_x1000 bigint, phash bigint"
)
FRAME_SCHEMA = "media_id string, frame_idx int, ts_ms bigint, w int, h int, frame_phash bigint"


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of PNG payloads (decode -> index-sample
    -> re-encode), vectorized per Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..codec.phash import phash64
        from ..codec.png import png_decode, png_encode, resize_indices

        for pdf in it:
            rows = {"image_id": [], "w": [], "h": [], "bytes": [], "phash": []}
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = png_decode(bytes(raw))
                ys, xs = resize_indices(px.shape[0], px.shape[1], out_h, out_w)
                small = px[ys][:, xs]
                rows["image_id"].append(iid)
                rows["w"].append(out_w)
                rows["h"].append(out_h)
                rows["bytes"].append(png_encode(small))
                rows["phash"].append(phash64(small))
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(batches, schema=RESIZE_SCHEMA)


def image_features(images: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """Per-channel mean + gray std + phash, scaled to bigint x1000
    (stable value-hash across engines — no raw doubles).

    ``passthrough`` names extra input columns to carry through the
    Arrow batch unchanged (e.g. ``caption``) — callers that need
    metadata NEXT TO the decoded features get it without a post-decode
    self-join (which would shuffle the feature rows just to recover a
    column that was already in the scan)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..codec.phash import phash64
        from ..codec.png import png_decode

        for pdf in it:
            out = {k: [] for k in (
                "image_id", "mean_r_x1000", "mean_g_x1000", "mean_b_x1000",
                "std_gray_x1000", "phash",
            )}
            for iid, raw in zip(pdf["image_id"], pdf["bytes"]):
                px = png_decode(bytes(raw)).astype(np.float64)
                means = px.mean(axis=(0, 1))
                gray = px.mean(axis=2)
                out["image_id"].append(iid)
                out["mean_r_x1000"].append(int(round(means[0] * 1000)))
                out["mean_g_x1000"].append(int(round(means[1] * 1000)))
                out["mean_b_x1000"].append(int(round(means[2] * 1000)))
                out["std_gray_x1000"].append(int(round(gray.std() * 1000)))
                out["phash"].append(phash64(px.astype(np.uint8)))
            res = pd.DataFrame(out)
            for col in passthrough:
                res[col] = list(pdf[col])
            yield pd.DataFrame(res)

    schema = FEATURES_SCHEMA
    if passthrough:
        types = {f.name: f.dataType.simpleString() for f in images.schema.fields}
        schema += "".join(f", {c} {types[c]}" for c in passthrough)
    return images.select("image_id", "bytes", *passthrough).mapInPandas(
        batches, schema=schema
    )


def _decode_video(raw: bytes):
    """STUB — video decoding needs cv2/PyAV, absent from this sandbox.
    Falls back to a deterministic fake: the payload is treated as a
    single-frame clip (one PNG). On a real cluster, replace the body
    with a cv2.VideoCapture loop; schema and call-sites are final."""
    try:
        import cv2  # noqa: F401

        raise NotImplementedError("real video decode path not wired in-sandbox")
    except ImportError:
        from ..codec.png import png_decode

        return [png_decode(raw)]  # deterministic fake: 1-frame clip


def frame_sample(media: DataFrame, n_frames: int = 4, fps: float = 25.0) -> DataFrame:
    """Evenly-spaced frame sampling over a binary video column.
    Frame indices are computed over the decoded clip length, so the
    plumbing (even spacing, ts_ms stamping, per-frame rows) is
    exercised even while the decoder is the 1-frame stub."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..codec.phash import phash64

        for pdf in it:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "w", "h", "frame_phash")}
            for mid, raw in zip(pdf["image_id"], pdf["bytes"]):
                frames = _decode_video(bytes(raw))
                take = np.unique(
                    (np.arange(n_frames) * len(frames) // n_frames).astype(np.int64)
                )
                for idx in take:
                    fr = frames[int(idx)]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(int(idx))
                    out["ts_ms"].append(int(idx * 1000 / fps))
                    out["w"].append(fr.shape[1])
                    out["h"].append(fr.shape[0])
                    out["frame_phash"].append(phash64(fr))
            yield pd.DataFrame(out)

    return media.select("image_id", "bytes").mapInPandas(batches, schema=FRAME_SCHEMA)


def _corpus_images(spark: SparkSession) -> DataFrame:
    from ..sources.corpus import SMOKE, ensure_corpus

    return spark.read.parquet(ensure_corpus(SMOKE)["images"])


# Expected-values sidecar (sources/corpus.py::gen_image_expected):
# computed driver-side from the generator's pixel arrays, never through
# the PNG bytes. The Spark ops below re-derive the same values on
# executors by DECODING the stored payloads, so these DuckDB twins are
# full value-hash checks of the codec round-trip + resize/feature/phash
# math (they were rows-only before the sidecar existed).
def _expected_path() -> str:
    from ..sources.corpus import SMOKE, ensure_image_expected

    return ensure_image_expected(SMOKE)


_E = _expected_path()


@register(
    "img_resize",
    f"""SELECT image_id, 16 AS w, 12 AS h, resized_phash AS phash
        FROM read_parquet('{_E}')""",
)
def img_resize(spark, sf):
    return resize_images(_corpus_images(spark), 16, 12).drop("bytes")


@register(
    "img_features",
    f"""SELECT image_id, mean_r_x1000, mean_g_x1000, mean_b_x1000,
               std_gray_x1000, phash
        FROM read_parquet('{_E}')""",
)
def img_features(spark, sf):
    return image_features(_corpus_images(spark))


@register(
    "media_frame_sample",
    # the oracle pins the in-sandbox 1-frame stub clip semantics
    # (_decode_video): one row per media at frame 0 / ts 0
    f"""SELECT image_id AS media_id, 0 AS frame_idx, CAST(0 AS BIGINT) AS ts_ms,
               w, h, frame_phash
        FROM read_parquet('{_E}')""",
)
def media_frame_sample(spark, sf):
    return frame_sample(_corpus_images(spark), n_frames=4)


# ------------------------------------------------------------- alignment
# CLIP-score-style caption<->image alignment gate. A real pipeline puts
# learned embeddings on both sides; the sandbox stand-in keeps every
# piece of the Spark plumbing real (Arrow batch decode -> feature
# vector; JVM-side caption projection; IEEE-double cosine identical in
# both engines) and swaps only the embedding models: the image vector
# is the decoded-pixel feature vector, the caption vector is a salted
# 32-bit hash projection per dimension.

_ALIGN_DIMS = 4
_ALIGN_MIN_X1000 = 850  # splits this corpus ~50/50 (measured median 863)


def _align_sql() -> str:
    from .pipeline import _h32_sql
    from ..sources.corpus import SMOKE, ensure_corpus

    img = ensure_corpus(SMOKE)["images"]
    caps = ", ".join(
        f"({_h32_sql('caption', f'cap{d}')} % 1000 + 1) AS c{d}"
        for d in range(_ALIGN_DIMS)
    )
    return f"""WITH img AS (SELECT image_id, mean_r_x1000 AS v0, mean_g_x1000 AS v1,
                    mean_b_x1000 AS v2, std_gray_x1000 + 1 AS v3
               FROM read_parquet('{_E}')),
        cap AS (SELECT image_id, {caps} FROM read_parquet('{img}')),
        s AS (SELECT image_id,
                (v0*c0 + v1*c1 + v2*c2 + v3*c3) AS dot,
                sqrt(v0*v0 + v1*v1 + v2*v2 + v3*v3) AS na,
                sqrt(c0*c0 + c1*c1 + c2*c2 + c3*c3) AS nb
              FROM img JOIN cap USING (image_id))
        SELECT image_id,
               CAST(floor(1000.0 * dot / (na * nb)) AS BIGINT) AS align_x1000,
               floor(1000.0 * dot / (na * nb)) >= {_ALIGN_MIN_X1000} AS aligned
        FROM s"""


@register("img_caption_align", _align_sql())
def img_caption_align(spark, sf):
    """Caption<->image alignment score + admission flag (the LAION
    'CLIP filter' stage shape): cosine between the image's decoded
    feature vector and a deterministic caption projection, floor-scaled
    x1000. Norm sums stay exact BIGINTs until the sqrt cast, so both
    engines feed bit-identical doubles into IEEE sqrt/mul/div and the
    floor can't straddle an ulp.

    Scale shape (10^10 pairs): ONE map-only pass — the caption rides
    through the Arrow decode batch (image_features passthrough), so the
    plan is scan -> ArrowEvalPython -> project with zero exchanges; no
    self-join to reunite features with metadata. The DuckDB twin scores
    the generator's expected-values sidecar, so a decode-path bug that
    shifts any feature value fails the value-hash, not just the flag."""
    from pyspark.sql import functions as F

    from .pipeline import _h32

    feats = image_features(_corpus_images(spark), passthrough=("caption",))
    v = [
        F.col("mean_r_x1000"),
        F.col("mean_g_x1000"),
        F.col("mean_b_x1000"),
        F.col("std_gray_x1000") + F.lit(1),
    ]
    c = [
        _h32(F.col("caption"), f"cap{d}") % 1000 + 1
        for d in range(_ALIGN_DIMS)
    ]
    dot = v[0] * c[0] + v[1] * c[1] + v[2] * c[2] + v[3] * c[3]
    na = F.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2] + v[3] * v[3])
    nb = F.sqrt(c[0] * c[0] + c[1] * c[1] + c[2] * c[2] + c[3] * c[3])
    align = F.floor(1000.0 * dot / (na * nb)).cast("bigint")
    return feats.select(
        "image_id",
        align.alias("align_x1000"),
        (align >= _ALIGN_MIN_X1000).alias("aligned"),
    )


# ------------------------------------------------------------- sharding
# WebDataset-style shard packing: assign each image+caption row to a
# fixed-size output shard by GLOBAL byte offset (training loaders want
# size-balanced tar shards in a deterministic order). The global
# running sum is the textbook distributed prefix-sum: range-partition
# by key, cumsum WITHIN each partition, then add per-partition offsets
# — never a single-task global window.

_SHARD_BYTES = 16384
_SHARD_PARTS = 8


def _shard_sql() -> str:
    from ..sources.corpus import SMOKE, ensure_corpus

    img = ensure_corpus(SMOKE)["images"]
    cum = ("sum(octet_length(bytes)) OVER (ORDER BY image_id "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    return f"""SELECT image_id,
               CAST(octet_length(bytes) AS BIGINT) AS nbytes,
               CAST({cum} AS BIGINT) AS cum_bytes,
               CAST(floor(({cum} - 1) / {_SHARD_BYTES}) AS BIGINT) AS shard_id
        FROM read_parquet('{img}')"""


@register("img_shard_pack", _shard_sql())
def img_shard_pack(spark, sf):
    """(image_id, nbytes, cum_bytes, shard_id): fixed-size shard
    assignment by global byte prefix-sum in image_id order — the
    WebDataset tar-shard layout step of an image-training pipeline.

    Scale shape (10^10 rows): a naive `sum() OVER (ORDER BY ...)` — the
    oracle's formulation — is a SINGLE-TASK window, the classic scale
    bug. This op is the two-pass exact equivalent: repartitionByRange
    (image_id) keeps the sort distributed, the running sum is windowed
    per range partition, and partition offsets come from a totals table
    with exactly one row per partition (its own ordering window runs
    over <= _SHARD_PARTS rows — provably tiny, the documented-benign
    case) broadcast back onto the data. Values are invariant to where
    RangePartitioner's sampled boundaries land, so the result matches
    the serial formulation bit-for-bit."""
    from pyspark.sql import Window, functions as F

    from ..sources.corpus import SMOKE, ensure_corpus

    imgs = spark.read.parquet(ensure_corpus(SMOKE)["images"]).select(
        "image_id", F.length("bytes").cast("bigint").alias("nbytes")
    )
    parts = imgs.repartitionByRange(_SHARD_PARTS, "image_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("pid")
        .orderBy("image_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # MATERIALIZATION is load-bearing, not an optimization: the offsets
    # branch below re-consumes this frame, and without it each consumer
    # would re-execute repartitionByRange with an independent boundary
    # SAMPLE — spark_partition_id() could then disagree between the
    # joined sides and corrupt every offset. localCheckpoint (not
    # persist) pins the pids the same way but its blocks are released
    # by the ContextCleaner when the plan is dropped — persist() lives
    # in the CacheManager for the whole session, and a driver pass
    # runs 100+ queries in one. The write-once equivalent at cluster
    # scale is committing the ranged pass to storage and reading twice.
    within = parts.withColumn("cum_in", F.sum("nbytes").over(w_in)).localCheckpoint()
    # one row per range partition: offset = sum of totals of the
    # partitions BEFORE this one
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = (
        within.groupBy("pid")
        .agg(F.max("cum_in").alias("total"))
        .select(
            "pid", (F.sum("total").over(w_off) - F.col("total")).alias("offset")
        )
    )
    cum = F.col("offset") + F.col("cum_in")
    return within.join(F.broadcast(offsets), "pid").select(
        "image_id",
        "nbytes",
        cum.alias("cum_bytes"),
        F.floor((cum - 1) / _SHARD_BYTES).cast("bigint").alias("shard_id"),
    )


# ------------------------------------------------------------- exact dedup
def _bytes_dedup_sql() -> str:
    from ..sources.corpus import SMOKE, ensure_corpus

    img = ensure_corpus(SMOKE)["images"]
    # DuckDB's md5 is VARCHAR-only — both engines digest the UPPERCASE
    # hex expansion of the payload so the twin compares like for like
    return f"""SELECT md5(hex(bytes)) AS payload_digest,
               min(image_id) AS representative,
               count(*) AS n_copies
        FROM read_parquet('{img}')
        GROUP BY md5(hex(bytes))"""


@register("img_dedup_bytes", _bytes_dedup_sql())
def img_dedup_bytes(spark, sf):
    """Stage-0 exact image dedup: group by the payload's content
    digest (the LAION/DataComp 'URL+bytes dedup' step that runs before
    any perceptual hashing). The md5 is computed map-side in the scan
    projection, so the exchange carries (digest, image_id) pairs —
    never the image bytes; at 10^10 rows this is the cheapest possible
    dedup pass and the reason it runs FIRST in the composed curation
    pipeline ordering."""
    from pyspark.sql import functions as F

    return (
        _corpus_images(spark)
        .select(F.md5(F.hex("bytes")).alias("payload_digest"), "image_id")
        .groupBy("payload_digest")
        .agg(
            F.min("image_id").alias("representative"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ------------------------------------------------------------- safety
# LAION-style caption safety gate. A production pipeline uses a large
# blocklist (plus a classifier); the sandbox stand-in keeps the
# operator shape — token-level, case-insensitive matching with the
# matched terms surfaced for audit — over a two-word placeholder list
# drawn from the corpus vocabulary so the gate actually splits rows.

_CAPTION_BLOCKLIST = ("lantern", "bridge")  # placeholder terms


def _safety_sql() -> str:
    from ..sources.corpus import SMOKE, ensure_corpus

    img = ensure_corpus(SMOKE)["images"]
    bl = ", ".join(f"'{w}'" for w in _CAPTION_BLOCKLIST)
    return rf"""WITH m AS (
          SELECT image_id,
                 list_filter(string_split_regex(trim(caption), '\s+'),
                             x -> list_contains([{bl}], lower(x))) AS hits
          FROM read_parquet('{img}'))
        SELECT image_id,
               CAST(len(hits) AS BIGINT) AS n_matched,
               CASE WHEN len(hits) = 0 THEN NULL
                    ELSE list_aggregate(hits, 'min') END AS matched_term,
               len(hits) = 0 AS safe
        FROM m"""


@register("filt_caption_safety", _safety_sql())
def filt_caption_safety(spark, sf):
    """Caption safety blocklist gate (the LAION safety-filter stage
    shape): token-level case-insensitive matching, matched terms
    surfaced (count + lexicographic-min term) for audit, `safe` flag
    for the admission conjunction. Map-only metadata projection — the
    bytes payload is never read, no shuffle at any scale; a real
    blocklist would broadcast as a set inside the same expression."""
    from pyspark.sql import functions as F

    bl = F.array(*[F.lit(w) for w in _CAPTION_BLOCKLIST])
    hits = F.filter(
        F.split(F.trim("caption"), r"\s+"),
        lambda x: F.array_contains(bl, F.lower(x)),
    )
    return _corpus_images(spark).select(
        "image_id",
        F.size(hits).cast("bigint").alias("n_matched"),
        F.when(F.size(hits) == 0, F.lit(None).cast("string"))
        .otherwise(F.array_min(hits))
        .alias("matched_term"),
        (F.size(hits) == 0).alias("safe"),
    )
