"""Fetch + payload-validation stages.

Fetch: in the sandbox (no network) a fetch is an equi-join of scheduled
URLs against the synthetic page store — the in-cluster analog of the
reference's Got()/page.goto() calls (/root/reference/crawl/http.js:4-7,
crawl/render.js:8-33). Status semantics: 'ok' and 'partial' yield a
body (render.js:24-27 partial-content fallback); 'error'/'blocked'
throw (google_scraper.js:52-67 recaptcha path) — a failed fetch
consumes a frontier slot but NOT budget (social.js:81-89).

Payload validation: decoded-pixel PSNR + phash + caption invariants
(BASELINE.json input_hint) via an iterator-of-batches mapInPandas —
Arrow-vectorized, per-partition init, no per-row Python dispatch. The
reference pixels are re-derived deterministically from image_id, which
is what makes the PSNR a real check of the decode path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import OK_STATUSES


PAGE_COLS = ("url", "status", "fetch_ms", "out_links", "image_id", "caption", "title", "body")


def fetch_join(urls: DataFrame, pages: DataFrame, columns: tuple = PAGE_COLS) -> DataFrame:
    """urls: must carry a 'url' column. Left-join the page store and
    stamp fetch_ok. Missing url == network error (throw path).

    `columns` narrows the page-store scan: the payload columns (body,
    out_links) are ~95% of the bytes, and any stage that doesn't need
    them (scheduling windows, crawl_order bookkeeping) must not drag
    them through its shuffles — pass the metadata subset and parquet
    column pruning keeps the scan to a few MB."""
    page_cols = pages.select(*columns)
    joined = urls.join(page_cols, "url", "left")
    return joined.withColumn(
        "fetch_ok", F.col("status").isin(*OK_STATUSES) & F.col("status").isNotNull()
    )


PAYLOAD_COLS = ("url", "body", "out_links")


def payload_join(
    keys: DataFrame,
    pages: DataFrame,
    broadcast: bool = True,
    columns: tuple = PAYLOAD_COLS,
) -> DataFrame:
    """Equi-join a small scheduled-key set against the payload columns
    of the page store. The payload side (body, out_links) is ~95% of
    the page-store bytes: a shuffle join would write and re-read all of
    it through an exchange. Broadcasting the key side instead streams
    the body scan straight into the join — the payload never shuffles
    here. Pass broadcast=False when one superstep's scheduled batch
    could exceed broadcast limits (~10M+ keys at a 10^10 frontier) and
    let AQE plan the shuffle join.

    `columns` narrows the scan to the payload column a consumer
    actually reads (parquet column chunks are independent): the
    extraction job joins in `body` only and the frontier expansion
    `out_links` only — two pipelined scans of DISJOINT heavy columns
    that run concurrently on FAIR pools, instead of one shared
    cached join that must be serially materialized (persist+count)
    before the threads may race on it."""
    if broadcast:
        keys = F.broadcast(keys)
    return keys.join(pages.select(*columns), "url")


PAYLOAD_REPORT_SCHEMA = (
    "image_id string, fmt string, decode_ok boolean, psnr_db double, "
    "phash_recomputed bigint, phash_match boolean, pixels_allclose boolean"
)


def validate_payloads(images: DataFrame) -> DataFrame:
    """images: image_id, bytes, w, h, fmt, phash. Returns the per-row
    payload-invariant report (decode, PSNR vs re-derived reference
    pixels, recomputed phash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init (the analog of one browser per worker,
        # render.js:12 injected page) — imports resolved once here
        import numpy as np

        from ..codec.phash import phash64
        from ..codec.png import png_decode, psnr, quantize
        from ..sources.corpus import image_pixels

        for pdf in it:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"],
                "fmt": pdf["fmt"],
                "decode_ok": np.zeros(n, dtype=bool),
                "psnr_db": np.full(n, np.nan),
                "phash_recomputed": np.zeros(n, dtype=np.int64),
                "phash_match": np.zeros(n, dtype=bool),
                "pixels_allclose": np.zeros(n, dtype=bool),
            }
            for i in range(n):
                # the WHOLE per-row validation is guarded: the invariant
                # computations themselves raise on exactly the malformed
                # payloads this validator exists to REPORT (w/h columns
                # disagreeing with the decoded shape -> psnr broadcast
                # error; decoded image under 8x8 -> phash ValueError;
                # NULL phash -> int() TypeError). A bad row must become
                # a report row, never a task failure that kills the job.
                try:
                    dec = png_decode(bytes(pdf["bytes"].iloc[i]))
                    out["decode_ok"][i] = True
                    ref = image_pixels(
                        pdf["image_id"].iloc[i], int(pdf["w"].iloc[i]), int(pdf["h"].iloc[i])
                    )
                    fmt = pdf["fmt"].iloc[i]
                    p = psnr(ref, dec)
                    out["psnr_db"][i] = 1e9 if p == float("inf") else p
                    ph = phash64(dec)
                    out["phash_recomputed"][i] = ph
                    out["phash_match"][i] = ph == int(pdf["phash"].iloc[i])
                    expected = quantize(ref) if fmt == "qpng" else ref
                    out["pixels_allclose"][i] = bool(np.array_equal(dec, expected))
                except Exception:
                    continue  # defaults already say failed/mismatch
            yield pd.DataFrame(out)

    # Decode cost is per-ROW CPU, not per-byte: a bytes-proportional
    # partitioning (file splits, AQE advisory size) under-parallelizes
    # this stage badly. Repartition to the cluster's core count so every
    # executor thread decodes; at 100 TB this round-robin shuffle of the
    # payload column is the decode stage's scheduling unit.
    sc = images.sparkSession.sparkContext
    return (
        images.select("image_id", "bytes", "w", "h", "fmt", "phash")
        .repartition(sc.defaultParallelism * 2)
        .mapInPandas(batches, schema=PAYLOAD_REPORT_SCHEMA)
    )
