"""sink_warc_export round-trip: exporting the page store to WARC/1.0
shards and re-parsing them with the src_warc_records framing rules must
reproduce every (url, body) exactly, with every record well-formed.

The reader twin slices payloads by the DECLARED Content-Length
(character-based substr on both engines); the export writes the same
character length, so the round-trip pins that the two ends agree on
the framing — the property a real archive egress/ingest pair lives on.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus


@pytest.fixture(scope="module")
def shards(spark):
    from scrapeulous_spark.operators.catalog_engine import sink_warc_shards

    return {
        r["host"]: r
        for r in sink_warc_shards(spark, "unused").collect()
    }


def _parse_records(warc_text: str):
    """Reference framing (mirrors src_warc_records): split on the
    record header, slice payload by declared Content-Length, demand
    the '\n\n' trailer."""
    out = []
    for chunk in warc_text.split("WARC/1.0\n"):
        if chunk == "":
            continue
        hdr, _, rest = chunk.partition("\n\n")
        fields = dict(
            line.split(": ", 1) for line in hdr.split("\n") if ": " in line
        )
        n = int(fields["Content-Length"])
        payload, trailer = rest[:n], rest[n : n + 2]
        out.append((fields["WARC-Target-URI"], payload, trailer == "\n\n"))
    return out


def test_export_roundtrips_every_page(shards):
    pages = pq.read_table(ensure_corpus(SMOKE)["pages"], columns=["url", "body"])
    expect = {
        u: (b or "") for u, b in zip(pages["url"].to_pylist(), pages["body"].to_pylist())
    }
    got: dict[str, str] = {}
    for host, row in shards.items():
        recs = _parse_records(row["warc_text"])
        assert len(recs) == row["n_records"]
        assert len(row["warc_text"]) == row["warc_len"]
        for uri, payload, well_formed in recs:
            assert well_formed, f"malformed record for {uri}"
            assert uri.split("//", 1)[1].split("/", 1)[0] == host
            got[uri] = payload
    assert got == expect


def test_records_are_url_ordered_within_shard(shards):
    for row in shards.values():
        uris = [u for u, _, _ in _parse_records(row["warc_text"])]
        assert uris == sorted(uris)


def test_manifest_sig_covers_full_text(spark, shards):
    """sink_warc_export's warc_sig is md5 over the exact shard text —
    the driver hash compare therefore covers every byte of the
    export, not just the manifest counts."""
    import hashlib

    from scrapeulous_spark.operators.catalog_engine import sink_warc_export

    sigs = {r["host"]: r["warc_sig"] for r in sink_warc_export(spark, "unused").collect()}
    assert sigs == {
        host: hashlib.md5(row["warc_text"].encode()).hexdigest()
        for host, row in shards.items()
    }


def test_file_level_egress_reingest(spark, shards, tmp_path):
    """Round-4 verdict #4: close the egress loop with REAL files.
    Write the shard text via df.write.partitionBy('host').text(...)
    (the documented egress path, sink_warc_shards docstring), re-read
    the files, and re-frame them with the src_warc_records slicing
    contract (split on the record header, locate the blank line, substr
    by the DECLARED Content-Length) — every (url, body) must survive
    the disk round-trip exactly.

    The text sink appends one line separator after the value; the
    framing tolerates it (it trails the final record's '\n\n' trailer),
    which the explicit file-byte assertion pins."""
    from pyspark.sql import functions as F

    from scrapeulous_spark.operators.catalog_engine import sink_warc_shards

    out = str(tmp_path / "warc_out")
    sink_warc_shards(spark, "unused").select(
        "host", F.col("warc_text").alias("value")
    ).write.partitionBy("host").text(out)

    # file bytes = shard text + the sink's trailing line separator
    files = spark.read.text(out, wholetext=True).collect()
    assert {r["value"] for r in files} == {
        row["warc_text"] + "\n" for row in shards.values()
    }

    # re-frame from the files with the src_warc_records contract
    recs = spark.read.text(out, wholetext=True).select(
        F.explode(
            F.filter(
                F.split("value", "WARC/1\\.0\n"), lambda x: x != F.lit("")
            )
        ).alias("chunk")
    )
    hdr_end = F.locate("\n\n", F.col("chunk"))
    declared = F.regexp_extract("chunk", r"Content-Length: (\d+)", 1).cast("int")
    parsed = recs.select(
        F.regexp_extract("chunk", r"WARC-Target-URI: (\S+)", 1).alias("url"),
        F.col("chunk").substr(hdr_end + F.lit(2), declared).alias("body"),
        (
            F.col("chunk").substr(hdr_end + F.lit(2) + declared, F.lit(2))
            == "\n\n"
        ).alias("well_formed"),
    ).collect()

    pages = pq.read_table(ensure_corpus(SMOKE)["pages"], columns=["url", "body"])
    expect = {
        u: (b or "")
        for u, b in zip(pages["url"].to_pylist(), pages["body"].to_pylist())
    }
    assert all(r["well_formed"] for r in parsed)
    assert {r["url"]: r["body"] for r in parsed} == expect
