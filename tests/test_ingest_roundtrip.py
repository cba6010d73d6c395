"""Ground-truth round-trip tests for the ingest parsers and python
twins for the scoring ops.

The DuckDB oracles pin CROSS-ENGINE agreement (both engines parse the
same text the same way); these tests pin agreement with the GENERATOR
— the parsed rows must recover exactly the records/entries the corpus
sidecars rendered, and the scoring ops must match an independent
pure-Python reimplementation."""

import math
import zlib

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from scrapeulous_spark.operators import load_all_catalogs
from scrapeulous_spark.operators.pipeline import round_half_away
from scrapeulous_spark.sources.corpus import (
    SMOKE,
    ensure_corpus,
    ensure_sitemaps,
    ensure_warc,
)

_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all_catalogs()


def _crc(s: str) -> int:
    return zlib.crc32(s.encode()) & 0xFFFFFFFF


def test_warc_parse_recovers_every_generated_record(spark, registry):
    """Every page becomes exactly one parsed record; target_uri,
    declared length, and the truncation flag must match what the
    generator rendered (truncated = the h%31 bucket)."""
    pages = pq.read_table(ensure_corpus(SMOKE)["pages"], columns=["url", "body"])
    ensure_warc(SMOKE)
    expected = {}
    for u, b in zip(pages["url"].to_pylist(), pages["body"].to_pylist()):
        b = b or ""
        h = _crc(f"warc:{u}")
        expected[u] = (len(b), h % 31 == 0 and len(b) > 3)
    rows = registry["src_warc_records"].spark(spark, _SF).collect()
    assert len(rows) == len(expected)
    for r in rows:
        declared, truncated = expected[r["target_uri"]]
        assert r["content_length"] == declared, r
        assert r["warc_type"] == "response"
        # well_formed must be the exact complement of generator-side
        # truncation — a parser that mis-slices flips this somewhere
        assert r["well_formed"] == (not truncated), r


def test_sitemap_parse_recovers_every_generated_entry(spark, registry):
    """Entry count, per-host ordering, and the optional-field pattern
    (lastmod omitted on hh%5==0, priority on hh%7==0) must match the
    generator exactly."""
    ensure_sitemaps(SMOKE)
    rows = registry["src_sitemap_urls"].spark(spark, _SF).collect()
    assert rows
    for r in rows:
        hh = _crc(f"sm:{r['loc']}")
        assert r["loc"].startswith("http://")
        if hh % 5 != 0:
            assert r["lastmod_day"] == 1 + hh % 28, r
        else:
            assert r["lastmod_day"] is None, r
        if hh % 7 != 0:
            assert r["priority_x10"] == 1 + hh % 9, r
        else:
            assert r["priority_x10"] is None, r
    # per-host: pos is 1..n over the host's sorted url list
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
        assert [r["loc"] for r in rs] == sorted(r["loc"] for r in rs)


def test_char_entropy_matches_python_twin(spark, registry):
    """Independent pure-Python Shannon entropy over the same alphabet
    must match the Spark column-expression fold to the millibit."""
    from scrapeulous_spark.operators.pipeline import _ENT_ALPHA

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{_SF}/documents.parquet").collect()
    }
    rows = registry["text_char_entropy"].spark(spark, _SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        t = (docs[r["doc_id"]] or "").lower()
        counts = [t.count(c) for c in _ENT_ALPHA]
        total = sum(counts)
        assert r["n_counted"] == total
        if total == 0:
            assert r["ent_millibits"] == 0
            continue
        ent = -sum(
            (c / total) * math.log2(c / total) for c in counts if c > 0
        )
        assert r["ent_millibits"] == round_half_away(ent * 1000), (r, ent)


def test_lm_logprob_matches_python_twin(spark, registry):
    """Independent pure-Python unigram-LM scorer (own tokenization, own
    vocab selection, own integer log-probs) must reproduce every doc's
    n_tokens and lp_micro_total."""
    import re
    from collections import Counter

    from scrapeulous_spark.operators.pipeline import _LM_VOCAB_K

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{_SF}/documents.parquet").collect()
    }
    tok = {
        d: re.split(r"\s+", t.strip())
        for d, t in ((d, t or "") for d, t in docs.items())
        if t.strip()
    }
    cnt = Counter(t for ts in tok.values() for t in ts)
    total = sum(cnt.values())
    vocab = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_LM_VOCAB_K]
    lp = {t: round_half_away(math.log(c / total) * 1e6) for t, c in vocab}
    oov = round_half_away(math.log(1.0 / total) * 1e6)
    rows = registry["text_lm_logprob"].spark(spark, _SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        ts = tok.get(r["doc_id"])
        if ts is None:
            assert r["n_tokens"] == 0 and r["lp_micro_total"] is None, r
            continue
        assert r["n_tokens"] == len(ts), r
        assert r["lp_micro_total"] == sum(lp.get(t, oov) for t in ts), r


def test_redirect_resolve_matches_python_replay(spark, registry):
    """Ground truth for join_redirect_resolve: rebuild the synthesized
    edge map in plain Python, follow each chain up to 3 hops, and
    require the Spark join cascade to agree on final_url, hop count,
    and the truncation flag for every URL."""
    import hashlib
    import re

    pages = pq.read_table(ensure_corpus(SMOKE)["pages"], columns=["url"])
    urls = pages["url"].to_pylist()
    edges = {}
    for u in urls:
        # the op keys off _h32 (first 8 md5 hex chars), not crc32
        h = int(hashlib.md5(f"redir:{u}".encode()).hexdigest()[:8], 16)
        if h % 5 == 0:
            pn = int(re.search(r"p(\d+)$", u).group(1))
            edges[u] = re.sub(r"p\d+$", "", u) + f"p{pn + 1}"
    rows = registry["join_redirect_resolve"].spark(spark, _SF).collect()
    assert len(rows) == len(urls)
    for r in rows:
        cur, hops = r["url"], 0
        while cur in edges and hops < 3:
            cur = edges[cur]
            hops += 1
        assert r["final_url"] == cur, r
        assert r["hops"] == hops, r
        assert r["truncated"] == (hops == 3 and cur in edges), r


def test_html_to_text_entity_decode_order(spark):
    """'&amp;' decodes LAST: '&amp;lt;' is the ESCAPED text '&lt;' and
    must surface as '&lt;', never double-decode to '<' (round-2
    advice). Also pins tag-strip before decode and whitespace
    collapse."""
    from scrapeulous_spark.operators.catalog_engine import html_to_text_col

    rows = spark.createDataFrame(
        [
            ("&amp;lt;", "&lt;"),
            ("&lt;b&gt;", "<b>"),
            ("a &amp; b", "a & b"),
            ("<p>x</p>\t <p>y</p>", "x y"),
            ("&amp;amp;", "&amp;"),
        ],
        "body string, want string",
    ).select(html_to_text_col(F.col("body")).alias("got"), "want")
    for r in rows.collect():
        assert r.got == r.want, (r.got, r.want)
