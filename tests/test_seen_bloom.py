"""Bloom prefilter exactness + cuckoo sidecar unit tests.

Property (SURVEY.md §5.2.4): the Bloom prefilter NEVER changes the
anti-join result — it only prunes probes.
"""

import pytest

from scrapeulous_spark.operators.cuckoo import CuckooFilter
from scrapeulous_spark.operators.seen import bloom_build, new_urls_exact


@pytest.fixture(scope="module")
def url_frames(spark):
    seen = spark.createDataFrame(
        [(f"http://h{i % 7}.example.com/p{i}",) for i in range(2000)], ["url"]
    )
    cand = spark.createDataFrame(
        [(f"http://h{i % 7}.example.com/p{i}",) for i in range(1500, 3500)]
        + [(f"http://hx.example.com/q{i}",) for i in range(300)],
        ["url"],
    )
    return seen, cand


def test_bloom_prefilter_exactness(spark, url_frames):
    seen, cand = url_frames
    params = dict(n_buckets=16, n_bits=1 << 16, k=4)
    bloom = bloom_build(seen, **params).persist()
    plain = sorted(r.url for r in new_urls_exact(cand, seen).collect())
    with_bloom = sorted(r.url for r in new_urls_exact(cand, seen, bloom, **params).collect())
    assert with_bloom == plain
    # sanity: result is candidates minus seen
    assert len(plain) == 2000 - 500 + 300
    bloom.unpersist()


def test_bloom_no_false_negatives(spark, url_frames):
    seen, _ = url_frames
    params = dict(n_buckets=16, n_bits=1 << 16, k=4)
    bloom = bloom_build(seen, **params)
    # every seen url must be flagged maybe_seen
    from scrapeulous_spark.operators.seen import bloom_prefilter

    stamped = bloom_prefilter(seen.select("url"), bloom, **params)
    assert stamped.filter("not maybe_seen").count() == 0


def test_cuckoo_insert_contains_delete():
    f = CuckooFilter(n_buckets=1 << 10)
    urls = [f"http://h.example.com/p{i}" for i in range(1000)]
    for u in urls:
        assert f.insert(u)
    assert all(f.contains(u) for u in urls)
    # delete half, they disappear; others remain
    for u in urls[::2]:
        assert f.delete(u)
    assert all(f.contains(u) for u in urls[1::2])
    missing = sum(f.contains(u) for u in urls[::2])
    assert missing <= len(urls[::2]) * 0.05  # only fp-collision residue

    # false-positive rate on never-inserted keys stays small
    fresh = [f"http://other.example.com/x{i}" for i in range(2000)]
    fpr = sum(f.contains(u) for u in fresh) / len(fresh)
    assert fpr < 0.02, fpr


def test_cuckoo_roundtrip_serialization():
    f = CuckooFilter(n_buckets=256)
    for i in range(200):
        f.insert(f"u{i}")
    g = CuckooFilter.from_bytes(f.to_bytes(), 256)
    assert all(g.contains(f"u{i}") for i in range(200))


def test_engine_bloom_mode_identical(spark, tmp_path):
    """Engine invariant: running the full crawl with the Bloom-prefiltered
    incremental seen-set MERGE produces byte-identical crawl_order and
    seen tables to the plain anti-join path."""
    from scrapeulous_spark.plans.loop import CrawlEngine
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    paths = ensure_corpus(SMOKE)
    outs = {}
    for label, use_bloom in (("plain", False), ("bloom", True)):
        eng = CrawlEngine(
            spark,
            str(tmp_path / label),
            paths,
            validate_images=False,
            use_bloom=use_bloom,
            bloom_buckets=8,
            bloom_bits=1 << 16,
        )
        eng.run()
        order = sorted(map(tuple, eng.result_crawl_order().collect()))
        seen = sorted(r.url for r in eng.result_seen().collect())
        outs[label] = (order, seen)
    assert outs["plain"] == outs["bloom"]
