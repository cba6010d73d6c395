"""THE correctness gate: the distributed engine must reproduce the
serial oracle EXACTLY — crawl order, seen set, entities — per the
north rule (BASELINE.json)."""

import tempfile

import pytest

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.plans.oracle import load_corpus_for_oracle, run_oracle
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus


@pytest.fixture(scope="module")
def engine_and_oracle(spark):
    paths = ensure_corpus(SMOKE)
    oracle = run_oracle(*load_corpus_for_oracle(paths))
    with tempfile.TemporaryDirectory() as wh:
        eng = CrawlEngine(spark, wh, paths)
        eng.run()
        yield eng, oracle


def test_crawl_order_exact(engine_and_oracle):
    eng, oracle = engine_and_oracle
    got = sorted(
        (r.seed_id, r.step, r.url, r.depth)
        for r in eng.result_crawl_order().collect()
    )
    want = sorted(oracle.crawl_order)
    assert got == want


def test_seen_set_exact(engine_and_oracle):
    eng, oracle = engine_and_oracle
    got = sorted(r.url for r in eng.result_seen().collect())
    assert got == sorted(oracle.seen_set)
    assert len(got) == len(set(got)), "seen table must be exactly distinct"


def test_entities_exact(engine_and_oracle):
    eng, oracle = engine_and_oracle
    got = sorted(
        (r.seed_id, r.kind, r.ord, r.value) for r in eng.result_entities().collect()
    )
    want = sorted(oracle.entities)
    assert got == want


def test_payload_invariants(engine_and_oracle):
    eng, _ = engine_and_oracle
    rows = eng.result_payload_report().collect()
    assert rows, "some fetched pages embed images"
    for r in rows:
        assert r.decode_ok, r.image_id
        assert r.caption_match, r.image_id
        assert r.phash_match, r.image_id
        assert r.pixels_allclose, r.image_id
        # PSNR >= 40 dB for the lossy format, lossless is exact
        if r.fmt == "qpng":
            assert r.psnr_db >= 40.0, (r.image_id, r.psnr_db)
        else:
            assert r.psnr_db >= 1e9
