"""Mid-scale exact-match gate: the 50x-bigger CORRECTNESS corpus
(12,000 pages / 120 seeds / 24 hosts vs SMOKE's 240/12/8) exercises
real multi-partition shuffles in every engine stage while the serial
oracle stays tractable — the determinism-under-parallelism evidence
the smoke corpus is too small to force (at 240 pages most stages
collapse to a handful of tasks)."""

import tempfile

import pytest

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.plans.oracle import load_corpus_for_oracle, run_oracle
from scrapeulous_spark.sources.corpus import CORRECTNESS, ensure_corpus


@pytest.fixture(scope="module")
def mid(spark):
    paths = ensure_corpus(CORRECTNESS)
    oracle = run_oracle(*load_corpus_for_oracle(paths))
    with tempfile.TemporaryDirectory() as wh:
        eng = CrawlEngine(spark, wh, paths, validate_images=False)
        eng.run()
        yield eng, oracle


def test_midscale_crawl_order_and_seen_exact(mid):
    eng, oracle = mid
    got = sorted(
        (r.seed_id, r.step, r.url, r.depth)
        for r in eng.result_crawl_order().collect()
    )
    assert got == sorted(oracle.crawl_order)
    seen = sorted(r.url for r in eng.result_seen().collect())
    assert seen == sorted(oracle.seen_set)
    assert len(seen) == len(set(seen))


def test_midscale_entities_exact(mid):
    eng, oracle = mid
    got = sorted(
        (r.seed_id, r.kind, r.ord, r.value) for r in eng.result_entities().collect()
    )
    assert got == sorted(oracle.entities)
