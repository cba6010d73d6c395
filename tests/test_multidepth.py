"""Multi-depth engine extension: exact match vs the extended serial
oracle (run_oracle_bfs) at link_depth 2 and 3."""

import tempfile

import pytest

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.plans.oracle import load_corpus_for_oracle, run_oracle, run_oracle_bfs
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus


@pytest.fixture(scope="module")
def corpus():
    paths = ensure_corpus(SMOKE)
    return paths, load_corpus_for_oracle(paths)


def _engine_results(spark, paths, depth):
    with tempfile.TemporaryDirectory() as wh:
        eng = CrawlEngine(spark, wh, paths, link_depth=depth, validate_images=False)
        eng.run()
        co = sorted(
            (r.seed_id, r.step, r.url, r.depth)
            for r in eng.result_crawl_order().collect()
        )
        seen = sorted(r.url for r in eng.result_seen().collect())
        ents = sorted(
            (r.seed_id, r.kind, r.ord, r.value) for r in eng.result_entities().collect()
        )
    return co, seen, ents


def _oracle_results(oracle):
    return (
        sorted(oracle.crawl_order),
        sorted(oracle.seen_set),
        sorted(oracle.entities),
    )


@pytest.mark.parametrize("depth", [2, 3])
def test_multidepth_exact_match(spark, corpus, depth):
    paths, loaded = corpus
    want = _oracle_results(run_oracle_bfs(*loaded, link_depth=depth))
    got = _engine_results(spark, paths, depth)
    assert got[0] == want[0], "crawl order"
    assert got[1] == want[1], "seen set"
    assert got[2] == want[2], "entities"


def test_bfs_oracle_depth1_equals_reference_oracle(corpus):
    """At link_depth=1 the extension must degenerate to the reference
    semantics exactly."""
    _, loaded = corpus
    a = run_oracle(*loaded)
    b = run_oracle_bfs(*loaded, link_depth=1)
    assert sorted(a.crawl_order) == sorted(b.crawl_order)
    assert sorted(a.seen_set) == sorted(b.seen_set)
    assert sorted(a.entities) == sorted(b.entities)


def test_depth2_goes_deeper(corpus):
    _, loaded = corpus
    d2 = run_oracle_bfs(*loaded, link_depth=2)
    assert any(d == 2 for _, _, _, d in d2.crawl_order), "depth-2 pops exist"
