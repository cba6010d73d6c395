"""Checkpoint/resume: a run killed at a superstep barrier (and even one
killed mid-superstep, after partial commits) must resume to results
byte-identical to an uninterrupted run (BASELINE.md resumability row)."""

import tempfile

import pytest

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus


@pytest.fixture(scope="module")
def paths():
    return ensure_corpus(SMOKE)


def _results(eng):
    co = sorted(
        (r.seed_id, r.step, r.url, r.depth, r.fetch_ok)
        for r in eng.result_crawl_order().collect()
    )
    seen = sorted(r.url for r in eng.result_seen().collect())
    ents = sorted(
        (r.seed_id, r.kind, r.ord, r.value) for r in eng.result_entities().collect()
    )
    return co, seen, ents


def test_resume_from_superstep_barrier(spark, paths):
    with tempfile.TemporaryDirectory() as wh_a, tempfile.TemporaryDirectory() as wh_b:
        full = CrawlEngine(spark, wh_a, paths)
        full.run()

        # interrupted run: superstep 0 completes, then the process "dies"
        eng1 = CrawlEngine(spark, wh_b, paths)
        fin, _ = eng1._superstep_seeds()
        fin()  # drain the forked extraction/frontier commits (as run() does)
        eng1._checkpoint(1)
        # a NEW engine instance resumes from the warehouse
        eng2 = CrawlEngine(spark, wh_b, paths)
        eng2.run(resume=True)
        assert _results(eng2) == _results(full)


def test_resume_discards_partial_superstep(spark, paths):
    """Crash mid-superstep: partial commits past the checkpoint are rolled
    back, not duplicated."""
    with tempfile.TemporaryDirectory() as wh_a, tempfile.TemporaryDirectory() as wh_b:
        full = CrawlEngine(spark, wh_a, paths)
        full.run()

        eng1 = CrawlEngine(spark, wh_b, paths)
        fin, _ = eng1._superstep_seeds()
        fin()  # drain the forked extraction/frontier commits (as run() does)
        eng1._checkpoint(1)
        # simulate a crash midway through superstep 1: one table got an
        # extra commit, the barrier was never reached
        eng1.crawl_order.append(eng1.crawl_order.read(spark).limit(3))

        eng2 = CrawlEngine(spark, wh_b, paths)
        eng2.run(resume=True)
        assert _results(eng2) == _results(full)
