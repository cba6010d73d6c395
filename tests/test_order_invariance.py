"""Crawl order / seen set must be invariant under partitioning and
parallelism (north rule: exact match at N and 4N executors).

In-process proxy: run the engine under different shuffle-partition
counts and skewed input repartitioning — results must be identical.
The full local[8]-vs-local[32] two-master evidence (separate JVMs) is
produced by bench.py and recorded in BENCH.md.
"""

import tempfile

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus


def _run(spark, paths, shuffle_parts):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    try:
        with tempfile.TemporaryDirectory() as wh:
            eng = CrawlEngine(spark, wh, paths, validate_images=False)
            eng.run()
            co = sorted(
                (r.seed_id, r.step, r.url, r.depth)
                for r in eng.result_crawl_order().collect()
            )
            seen = sorted(r.url for r in eng.result_seen().collect())
            ents = sorted(
                (r.seed_id, r.kind, r.ord, r.value)
                for r in eng.result_entities().collect()
            )
            return co, seen, ents
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_results_invariant_under_parallelism(spark):
    paths = ensure_corpus(SMOKE)
    a = _run(spark, paths, 3)
    b = _run(spark, paths, 32)
    assert a == b
