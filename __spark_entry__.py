"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: run the full crawl engine (frontier,
LIFO/budget scheduling, robots, entity extraction, payload
validation) on the deterministic smoke corpus and return crawl_order.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-pipeline operators; oracle SQL is
the DuckDB twin (omitted only for engine-native crawl/payload ops,
which are exact-match-verified against the serial oracle in
tests/test_engine_vs_oracle.py instead).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _run_engine(spark: SparkSession, validate_images: bool = True):
    from scrapeulous_spark.plans.loop import CrawlEngine
    from scrapeulous_spark.session import ship_package
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    ship_package(spark)
    paths = ensure_corpus(SMOKE)
    wh = tempfile.mkdtemp(prefix="crawl_wh_")
    eng = CrawlEngine(spark, wh, paths, validate_images=validate_images)
    eng.run()
    return eng


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end crawl on the smoke corpus -> crawl_order."""
    eng = _run_engine(spark, validate_images=False)
    return eng.result_crawl_order()


def _engine_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Engine-native ops (non-SQL-expressible: iterative superstep crawl,
    binary payload decode). Rows-only driver check; exact-match
    verification lives in tests/ against the serial oracle."""

    def loop_frontier_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run_engine(spark, validate_images=False).result_crawl_order()

    def dedup_url_seen_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run_engine(spark, validate_images=False).result_seen()

    def udaf_social_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run_engine(spark, validate_images=False).result_entities()

    def udf_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
        from scrapeulous_spark.operators.fetch import validate_payloads
        from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

        paths = ensure_corpus(SMOKE)
        return validate_payloads(spark.read.parquet(paths["images"]))

    def src_s3_object(spark: SparkSession, sf_dir: str) -> DataFrame:
        from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

        paths = ensure_corpus(SMOKE)
        return spark.read.parquet(paths["images"]).drop("bytes")

    return {
        "loop_frontier_dfs": loop_frontier_dfs,
        "dedup_url_seen_engine": dedup_url_seen_engine,
        "udaf_social_extract": udaf_social_extract,
        "udf_image_decode": udf_image_decode,
        "src_s3_object": src_s3_object,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.session import ship_package

    def shipped(fn):
        # driver-owned sessions (arbitrary cwd) need the package zip on
        # their executors before any applyInPandas/mapInPandas stage runs
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            ship_package(spark)
            return fn(spark, sf_dir)

        return wrapper

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: shipped(q.spark) for name, q in load_all_catalogs().items()
    }
    out.update({name: shipped(fn) for name, fn in _engine_queries().items()})
    return out


def oracle_sql() -> dict[str, str]:
    from scrapeulous_spark.operators import load_all_catalogs

    return {name: q.oracle for name, q in load_all_catalogs().items() if q.oracle is not None}
