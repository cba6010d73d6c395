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


# One engine run serves every engine-native query in the same driver
# process: loop_frontier_dfs / dedup_url_seen_engine / udaf_social_extract
# are three views of the SAME crawl, so re-running ~40s of supersteps per
# query only burns the driver's correctness budget (round-1 verdict #3).
_ENGINE_CACHE: dict[tuple[str, str, bool], object] = {}


def _run_engine(spark: SparkSession, validate_images: bool = True):
    from scrapeulous_spark.plans.loop import CrawlEngine
    from scrapeulous_spark.session import ship_package
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    key = (spark.sparkContext.applicationId, SMOKE.tag, validate_images)
    cached = _ENGINE_CACHE.get(key)
    if cached is not None:
        return cached
    ship_package(spark)
    paths = ensure_corpus(SMOKE)
    wh = tempfile.mkdtemp(prefix="crawl_wh_")
    eng = CrawlEngine(spark, wh, paths, validate_images=validate_images)
    eng.run()
    _ENGINE_CACHE[key] = eng
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
        from pyspark.sql import functions as F

        from scrapeulous_spark.operators.fetch import validate_payloads
        from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

        paths = ensure_corpus(SMOKE)
        report = validate_payloads(spark.read.parquet(paths["images"]))
        # psnr_db itself is not SQL-twinnable (the decode runs only on
        # the Spark side); everything else — decode success, recomputed
        # phash, exactness flags, the >=40dB criterion — is pinned by
        # corpus invariants the DuckDB twin asserts per row
        return report.select(
            "image_id",
            "fmt",
            "decode_ok",
            "phash_recomputed",
            "phash_match",
            "pixels_allclose",
            (F.col("psnr_db") >= 40.0).alias("psnr_ok"),
        )

    def src_s3_object(spark: SparkSession, sf_dir: str) -> DataFrame:
        from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

        paths = ensure_corpus(SMOKE)
        return spark.read.parquet(paths["images"]).drop("bytes")

    def agg_crawl_depth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Crawl wave analytics over the ENGINE's crawl_order (the
        oracle twin aggregates the serial oracle's parquet, so the
        driver compare doubles as an engine-vs-oracle check at the
        aggregate level): per depth, URLs fetched, fetch successes,
        seeds reaching the depth, and distinct hosts touched."""
        from pyspark.sql import functions as F

        co = _run_engine(spark, validate_images=False).result_crawl_order()
        return (
            co.groupBy(F.col("depth").cast("int").alias("depth"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_urls"),
                F.sum(F.col("fetch_ok").cast("int")).cast("bigint").alias("n_ok"),
                F.countDistinct("seed_id").cast("bigint").alias("n_seeds"),
                F.countDistinct(
                    F.regexp_extract("url", "^https?://([^/]+)", 1)
                ).cast("bigint").alias("n_hosts"),
            )
        )

    def agg_seed_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-seed crawl yield joining TWO engine tables (crawl_order
        x entities) — the oracle twin joins the serial oracle's two
        parquets identically, so the compare checks cross-table
        consistency of the engine outputs, not just each table alone."""
        from pyspark.sql import functions as F

        eng = _run_engine(spark, validate_images=False)
        co = eng.result_crawl_order().groupBy("seed_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            F.sum(F.col("fetch_ok").cast("int")).cast("bigint").alias("n_ok"),
        )
        ent = eng.result_entities().groupBy("seed_id").agg(
            F.sum((F.col("kind") == "email").cast("int"))
            .cast("bigint")
            .alias("n_emails"),
            F.sum((F.col("kind") == "phone").cast("int"))
            .cast("bigint")
            .alias("n_phones"),
        )
        return (
            co.join(ent, "seed_id", "left")
            .select(
                F.col("seed_id").cast("bigint").alias("seed_id"),
                "n_urls",
                "n_ok",
                F.coalesce("n_emails", F.lit(0)).cast("bigint").alias("n_emails"),
                F.coalesce("n_phones", F.lit(0)).cast("bigint").alias("n_phones"),
            )
        )

    return {
        "loop_frontier_dfs": loop_frontier_dfs,
        "dedup_url_seen_engine": dedup_url_seen_engine,
        "udaf_social_extract": udaf_social_extract,
        "udf_image_decode": udf_image_decode,
        "src_s3_object": src_s3_object,
        "agg_crawl_depth_stats": agg_crawl_depth_stats,
        "agg_seed_yield": agg_seed_yield,
    }


# Queries the round-1 driver DID verify (CORRECTNESS_r01.json rows).
# The driver walks queries() in registration order under a budget and
# round 1 starved everything after position 50 — so the never-verified
# set registers FIRST and these proven-green ones re-verify last.
_VERIFIED_R01 = [
    "rank_position", "rank_post_filter", "rank_zero_based",
    "limit_max_images", "limit_max_requests", "topk_frontier_pop",
    "union_ad_blocks", "dedup_url_seen", "dedup_result_fields",
    "agg_accumulate_pages", "agg_results_per_key", "dedup_extensions",
    "join_frontier_seen", "join_params_merge", "join_budget_asof",
    "join_imgref_consistency", "filt_clean_results", "filt_blocked_detect",
    "filt_organic_admission", "fn_num_norm_float", "fn_num_strip_parens",
    "fn_price_extract", "filt_price_present", "fn_total_results",
    "fn_split_dot_sep", "fn_split_dash", "fn_str_insert",
    "fn_normalize_key", "fn_trim_nonempty", "fn_base64_encode",
    "fn_regex_email", "fn_regex_github", "fn_regex_phones",
    "fn_url_param_extract", "fn_url_parse", "src_serp_url_build",
    "src_pagination_loop", "sink_result_json", "sink_pdf",
    "fn_uri_encode", "fn_url_params_map", "fn_regex_instagram",
    "fn_regex_facebook", "fn_regex_twitter", "fn_page_title",
    # ran in round 1 as rows-only (no_oracle) — they now have real
    # oracles where twinnable, but were at least SEEN by the driver
    "src_http_get", "src_browser_render", "sink_screenshot",
    "udf_custom_crawler", "join_payload_oracle",
]


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

    catalog = load_all_catalogs()
    seen_r01 = set(_VERIFIED_R01)
    # queries added AFTER the round-2 driver-order fix register at the
    # tail of their modules; surface them FIRST so a tight driver budget
    # starves re-verification, never first-verification
    newest_first = [
        "audit_embedding_dims",
        "src_json_results",
        "dedup_ppjoin_prefix", "join_set_containment",
        "sim_topk_join",
        "pipeline_frontier_admission_e2e",
        "join_redirect_resolve",
        "audit_url_templates", "agg_host_reputation", "img_size_gate",
        "text_lm_logprob",
        "src_warc_records", "src_sitemap_urls", "fn_html_to_text",
        "rank_recrawl_priority", "text_char_entropy",
        "agg_source_rollup", "agg_lang_pivot", "join_event_session_range",
        "agg_event_rolling_rate", "agg_value_percentiles",
        "setop_converted_users", "join_user_stats_bucketed", "fn_url_surt",
        "rank_link_pagerank", "diff_crawl_snapshots", "audit_politeness_gaps",
        "audit_documents_profile",
    ]
    stale = [n for n in newest_first if n not in catalog]
    assert not stale, f"newest_first names not in catalog (renamed?): {stale}"
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: shipped(catalog[name].spark) for name in newest_first
    }
    # engine-native queries next — the flagship crawl views (exact-match
    # vs the serial oracle) must never be starved by the budget; ONE
    # shared crawl serves them all (memoized _run_engine)
    out.update({name: shipped(fn) for name, fn in _engine_queries().items()})
    out.update(
        {
            name: shipped(q.spark)
            for name, q in catalog.items()
            if name not in seen_r01 and name not in out
        }
    )
    # round-1-verified queries re-verify last
    out.update(
        {
            name: shipped(catalog[name].spark)
            for name in _VERIFIED_R01
            if name in catalog
        }
    )
    return out


def _engine_oracles() -> dict[str, str]:
    """DuckDB twins for the engine-native queries. The crawl views are
    checked against the MATERIALIZED SERIAL ORACLE (plans/oracle.py, an
    independent plain-Python replay of social.js:34-98 — the same
    source of truth tests/test_engine_vs_oracle.py exact-matches), so
    the driver's rows+schema+hash compare IS the engine-vs-oracle gate.
    src_s3_object/udf_image_decode twin directly against the corpus
    parquet + its decode invariants (sink_screenshot stays rows-only:
    its output IS the binary PNG encode)."""
    from scrapeulous_spark.plans.oracle_export import ensure_oracle_parquet
    from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus

    op = ensure_oracle_parquet(SMOKE)
    cp = ensure_corpus(SMOKE)
    return {
        "loop_frontier_dfs": f"SELECT * FROM read_parquet('{op['crawl_order']}')",
        "dedup_url_seen_engine": f"SELECT url FROM read_parquet('{op['seen']}')",
        "udaf_social_extract": f"SELECT * FROM read_parquet('{op['entities']}')",
        "src_s3_object": (
            "SELECT image_id, w, h, fmt, caption, phash "
            f"FROM read_parquet('{cp['images']}')"
        ),
        # corpus invariant: every stored payload decodes (exactly for
        # png; post-quantization exactly and PSNR>=40dB for qpng) and
        # the recomputed phash equals the stored one — pinned TRUE per
        # row, with phash_recomputed checked against the stored value
        "udf_image_decode": (
            "SELECT image_id, fmt, TRUE AS decode_ok, "
            "phash AS phash_recomputed, TRUE AS phash_match, "
            "TRUE AS pixels_allclose, TRUE AS psnr_ok "
            f"FROM read_parquet('{cp['images']}')"
        ),
        # engine-side aggregate vs the SERIAL oracle's crawl aggregated
        # identically — equality holds iff the engine's crawl matches
        "agg_crawl_depth_stats": (
            "SELECT CAST(depth AS INT) AS depth, "
            "CAST(count(*) AS BIGINT) AS n_urls, "
            "CAST(sum(CASE WHEN fetch_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok, "
            "CAST(count(DISTINCT seed_id) AS BIGINT) AS n_seeds, "
            "CAST(count(DISTINCT regexp_extract(url, '^https?://([^/]+)', 1)) AS BIGINT)"
            " AS n_hosts "
            f"FROM read_parquet('{op['crawl_order']}') GROUP BY depth"
        ),
        "agg_seed_yield": (
            "WITH co AS (SELECT seed_id, CAST(count(*) AS BIGINT) AS n_urls, "
            "CAST(sum(CASE WHEN fetch_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok "
            f"FROM read_parquet('{op['crawl_order']}') GROUP BY seed_id), "
            "ent AS (SELECT seed_id, "
            "CAST(sum(CASE WHEN kind = 'email' THEN 1 ELSE 0 END) AS BIGINT) AS n_emails, "
            "CAST(sum(CASE WHEN kind = 'phone' THEN 1 ELSE 0 END) AS BIGINT) AS n_phones "
            f"FROM read_parquet('{op['entities']}') GROUP BY seed_id) "
            "SELECT CAST(co.seed_id AS BIGINT) AS seed_id, co.n_urls, co.n_ok, "
            "CAST(coalesce(ent.n_emails, 0) AS BIGINT) AS n_emails, "
            "CAST(coalesce(ent.n_phones, 0) AS BIGINT) AS n_phones "
            "FROM co LEFT JOIN ent ON co.seed_id = ent.seed_id"
        ),
    }


def oracle_sql() -> dict[str, str]:
    from scrapeulous_spark.operators import load_all_catalogs

    out = {
        name: q.oracle for name, q in load_all_catalogs().items() if q.oracle is not None
    }
    out.update(_engine_oracles())
    return out
