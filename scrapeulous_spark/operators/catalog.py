"""Operator catalog: every SURVEY.md §2 operator ID as a (Spark query,
DuckDB oracle SQL) pair over the driver's testdata tables, plus the
training-data-pipeline operators (dedup / similarity / text analysis).

Contract (per __spark_entry__.py): each entry's Spark DataFrame and
oracle SQL produce identical row counts, column names, and values at
sf=0.01. Conventions keeping the two engines bit-identical:
  * every computed column is explicitly aliased the same on both sides
  * float outputs are scaled to BIGINT (e.g. cents, x1000) or built
    from integer columns — never raw double aggregates
  * integer division via floor(); DuckDB try_cast where Spark's cast
    returns NULL on junk
  * regex patterns restricted to RE2-compatible (no lookahead) in
    oracle-checked queries; lookahead families (instagram/twitter/
    facebook) are verified engine-side against the serial oracle
    (tests/test_engine_vs_oracle.py) instead

Reference citations for each operator live in SURVEY.md §2 (file:line
into /root/reference); IDs here match that inventory.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class Q:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => rows-only check (non-SQL-expressible)


REGISTRY: dict[str, Q] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        REGISTRY[name] = Q(spark=fn, oracle=oracle)
        return fn

    return deco


# =====================================================================
# §2.6 ranking / limits (rank_position, rank_post_filter, rank_zero_based,
# limit_*, topk_frontier_pop)
# =====================================================================

@register(
    "rank_position",
    """SELECT o_custkey, o_orderkey,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS position
       FROM orders""",
)
def rank_position(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return T(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("position")
    )


@register(
    "rank_post_filter",
    """SELECT l_orderkey, l_linenumber,
              row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS position
       FROM lineitem WHERE l_quantity > 30""",
)
def rank_post_filter(spark, sf):
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return (
        T(spark, sf, "lineitem")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", F.row_number().over(w).alias("position"))
    )


@register(
    "rank_zero_based",
    """SELECT p_partkey, p_brand,
              row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) - 1 AS rank
       FROM part""",
)
def rank_zero_based(spark, sf):
    w = Window.partitionBy("p_brand").orderBy("p_partkey")
    return T(spark, sf, "part").select(
        "p_partkey", "p_brand", (F.row_number().over(w) - 1).alias("rank")
    )


@register(
    "limit_max_images",
    """SELECT p_brand, p_partkey, rn AS img_rank FROM (
         SELECT p_brand, p_partkey,
                row_number() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC, p_partkey) AS rn
         FROM part) WHERE rn <= 20""",
)
def limit_max_images(spark, sf):
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        T(spark, sf, "part")
        .select("p_brand", "p_partkey", F.row_number().over(w).alias("img_rank"))
        .filter(F.col("img_rank") <= 20)
    )


@register(
    "limit_max_requests",
    """SELECT user_id, event_id FROM (
         SELECT user_id, event_id,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events) WHERE rn <= 5""",
)
def limit_max_requests(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        T(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id")
    )


@register(
    "topk_frontier_pop",
    """SELECT o_custkey, o_orderkey AS top_orderkey,
              CAST(round(o_totalprice * 100) AS BIGINT) AS top_price_cents
       FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders) WHERE rn = 1""",
)
def topk_frontier_pop(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        T(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("top_orderkey"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("top_price_cents"),
        )
    )


@register(
    "union_ad_blocks",
    """SELECT o_custkey, o_orderkey, block_position,
              row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY block_rank, o_orderdate, o_orderkey) AS position
       FROM (
         SELECT o_custkey, o_orderkey, o_orderdate,
                CASE WHEN o_orderpriority LIKE '1-%' THEN 'top' ELSE 'bottom' END AS block_position,
                CASE WHEN o_orderpriority LIKE '1-%' THEN 0 ELSE 1 END AS block_rank
         FROM orders
         WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '5-%')""",
)
def union_ad_blocks(spark, sf):
    o = T(spark, sf, "orders")
    top = o.filter(F.col("o_orderpriority").startswith("1-")).select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.lit("top").alias("block_position"), F.lit(0).alias("block_rank"),
    )
    bottom = o.filter(F.col("o_orderpriority").startswith("5-")).select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.lit("bottom").alias("block_position"), F.lit(1).alias("block_rank"),
    )
    u = top.unionByName(bottom)
    w = Window.partitionBy("o_custkey").orderBy("block_rank", "o_orderdate", "o_orderkey")
    return u.select(
        "o_custkey", "o_orderkey", "block_position", F.row_number().over(w).alias("position")
    )


# =====================================================================
# §2.5 dedup / set ops / aggregation
# =====================================================================

@register(
    "dedup_url_seen",
    """SELECT user_id, event_type, min(event_id) AS first_seen_event,
              count(*) AS n_occurrences
       FROM events GROUP BY user_id, event_type""",
)
def dedup_url_seen(spark, sf):
    return (
        T(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(
            F.min("event_id").alias("first_seen_event"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
    )


@register(
    "dedup_result_fields",
    """SELECT user_id,
              array_to_string(list_sort(list_distinct(list(event_type))), ',') AS distinct_types
       FROM events GROUP BY user_id""",
)
def dedup_result_fields(spark, sf):
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("distinct_types"))
    )


@register(
    "agg_accumulate_pages",
    """SELECT user_id, count(*) AS n_events,
              count(DISTINCT event_type) AS n_types,
              CAST(round(sum(value) * 100) AS BIGINT) AS total_value_cents
       FROM events GROUP BY user_id""",
)
def agg_accumulate_pages(spark, sf):
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value") * 100).cast("bigint").alias("total_value_cents"),
        )
    )


@register(
    "agg_results_per_key",
    """SELECT user_id,
              array_to_string(list_sort(list(event_id)), ',') AS result_keys
       FROM events WHERE event_type = 'click' GROUP BY user_id""",
)
def agg_results_per_key(spark, sf):
    return (
        T(spark, sf, "events")
        .filter("event_type = 'click'")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("event_id")), lambda x: x.cast("string")),
                ",",
            ).alias("result_keys")
        )
    )


@register(
    "dedup_extensions",
    """SELECT l_orderkey,
              array_to_string(list_sort(list_distinct(list(l_returnflag))), '|') AS flags
       FROM lineitem GROUP BY l_orderkey""",
)
def dedup_extensions(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_join(F.array_sort(F.collect_set("l_returnflag")), "|").alias("flags"))
    )


# =====================================================================
# §2.7 joins
# =====================================================================

@register(
    "join_frontier_seen",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
)
def join_frontier_seen(spark, sf):
    """The seen-set anti-join shape (SURVEY.md §2.7): candidates minus
    already-seen. left_anti keeps the build side small (filtered seen)."""
    c = T(spark, sf, "customer")
    o = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


@register(
    "join_params_merge",
    """SELECT n_nationkey, n_name, r_name AS region_default,
              coalesce(nullif(substr(n_name, 1, 3), 'ALG'), r_name) AS merged_param
       FROM nation JOIN region ON n_regionkey = r_regionkey""",
)
def join_params_merge(spark, sf):
    n = T(spark, sf, "nation")
    r = T(spark, sf, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "n_nationkey",
            "n_name",
            F.col("r_name").alias("region_default"),
            F.coalesce(
                F.nullif(F.substring("n_name", 1, 3), F.lit("ALG")), F.col("r_name")
            ).alias("merged_param"),
        )
    )


@register(
    "join_budget_asof",
    """SELECT event_id, user_id,
              (coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) < 50.0) AS scheduled
       FROM events""",
)
def join_budget_asof(spark, sf):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return T(spark, sf, "events").select(
        "event_id",
        "user_id",
        (F.coalesce(F.sum("value").over(w), F.lit(0.0)) < 50.0).alias("scheduled"),
    )


@register(
    "join_imgref_consistency",
    """SELECT a.l_orderkey AS l_orderkey, count(*) AS n_lines,
              CAST(sum(CASE WHEN a.l_partkey = b.l_partkey THEN 1 ELSE 0 END) AS BIGINT)
                AS n_consistent
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
       GROUP BY a.l_orderkey""",
)
def join_imgref_consistency(spark, sf):
    li = T(spark, sf, "lineitem")
    a = li.select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("pk_a"))
    b = li.select("l_orderkey", "l_linenumber", F.col("l_partkey").alias("pk_b"))
    return (
        a.join(b, ["l_orderkey", "l_linenumber"])
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("pk_a") == F.col("pk_b"), 1).otherwise(0)).alias("n_consistent"),
        )
    )


# =====================================================================
# §2.4 filters / predicates
# =====================================================================

@register(
    "filt_clean_results",
    """SELECT event_type, count(*) AS n FROM events
       WHERE props IS NOT NULL AND trim(event_type) <> '' AND value IS NOT NULL
       GROUP BY event_type""",
)
def filt_clean_results(spark, sf):
    return (
        T(spark, sf, "events")
        .filter(
            F.col("props").isNotNull()
            & (F.trim("event_type") != "")
            & F.col("value").isNotNull()
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "filt_blocked_detect",
    """SELECT user_id,
              CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
              (sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) > 0) AS blocked
       FROM events GROUP BY user_id""",
)
def filt_blocked_detect(spark, sf):
    n_err = F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .agg(n_err.alias("n_errors"), (n_err > 0).alias("blocked"))
    )


@register(
    "filt_organic_admission",
    """SELECT doc_id, substr(text, 1, 30) AS title FROM documents
       WHERE n_chars > 150 AND trim(substr(text, 1, 30)) <> '' AND lang IS NOT NULL""",
)
def filt_organic_admission(spark, sf):
    d = T(spark, sf, "documents")
    title = F.substring("text", 1, 30)
    return d.filter(
        (F.col("n_chars") > 150) & (F.trim(title) != "") & F.col("lang").isNotNull()
    ).select("doc_id", title.alias("title"))


# =====================================================================
# §2.3 scalar functions
# =====================================================================

@register(
    "fn_num_norm_float",
    """SELECT p_partkey,
              p_size::VARCHAR || ',' || (p_partkey % 10)::VARCHAR AS raw_str,
              CAST(regexp_replace(p_size::VARCHAR || ',' || (p_partkey % 10)::VARCHAR,
                                  ',', '.', 'g') AS DOUBLE) AS norm_float
       FROM part""",
)
def fn_num_norm_float(spark, sf):
    s = F.concat(
        F.col("p_size").cast("string"), F.lit(","), (F.col("p_partkey") % 10).cast("string")
    )
    return T(spark, sf, "part").select(
        "p_partkey",
        s.alias("raw_str"),
        F.regexp_replace(s, ",", ".").cast("double").alias("norm_float"),
    )


@register(
    "fn_num_strip_parens",
    """SELECT s_suppkey,
              CAST(regexp_replace('(' || s_nationkey::VARCHAR || ')', '[()]', '', 'g')
                   AS BIGINT) AS reviews
       FROM supplier""",
)
def fn_num_strip_parens(spark, sf):
    s = F.concat(F.lit("("), F.col("s_nationkey").cast("string"), F.lit(")"))
    return T(spark, sf, "supplier").select(
        "s_suppkey", F.regexp_replace(s, r"[()]", "").cast("bigint").alias("reviews")
    )


@register(
    "fn_price_extract",
    """SELECT p_partkey, price_str,
              TRY_CAST(regexp_replace(regexp_replace(price_str, ',', '.', 'g'),
                                      '[^0-9.-]', '', 'g') AS DOUBLE) AS extracted_price
       FROM (SELECT p_partkey,
                    CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
                         ELSE '$' || p_size::VARCHAR || ',' || lpad((p_partkey % 100)::VARCHAR, 2, '0')
                    END AS price_str
             FROM part)""",
)
def fn_price_extract(spark, sf):
    price_str = F.when(F.col("p_partkey") % 7 == 0, F.lit("N/A")).otherwise(
        F.concat(
            F.lit("$"),
            F.col("p_size").cast("string"),
            F.lit(","),
            F.lpad((F.col("p_partkey") % 100).cast("string"), 2, "0"),
        )
    )
    # try_cast: Spark 4 runs ANSI mode by default, so a plain cast of the
    # 'N/A' junk row would throw instead of yielding NULL (the JS
    # parseFloat-returns-NaN analog, bing_scraper.js:316-320)
    extracted = F.regexp_replace(
        F.regexp_replace(price_str, ",", "."), r"[^0-9.-]", ""
    ).try_cast("double")
    return T(spark, sf, "part").select(
        "p_partkey", price_str.alias("price_str"), extracted.alias("extracted_price")
    )


@register(
    "filt_price_present",
    """SELECT p_partkey FROM (
         SELECT p_partkey,
                TRY_CAST(regexp_replace(regexp_replace(
                    CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
                         ELSE '$' || p_size::VARCHAR || ',' || lpad((p_partkey % 100)::VARCHAR, 2, '0')
                    END, ',', '.', 'g'), '[^0-9.-]', '', 'g') AS DOUBLE) AS price
         FROM part) WHERE price IS NOT NULL""",
)
def filt_price_present(spark, sf):
    return REGISTRY["fn_price_extract"].spark(spark, sf).filter(
        F.col("extracted_price").isNotNull()
    ).select("p_partkey")


@register(
    "fn_total_results",
    """SELECT o_orderkey, results_str,
              CAST(regexp_replace(regexp_extract(results_str, '[0-9,.\\s]{2,20}'),
                                  '[,.\\s]', '', 'g') AS BIGINT) AS total_results
       FROM (SELECT o_orderkey,
                    'About ' || CAST(floor(o_orderkey / 1000) AS BIGINT)::VARCHAR || ',' ||
                    lpad((o_orderkey % 1000)::VARCHAR, 3, '0') || ' results' AS results_str
             FROM orders)""",
)
def fn_total_results(spark, sf):
    results_str = F.concat(
        F.lit("About "),
        F.floor(F.col("o_orderkey") / 1000).cast("bigint").cast("string"),
        F.lit(","),
        F.lpad((F.col("o_orderkey") % 1000).cast("string"), 3, "0"),
        F.lit(" results"),
    )
    total = F.regexp_replace(
        F.regexp_extract(results_str, r"[0-9,.\s]{2,20}", 0), r"[,.\s]", ""
    ).cast("bigint")
    return T(spark, sf, "orders").select(
        "o_orderkey", results_str.alias("results_str"), total.alias("total_results")
    )


@register(
    "fn_split_dot_sep",
    """SELECT c_custkey, len(parts) AS n_parts, parts[1] AS first_part,
              parts[-1] AS place_type
       FROM (SELECT c_custkey,
                    string_split(CASE WHEN c_custkey % 2 = 0
                                      THEN 'Restaurant · $$ · ' || c_mktsegment
                                      ELSE 'Cafe · ' || c_mktsegment END, ' · ') AS parts
             FROM customer)""",
)
def fn_split_dot_sep(spark, sf):
    s = F.when(
        F.col("c_custkey") % 2 == 0,
        F.concat(F.lit("Restaurant · $$ · "), F.col("c_mktsegment")),
    ).otherwise(F.concat(F.lit("Cafe · "), F.col("c_mktsegment")))
    parts = F.split(s, " · ")
    return T(spark, sf, "customer").select(
        "c_custkey",
        F.size(parts).alias("n_parts"),
        F.element_at(parts, 1).alias("first_part"),
        F.element_at(parts, -1).alias("place_type"),
    )


@register(
    "fn_split_dash",
    """SELECT event_id, parts[1] AS platform, parts[2] AS date_part
       FROM (SELECT event_id,
                    string_split(event_type || ' - ' || user_id::VARCHAR, ' - ') AS parts
             FROM events)""",
)
def fn_split_dash(spark, sf):
    parts = F.split(
        F.concat(F.col("event_type"), F.lit(" - "), F.col("user_id").cast("string")), " - "
    )
    return T(spark, sf, "events").select(
        "event_id",
        F.element_at(parts, 1).alias("platform"),
        F.element_at(parts, 2).alias("date_part"),
    )


@register(
    "fn_str_insert",
    """SELECT c_custkey,
              CAST(substr(gps, 1, 2) || '.' || substr(gps, 3) AS DOUBLE) AS latitude
       FROM (SELECT c_custkey, lpad(((c_custkey * 37) % 1000000)::VARCHAR, 7, '0') AS gps
             FROM customer)""",
)
def fn_str_insert(spark, sf):
    gps = F.lpad(((F.col("c_custkey") * 37) % 1000000).cast("string"), 7, "0")
    lat = F.concat(F.substring(gps, 1, 2), F.lit("."), F.substring(gps, 3, 10)).cast("double")
    return T(spark, sf, "customer").select("c_custkey", lat.alias("latitude"))


@register(
    "fn_normalize_key",
    """SELECT c_custkey,
              lower(regexp_replace(trim(c_mktsegment || ' ' || c_name), '\\s', '_', 'g'))
                AS service_key
       FROM customer""",
)
def fn_normalize_key(spark, sf):
    s = F.concat(F.col("c_mktsegment"), F.lit(" "), F.col("c_name"))
    return T(spark, sf, "customer").select(
        "c_custkey", F.lower(F.regexp_replace(F.trim(s), r"\s", "_")).alias("service_key")
    )


@register(
    "fn_trim_nonempty",
    """SELECT doc_id, trim(substr(text, 1, doc_id % 5)) AS token
       FROM documents WHERE trim(substr(text, 1, doc_id % 5)) <> ''""",
)
def fn_trim_nonempty(spark, sf):
    tok = F.trim(F.expr("substr(text, 1, doc_id % 5)"))
    return (
        T(spark, sf, "documents")
        .select("doc_id", tok.alias("token"))
        .filter(F.col("token") != "")
    )


@register(
    "fn_base64_encode",
    """SELECT doc_id, base64(substr(text, 1, 16)::BLOB) AS payload_b64 FROM documents""",
)
def fn_base64_encode(spark, sf):
    return T(spark, sf, "documents").select(
        "doc_id", F.base64(F.encode(F.substring("text", 1, 16), "UTF-8")).alias("payload_b64")
    )


@register(
    "fn_regex_email",
    """SELECT s_suppkey, built, regexp_extract(built,
         '(([^<>()\\[\\]\\\\.,;:\\s@"]+(\\.[^<>()\\[\\]\\\\.,;:\\s@"]+)*)|(".+"))@((\\[[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}])|(([a-zA-Z\\-0-9]+\\.)+[a-zA-Z]{2,}))')
         AS email
       FROM (SELECT s_suppkey,
                    'contact ' || lower(replace(s_name, ' ', '')) || '@corp' ||
                    s_nationkey::VARCHAR || '.example.com today' AS built
             FROM supplier)""",
)
def fn_regex_email(spark, sf):
    from ..functions.entities import EMAIL

    built = F.concat(
        F.lit("contact "),
        F.lower(F.replace(F.col("s_name"), F.lit(" "), F.lit(""))),
        F.lit("@corp"),
        F.col("s_nationkey").cast("string"),
        F.lit(".example.com today"),
    )
    return T(spark, sf, "supplier").select(
        "s_suppkey",
        built.alias("built"),
        F.regexp_extract(built, EMAIL, 0).alias("email"),
    )


@register(
    "fn_regex_github",
    """SELECT s_suppkey,
              regexp_extract('see https://github.com/u' || s_suppkey::VARCHAR || ' now',
                             'http(s)?://(www\\.)?github\\.com/[A-z0-9_-]+/?') AS github
       FROM supplier""",
)
def fn_regex_github(spark, sf):
    from ..functions.entities import GITHUB

    s = F.concat(F.lit("see https://github.com/u"), F.col("s_suppkey").cast("string"), F.lit(" now"))
    return T(spark, sf, "supplier").select(
        "s_suppkey", F.regexp_extract(s, GITHUB, 0).alias("github")
    )


@register(
    "fn_regex_phones",
    """SELECT event_id,
              regexp_extract('call (' || lpad((user_id % 900 + 100)::VARCHAR, 3, '0') || ') ' ||
                             lpad((event_id % 900 + 100)::VARCHAR, 3, '0') || '-' ||
                             lpad((event_id % 9000 + 1000)::VARCHAR, 4, '0') || ' now',
                             '[\\+]?[(]?[0-9]{3}[)]?[-\\s\\.]?[0-9]{3}[-\\s\\.]?[0-9]{4,6}')
                AS phone
       FROM events""",
)
def fn_regex_phones(spark, sf):
    from ..functions.entities import PHONE_GENERIC

    s = F.concat(
        F.lit("call ("),
        F.lpad((F.col("user_id") % 900 + 100).cast("string"), 3, "0"),
        F.lit(") "),
        F.lpad((F.col("event_id") % 900 + 100).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("event_id") % 9000 + 1000).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    return T(spark, sf, "events").select(
        "event_id", F.regexp_extract(s, PHONE_GENERIC, 0).alias("phone")
    )


@register(
    "fn_url_param_extract",
    """SELECT p_partkey,
              replace(replace(regexp_extract(u, 'imgurl=(.*?)&', 1), '%3A', ':'), '%2F', '/')
                AS imgurl,
              replace(replace(regexp_extract(u, 'imgrefurl=(.*?)&', 1), '%3A', ':'), '%2F', '/')
                AS imgrefurl
       FROM (SELECT p_partkey,
                    'https://img.example.com/view?imgurl=http%3A%2F%2Fx' || p_partkey::VARCHAR ||
                    '&imgrefurl=http%3A%2F%2Fy' || p_partkey::VARCHAR || '&h=1' AS u
             FROM part)""",
)
def fn_url_param_extract(spark, sf):
    u = F.concat(
        F.lit("https://img.example.com/view?imgurl=http%3A%2F%2Fx"),
        F.col("p_partkey").cast("string"),
        F.lit("&imgrefurl=http%3A%2F%2Fy"),
        F.col("p_partkey").cast("string"),
        F.lit("&h=1"),
    )

    def dec(c):
        return F.replace(F.replace(c, F.lit("%3A"), F.lit(":")), F.lit("%2F"), F.lit("/"))

    return T(spark, sf, "part").select(
        "p_partkey",
        dec(F.regexp_extract(u, "imgurl=(.*?)&", 1)).alias("imgurl"),
        dec(F.regexp_extract(u, "imgrefurl=(.*?)&", 1)).alias("imgrefurl"),
    )


@register(
    "fn_url_parse",
    """SELECT c_custkey, u,
              regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1) AS host,
              replace(u, '#', '') AS normalized
       FROM (SELECT c_custkey,
                    'http://h' || c_nationkey::VARCHAR || '.example.com/path' ||
                    c_custkey::VARCHAR || '#frag' AS u
             FROM customer)""",
)
def fn_url_parse(spark, sf):
    from ..functions import urls as U

    u = F.concat(
        F.lit("http://h"),
        F.col("c_nationkey").cast("string"),
        F.lit(".example.com/path"),
        F.col("c_custkey").cast("string"),
        F.lit("#frag"),
    )
    return T(spark, sf, "customer").select(
        "c_custkey",
        u.alias("u"),
        U.host_col(u).alias("host"),
        U.normalize_col(u).alias("normalized"),
    )


@register(
    "src_serp_url_build",
    """SELECT p_partkey,
              'https://www.google.com/search?q=' || replace(p_name, ' ', '%20') ||
              '&num=' || p_size::VARCHAR AS serp_url
       FROM part""",
)
def src_serp_url_build(spark, sf):
    return T(spark, sf, "part").select(
        "p_partkey",
        F.concat(
            F.lit("https://www.google.com/search?q="),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("%20")),
            F.lit("&num="),
            F.col("p_size").cast("string"),
        ).alias("serp_url"),
    )
