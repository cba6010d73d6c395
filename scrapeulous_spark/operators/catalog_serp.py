"""SERP projection operators (SURVEY.md §2.2 proj_* family).

The reference's DOM extractors run `page.evaluate` against live SERPs;
here each operator's *dataflow shape* — admission filters, per-variant
rank conventions, coalesce fallback chains, split-arity dispatch,
error-string fallbacks, two-layout unions — is exercised over the
driver testdata with constructed columns standing in for DOM fields.
Reference citations per operator in SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import T, register

# ---------------------------------------------------------------- google


@register(
    "proj_google_organic",
    """SELECT source, doc_id, title, link, snippet,
              row_number() OVER (PARTITION BY source ORDER BY doc_id) AS position
       FROM (SELECT source, doc_id,
                    substr(text, 1, 30) AS title,
                    'http://' || source || '.example.com/doc/' || doc_id::VARCHAR AS link,
                    substr(text, 31, 60) AS snippet
             FROM documents)
       WHERE trim(title) <> '' AND trim(snippet) <> '' AND link IS NOT NULL""",
)
def proj_google_organic(spark, sf):
    """Admission requires title && snippet && link (google_scraper.js:204);
    position is 1-based in admitted order (:145)."""
    d = T(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.substring("text", 1, 30).alias("title"),
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("link"),
        F.substring("text", 31, 60).alias("snippet"),
    )
    admitted = d.filter(
        (F.trim("title") != "") & (F.trim("snippet") != "") & F.col("link").isNotNull()
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return admitted.withColumn("position", F.row_number().over(w))


@register(
    "proj_google_ads",
    """SELECT user_id, event_id, block_position,
              coalesce(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), ''),
                       'Error during parsing ad description') AS description,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY block_rank, ts, event_id) AS position
       FROM (SELECT user_id, event_id, ts, props,
                    CASE WHEN event_type = 'click' THEN 'top' ELSE 'bottom' END AS block_position,
                    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS block_rank
             FROM events WHERE event_type IN ('click', 'view'))""",
)
def proj_google_ads(spark, sf):
    """Top+bottom blocks share one position counter (google_scraper.js:
    221,254); parse failures yield error-string fields (:228-244)."""
    e = T(spark, sf, "events").filter(F.col("event_type").isin("click", "view"))
    blocks = e.select(
        "user_id", "event_id", "ts", "props",
        F.when(F.col("event_type") == "click", "top").otherwise("bottom").alias("block_position"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("block_rank"),
    )
    desc = F.coalesce(
        F.nullif(F.regexp_extract("props", r'"k": ([0-9]+)', 1), F.lit("")),
        F.lit("Error during parsing ad description"),
    )
    w = Window.partitionBy("user_id").orderBy("block_rank", "ts", "event_id")
    return blocks.select(
        "user_id", "event_id", "block_position",
        desc.alias("description"),
        F.row_number().over(w).alias("position"),
    )


@register(
    "proj_google_local_map",
    """SELECT c_custkey,
              CAST(substr(latd, 1, 2) || '.' || substr(latd, 3) AS DOUBLE) AS latitude,
              CAST(substr(lond, 1, 2) || '.' || substr(lond, 3) AS DOUBLE) AS longitude
       FROM (SELECT c_custkey,
                    regexp_extract(u, 'rllag=([0-9]+),([0-9]+)', 1) AS latd,
                    regexp_extract(u, 'rllag=([0-9]+),([0-9]+)', 2) AS lond
             FROM (SELECT c_custkey,
                          'https://maps.example.com/?rllag=' ||
                          ((c_custkey * 131) % 80000 + 10000000)::VARCHAR || ',' ||
                          ((c_custkey * 137) % 80000 + 10000000)::VARCHAR || '&z=14' AS u
                   FROM customer))""",
)
def proj_google_local_map(spark, sf):
    """rllag URL-param GPS digits with '.' inserted at index 2
    (google_scraper.js:271-309)."""
    u = F.concat(
        F.lit("https://maps.example.com/?rllag="),
        ((F.col("c_custkey") * 131) % 80000 + 10000000).cast("string"),
        F.lit(","),
        ((F.col("c_custkey") * 137) % 80000 + 10000000).cast("string"),
        F.lit("&z=14"),
    )

    def ins(d):
        return F.concat(F.substring(d, 1, 2), F.lit("."), F.substring(d, 3, 12)).cast("double")

    latd = F.regexp_extract(u, r"rllag=([0-9]+),([0-9]+)", 1)
    lond = F.regexp_extract(u, r"rllag=([0-9]+),([0-9]+)", 2)
    return T(spark, sf, "customer").select(
        "c_custkey", ins(latd).alias("latitude"), ins(lond).alias("longitude")
    )


@register(
    "proj_google_places",
    """SELECT c_custkey AS place_id,
              CAST(regexp_replace((c_custkey % 5)::VARCHAR || ',' || (c_custkey % 10)::VARCHAR,
                                  ',', '.', 'g') AS DOUBLE) AS rating,
              CAST(regexp_replace('(' || (c_custkey % 1000)::VARCHAR || ')', '[()]', '', 'g')
                   AS BIGINT) AS reviews,
              parts[-1] AS place_type,
              CASE WHEN len(parts) = 2 THEN parts[1] ELSE NULL END AS address,
              lower(regexp_replace(trim(c_mktsegment), '\\s', '_', 'g')) AS service_key,
              (c_custkey % 3 = 0) AS service_available
       FROM (SELECT *, string_split(CASE WHEN c_custkey % 2 = 0
                                         THEN c_name || ' · ' || c_mktsegment
                                         ELSE c_mktsegment END, ' · ') AS parts
             FROM customer)""",
)
def proj_google_places(spark, sf):
    """Places card: ','->'.'-normalized rating (google_scraper.js:351-352),
    parenthesized review count (:354-357), type = last ' · ' part (:359),
    arity-dispatched address (:362-371), normalized service_options keys
    with boolean values (:386-406)."""
    c = T(spark, sf, "customer")
    parts = F.split(
        F.when(
            F.col("c_custkey") % 2 == 0,
            F.concat(F.col("c_name"), F.lit(" · "), F.col("c_mktsegment")),
        ).otherwise(F.col("c_mktsegment")),
        " · ",
    )
    rating = F.regexp_replace(
        F.concat((F.col("c_custkey") % 5).cast("string"), F.lit(","), (F.col("c_custkey") % 10).cast("string")),
        ",", ".",
    ).cast("double")
    reviews = F.regexp_replace(
        F.concat(F.lit("("), (F.col("c_custkey") % 1000).cast("string"), F.lit(")")), r"[()]", ""
    ).cast("bigint")
    return c.select(
        F.col("c_custkey").alias("place_id"),
        rating.alias("rating"),
        reviews.alias("reviews"),
        F.element_at(parts, -1).alias("place_type"),
        F.when(F.size(parts) == 2, F.element_at(parts, 1)).alias("address"),
        F.lower(F.regexp_replace(F.trim("c_mktsegment"), r"\s", "_")).alias("service_key"),
        (F.col("c_custkey") % 3 == 0).alias("service_available"),
    )


@register(
    "proj_google_related",
    """SELECT doc_id, substr(text, 1, 20) AS query,
              'https://www.google.com/search?q=' || replace(substr(text, 1, 20), ' ', '%20')
                AS link
       FROM documents WHERE lang = 'en'""",
)
def proj_google_related(spark, sf):
    q = F.substring("text", 1, 20)
    return (
        T(spark, sf, "documents")
        .filter("lang = 'en'")
        .select(
            "doc_id",
            q.alias("query"),
            F.concat(
                F.lit("https://www.google.com/search?q="), F.replace(q, F.lit(" "), F.lit("%20"))
            ).alias("link"),
        )
    )


@register(
    "proj_google_search_info",
    """SELECT o_orderkey,
              'q' || o_custkey::VARCHAR AS query_displayed,
              CASE WHEN o_orderstatus = 'F' THEN 'results_for_exact_spelling'
                   ELSE 'showing_results_for' END AS organic_results_state,
              CAST(regexp_replace(regexp_extract(s, '[0-9,.\\s]{2,20}'), '[,.\\s]', '', 'g')
                   AS BIGINT) AS total_results,
              regexp_extract(s, '\\(([0-9]+\\.[0-9]+) seconds\\)', 1) AS time_taken
       FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
                    'About ' || CAST(floor(o_orderkey / 1000) AS BIGINT)::VARCHAR || ',' ||
                    lpad((o_orderkey % 1000)::VARCHAR, 3, '0') || ' results (0.' ||
                    lpad((o_orderkey % 100)::VARCHAR, 2, '0') || ' seconds)' AS s
             FROM orders)""",
)
def proj_google_search_info(spark, sf):
    """search_information struct: total_results + time_taken from the
    dual-match regex (google_scraper.js:488-499), spelling-corrected
    state flip (:509-523)."""
    o = T(spark, sf, "orders")
    s = F.concat(
        F.lit("About "),
        F.floor(F.col("o_orderkey") / 1000).cast("bigint").cast("string"),
        F.lit(","),
        F.lpad((F.col("o_orderkey") % 1000).cast("string"), 3, "0"),
        F.lit(" results (0."),
        F.lpad((F.col("o_orderkey") % 100).cast("string"), 2, "0"),
        F.lit(" seconds)"),
    )
    return o.select(
        "o_orderkey",
        F.concat(F.lit("q"), F.col("o_custkey").cast("string")).alias("query_displayed"),
        F.when(F.col("o_orderstatus") == "F", "results_for_exact_spelling")
        .otherwise("showing_results_for")
        .alias("organic_results_state"),
        F.regexp_replace(F.regexp_extract(s, r"[0-9,.\s]{2,20}", 0), r"[,.\s]", "")
        .cast("bigint")
        .alias("total_results"),
        F.regexp_extract(s, r"\(([0-9]+\.[0-9]+) seconds\)", 1).alias("time_taken"),
    )


# ------------------------------------------------------------------ bing


@register(
    "proj_bing_organic",
    """SELECT doc_id, title, link,
              row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS position, lang
       FROM (SELECT doc_id, lang, substr(text, 1, 25) AS title,
                    CASE WHEN n_chars > 120
                         THEN 'https://doc' || doc_id::VARCHAR || '.example.com/' END AS link
             FROM documents)
       WHERE title IS NOT NULL AND trim(title) <> '' AND link IS NOT NULL""",
)
def proj_bing_organic(spark, sf):
    """Bing admission is title && link only; position is assigned AFTER
    the filter — dense post-filter rank (bing_scraper.js:148-150,
    SURVEY §1.4.4)."""
    d = T(spark, sf, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, 25).alias("title"),
        F.when(
            F.col("n_chars") > 120,
            F.concat(F.lit("https://doc"), F.col("doc_id").cast("string"), F.lit(".example.com/")),
        ).alias("link"),
    )
    admitted = d.filter(F.col("title").isNotNull() & (F.trim("title") != "") & F.col("link").isNotNull())
    w = Window.partitionBy("lang").orderBy("doc_id")
    return admitted.select("doc_id", "title", "link", F.row_number().over(w).alias("position"), "lang")


@register(
    "proj_bing_ads",
    """SELECT event_id,
              coalesce(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), ''),
                       'Error while parsing title') AS title,
              parts[1] AS address,
              CASE WHEN len(parts) >= 2 THEN parts[2] END AS phone,
              CAST(regexp_replace(regexp_extract(
                     (user_id % 5)::VARCHAR || ',' || (event_id % 10)::VARCHAR,
                     '[0-9][,.][0-9]'), ',', '.', 'g') AS DOUBLE) AS rating
       FROM (SELECT event_id, user_id, props,
                    string_split('Street ' || (user_id % 99)::VARCHAR ||
                                 CASE WHEN event_id % 3 = 0 THEN ' - 030 555' ELSE '' END,
                                 ' - ') AS parts
             FROM events)""",
)
def proj_bing_ads(spark, sf):
    """Error-string fallback fields (bing_scraper.js:175-191), ' - '
    address/phone split (:203-211), aria-label rating regex \\d[,.]\\d
    (:214-221)."""
    e = T(spark, sf, "events")
    parts = F.split(
        F.concat(
            F.lit("Street "),
            (F.col("user_id") % 99).cast("string"),
            F.when(F.col("event_id") % 3 == 0, F.lit(" - 030 555")).otherwise(F.lit("")),
        ),
        " - ",
    )
    rating = F.regexp_replace(
        F.regexp_extract(
            F.concat((F.col("user_id") % 5).cast("string"), F.lit(","), (F.col("event_id") % 10).cast("string")),
            r"[0-9][,.][0-9]",
            0,
        ),
        ",",
        ".",
    ).cast("double")
    return e.select(
        "event_id",
        F.coalesce(
            F.nullif(F.regexp_extract("props", r'"k": ([0-9]+)', 1), F.lit("")),
            F.lit("Error while parsing title"),
        ).alias("title"),
        F.element_at(parts, 1).alias("address"),
        F.when(F.size(parts) >= 2, F.element_at(parts, 2)).alias("phone"),
        rating.alias("rating"),
    )


@register(
    "proj_bing_shopping",
    """SELECT p_partkey, price_str, extracted_price,
              array_to_string(list_sort(list_distinct(string_split(p_type || '|' || p_brand, '|'))), '|')
                AS extensions
       FROM (SELECT p_partkey, p_type, p_brand,
                    CASE WHEN p_partkey % 7 = 0 THEN NULL
                         ELSE p_size::VARCHAR || ',' || lpad((p_partkey % 100)::VARCHAR, 2, '0') || ' €'
                    END AS price_str,
                    TRY_CAST(regexp_replace(regexp_replace(
                        CASE WHEN p_partkey % 7 = 0 THEN NULL
                             ELSE p_size::VARCHAR || ',' || lpad((p_partkey % 100)::VARCHAR, 2, '0') || ' €'
                        END, ',', '.', 'g'), '[^0-9.-]', '', 'g') AS DOUBLE) AS extracted_price
             FROM part)
       WHERE price_str IS NOT NULL""",
)
def proj_bing_shopping(spark, sf):
    """Shopping unit: price + extracted_price (','->'.', strip non-numeric,
    bing_scraper.js:312-320), Set->array extensions dedup (:323-339),
    admit only priced units (:356-358)."""
    p = T(spark, sf, "part")
    price_str = F.when(F.col("p_partkey") % 7 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(
            F.col("p_size").cast("string"), F.lit(","),
            F.lpad((F.col("p_partkey") % 100).cast("string"), 2, "0"), F.lit(" €"),
        )
    )
    extracted = F.regexp_replace(F.regexp_replace(price_str, ",", "."), r"[^0-9.-]", "").try_cast(
        "double"
    )
    exts = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.concat("p_type", F.lit("|"), "p_brand"), r"\|"))),
        "|",
    )
    return (
        p.select(
            "p_partkey",
            price_str.alias("price_str"),
            extracted.alias("extracted_price"),
            exts.alias("extensions"),
        )
        .filter(F.col("price_str").isNotNull())
    )


@register(
    "proj_bing_places",
    """SELECT place_id, layout, name, phone FROM (
         SELECT 'A' AS layout, c_custkey AS place_id, c_name AS name,
                CASE WHEN c_custkey % 4 = 0 THEN '030 ' || (c_custkey % 9999)::VARCHAR END AS phone
         FROM customer
         UNION ALL
         SELECT 'B' AS layout, 100000 + s_suppkey AS place_id, s_name AS name,
                NULL AS phone
         FROM supplier)""",
)
def proj_bing_places(spark, sf):
    """Two place layouts unioned into one output (bing_scraper.js:383-471
    ∪ :474-549) — unionByName with missing columns filled NULL."""
    a = T(spark, sf, "customer").select(
        F.lit("A").alias("layout"),
        F.col("c_custkey").alias("place_id"),
        F.col("c_name").alias("name"),
        F.when(
            F.col("c_custkey") % 4 == 0,
            F.concat(F.lit("030 "), (F.col("c_custkey") % 9999).cast("string")),
        ).alias("phone"),
    )
    b = T(spark, sf, "supplier").select(
        F.lit("B").alias("layout"),
        (F.col("s_suppkey") + 100000).alias("place_id"),
        F.col("s_name").alias("name"),
    )
    return a.unionByName(b, allowMissingColumns=True).select("place_id", "layout", "name", "phone")


@register(
    "proj_bing_questions",
    """SELECT DISTINCT event_type || '?' AS question FROM events""",
)
def proj_bing_questions(spark, sf):
    return (
        T(spark, sf, "events")
        .select(F.concat("event_type", F.lit("?")).alias("question"))
        .distinct()
    )


@register(
    "proj_bing_pagination",
    """SELECT o_custkey, 'Page ' || page::VARCHAR AS page_text,
              'https://bing.example.com/search?first=' || ((page - 1) * 10 + 1)::VARCHAR AS href
       FROM (SELECT DISTINCT o_custkey, (o_orderkey % 5) + 1 AS page FROM orders)""",
)
def proj_bing_pagination(spark, sf):
    """other_pages text->href entries (bing_scraper.js:569-596) as rows
    (the map_from_entries form feeds the engine; rows here keep the
    oracle comparable)."""
    o = T(spark, sf, "orders").select(
        "o_custkey", ((F.col("o_orderkey") % 5) + 1).alias("page")
    ).distinct()
    return o.select(
        "o_custkey",
        F.concat(F.lit("Page "), F.col("page").cast("string")).alias("page_text"),
        F.concat(
            F.lit("https://bing.example.com/search?first="),
            ((F.col("page") - 1) * 10 + 1).cast("string"),
        ).alias("href"),
    )


@register(
    "proj_bing_videos",
    """SELECT event_id, parts[1] AS platform, parts[2] AS video_date
       FROM (SELECT event_id, value,
                    string_split(event_type || ' - 2024-0' || ((event_id % 9) + 1)::VARCHAR, ' - ')
                      AS parts
             FROM events)
       WHERE value > 5""",
)
def proj_bing_videos(spark, sf):
    """platform+date from ' - ' split (bing_scraper.js:631-639), admission
    gate (:641-643)."""
    e = T(spark, sf, "events")
    parts = F.split(
        F.concat("event_type", F.lit(" - 2024-0"), ((F.col("event_id") % 9) + 1).cast("string")),
        " - ",
    )
    return (
        e.filter(F.col("value") > 5)
        .select(
            "event_id",
            F.element_at(parts, 1).alias("platform"),
            F.element_at(parts, 2).alias("video_date"),
        )
    )


@register(
    "proj_bing_search_info",
    """SELECT o_orderkey,
              CAST(regexp_replace(regexp_extract(
                     CAST(floor(o_orderkey / 1000) AS BIGINT)::VARCHAR || '’' ||
                     lpad((o_orderkey % 1000)::VARCHAR, 3, '0') || ' Ergebnisse',
                     '[0-9,.\\s’]{2,20}'), '[,.\\s’]', '', 'g') AS BIGINT) AS total_results
       FROM orders""",
)
def proj_bing_search_info(spark, sf):
    """Bing total_results variant including the ’ thousands separator
    (bing_scraper.js:688-698)."""
    s = F.concat(
        F.floor(F.col("o_orderkey") / 1000).cast("bigint").cast("string"),
        F.lit("’"),
        F.lpad((F.col("o_orderkey") % 1000).cast("string"), 3, "0"),
        F.lit(" Ergebnisse"),
    )
    return T(spark, sf, "orders").select(
        "o_orderkey",
        F.regexp_replace(F.regexp_extract(s, r"[0-9,.\s’]{2,20}", 0), r"[,.\s’]", "")
        .cast("bigint")
        .alias("total_results"),
    )


# ------------------------------------------------------- amazon / custom


@register(
    "proj_amazon_products",
    """SELECT o_orderkey AS asin, count(*) AS n_items,
              array_to_string(list_sort(list(l_partkey)), ',') AS product_info,
              (min(o_orderpriority) LIKE '1-%') AS prime_delivery
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       GROUP BY o_orderkey""",
)
def proj_amazon_products(spark, sf):
    """Product card: accumulated product_info texts (amazon.js:23-74),
    prime_delivery presence bool (:50-55)."""
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.array_join(
                F.transform(F.array_sort(F.collect_list("l_partkey")), lambda x: x.cast("string")),
                ",",
            ).alias("product_info"),
            F.min("o_orderpriority").startswith("1-").alias("prime_delivery"),
        )
        .select(F.col("o_orderkey").alias("asin"), "n_items", "product_info", "prime_delivery")
    )


@register(
    "proj_nytimes_headlines",
    """SELECT doc_id, substr(text, 1, 20) AS headline, substr(text, 21, 40) AS snippet,
              'https://www.nytimes.com/a/' || doc_id::VARCHAR AS link
       FROM documents
       WHERE lang = 'en' AND n_chars > 200 AND trim(substr(text, 1, 20)) <> ''""",
)
def proj_nytimes_headlines(spark, sf):
    """Headline rows with text&&link admission (nytimes.js:21-48)."""
    d = T(spark, sf, "documents")
    headline = F.substring("text", 1, 20)
    return d.filter(
        (F.col("lang") == "en") & (F.col("n_chars") > 200) & (F.trim(headline) != "")
    ).select(
        "doc_id",
        headline.alias("headline"),
        F.substring("text", 21, 40).alias("snippet"),
        F.concat(F.lit("https://www.nytimes.com/a/"), F.col("doc_id").cast("string")).alias("link"),
    )


@register(
    "proj_rev_image_meta",
    """SELECT user_id, event_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS rank,
              coalesce(nullif(regexp_extract(props, '"k": ([0-9]+)', 1), ''),
                       'u' || user_id::VARCHAR) AS imgurl,
              CASE WHEN regexp_extract(props, '"k": ([0-9]+)', 1) <> ''
                   THEN 'normal' ELSE 'data-iurl' END AS type
       FROM events""",
)
def proj_rev_image_meta(spark, sf):
    """Reverse-image metadata: coalesce fallback chain for imgurl
    (reverse_image_google_final.js:148-176), 0-based rank (:134)."""
    e = T(spark, sf, "events")
    k = F.regexp_extract("props", r'"k": ([0-9]+)', 1)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.row_number().over(w) - 1).alias("rank"),
        F.coalesce(F.nullif(k, F.lit("")), F.concat(F.lit("u"), F.col("user_id").cast("string"))).alias(
            "imgurl"
        ),
        F.when(k != "", "normal").otherwise("data-iurl").alias("type"),
    )


@register(
    "proj_bing_rev_image",
    """SELECT p_partkey,
              replace(replace(regexp_extract(u, 'mediaurl=(.*)', 1), '%3A', ':'), '%2F', '/')
                AS imgurl
       FROM (SELECT p_partkey,
                    'https://www.bing.com/images/search?view=detailv2&mediaurl=http%3A%2F%2Fimg'
                    || p_partkey::VARCHAR AS u
             FROM part)""",
)
def proj_bing_rev_image(spark, sf):
    """mediaurl=(.*) greedy extract + percent-decode
    (reverse_image_bing.js:47-53)."""
    u = F.concat(
        F.lit("https://www.bing.com/images/search?view=detailv2&mediaurl=http%3A%2F%2Fimg"),
        F.col("p_partkey").cast("string"),
    )
    dec = F.replace(
        F.replace(F.regexp_extract(u, "mediaurl=(.*)", 1), F.lit("%3A"), F.lit(":")),
        F.lit("%2F"),
        F.lit("/"),
    )
    return T(spark, sf, "part").select("p_partkey", dec.alias("imgurl"))


@register(
    "sink_raw_html",
    """SELECT doc_id, '<html><body>' || text || '</body></html>' AS html FROM documents""",
)
def sink_raw_html(spark, sf):
    """Raw payload attach (google_scraper.js:70; amazon.js:75)."""
    return T(spark, sf, "documents").select(
        "doc_id", F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")).alias("html")
    )
