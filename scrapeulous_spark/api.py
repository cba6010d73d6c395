"""User-facing API facade — the reference's three endpoints as
DataFrame-returning functions.

The reference is invoked through three HTTP endpoints that map a
crawler function over a batch of items (/root/reference/README.md:7-11):
``/crawl`` (HTML from URLs), ``/serp`` (search-engine scraping),
``/custom`` (user-supplied crawler class). This module is the switch
path for a reference user: the same (items, options) call shape,
returning DataFrames instead of JSON arrays, over the engine's page
stores.

Options defaulting reproduces the reference's falsy-coercion semantics
EXACTLY, bugs included (SURVEY §1.4): the code's behavior, not its doc
comments, is normative because the north rule demands exact-match
crawl behavior.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.fetch import fetch_join
from .sources.corpus import SMOKE, ensure_corpus


def coerce_options(options: dict | None) -> dict:
    """Reference options-defaulting, falsy-coercion bugs preserved:

    * ``max_requests`` — documented default 10 (social.js:13) but the
      code falsy-coerces to **0** (social.js:45-47): only the seed page
      is fetched unless a positive budget is passed.
    * ``stay_within_domain`` — falsy-coerced to True (social.js:48-50),
      so passing False still yields True: same-domain filtering cannot
      be turned off.
    * ``link_depth`` — falsy -> 1 (social.js:42-44).
    * ``num_pages`` — falsy -> 1 (google_scraper.js:38-41).
    * ``max_images`` — falsy -> 20; ``max_images_clicking`` clamped to
      min(itself, max_images) (reverse_image_google_final.js:36-46).
    * ``wait_until`` — falsy -> 'domcontentloaded' (render.js:13).
    """
    o = dict(options or {})
    if not o.get("max_requests"):
        o["max_requests"] = 0
    if not o.get("stay_within_domain"):
        o["stay_within_domain"] = True
    if not o.get("link_depth"):
        o["link_depth"] = 1
    if not o.get("num_pages"):
        o["num_pages"] = 1
    if not o.get("max_images"):
        o["max_images"] = 20
    # falsy -> 20 FIRST, then clamp to max_images — the reference
    # defaults the two independently (reverse_image_google_final.js:
    # 36-46), so max_images=50 with clicking unset yields 20, not 50
    o["max_images_clicking"] = min(
        o.get("max_images_clicking") or 20, o["max_images"]
    )
    if not o.get("wait_until"):
        o["wait_until"] = "domcontentloaded"
    return o


def _items_df(spark: SparkSession, items, col: str) -> DataFrame:
    """Accept a python list or a DataFrame already carrying `col`."""
    if isinstance(items, DataFrame):
        return items.select(col)
    return spark.createDataFrame([(x,) for x in items], f"{col} string")


def crawl(
    spark: SparkSession,
    items,
    options: dict | None = None,
    pages: DataFrame | None = None,
) -> DataFrame:
    """``/crawl``: get the HTML of each URL (README.md:9).

    ``options['crawler']`` routes like the reference's ``crawler_type``
    static (crawl/http.js:2): ``'http'`` (default) returns just the
    body for clean fetches (Get.crawl, http.js:4-7); ``'browser'``
    keeps partial content on timeout and carries the original error
    for failed navigations (RenderNew.crawl, render.js:8-33).

    ``pages`` is the page store to fetch against (the in-sandbox
    network stand-in); defaults to the smoke corpus.
    """
    o = coerce_options(options)
    kind = o.get("crawler") or "http"
    if kind not in ("http", "browser"):
        # fail loudly like serp() does for engines — a typo'd kind
        # silently switching to the browser result schema (body ->
        # content + error_msg) is a worse failure mode than an error
        raise ValueError(f"unknown crawler kind: {kind!r} (http|browser)")
    if pages is None:
        pages = spark.read.parquet(ensure_corpus(SMOKE)["pages"])
    urls = _items_df(spark, items, "url")
    fetched = fetch_join(urls, pages)
    if kind == "http":
        return fetched.select(
            "url", "status", F.when(F.col("fetch_ok"), F.col("body")).alias("body")
        )
    return fetched.select(
        "url",
        "status",
        F.when(F.col("fetch_ok"), F.col("body")).alias("content"),
        F.when(
            ~F.col("fetch_ok"),
            F.concat(F.lit("Navigation failed: "), F.coalesce("status", F.lit("no_route"))),
        ).alias("error_msg"),
    )


def serp(
    spark: SparkSession,
    keywords=None,
    options: dict | None = None,
) -> DataFrame:
    """``/serp``: scrape a search engine per keyword (README.md:10).

    ``options['search_engine']`` ∈ {'google', 'bing'} (default google).
    Google runs the full num_pages pagination superstep
    (plans/serp_loop.py — #pnnext advance incl. the missing-link
    re-parse no-op, recaptcha Failed-row early exit). Bing parses its
    page-1 SERP with the bing admission rule (title && link,
    bing_scraper.js:148-151); its next_page uses a different selector
    (bing_scraper.js:781-786) and is exposed through the
    proj_bing_pagination catalog query rather than this facade.
    Returns one row per (keyword, page_num) with status / blocked_ip /
    admitted-organic count.
    """
    from .plans.serp_loop import SerpPaginationEngine
    from .sources.serp_corpus import SMOKE as SERP_SMOKE
    from .sources.serp_corpus import ensure_serp_corpus

    o = coerce_options(options)
    engine = o.get("search_engine") or "google"
    path = ensure_serp_corpus(SERP_SMOKE)
    if engine == "google":
        eng = SerpPaginationEngine(spark, path, num_pages=int(o["num_pages"]))
        seeds = eng.seeds()
        if keywords is not None:
            seeds = seeds.join(
                F.broadcast(_items_df(spark, keywords, "keyword")), "keyword"
            )
        return eng.run(seeds)
    if engine != "bing":
        raise ValueError(f"unknown search_engine: {engine!r}")
    store = (
        spark.read.parquet(path)
        .where((F.col("engine") == "bing") & (F.col("page_num") == 1))
        .select("keyword", "url", "body")
    )
    if keywords is not None:
        store = store.join(F.broadcast(_items_df(spark, keywords, "keyword")), "keyword")
    # bing organic admission: title && link — the SAME pattern objects
    # proj_bing_organic parses with (imported, not re-declared)
    from .operators.catalog_serp import _P_B_LINK, _P_B_ORG, _P_B_TITLE, _canon

    blocks = F.regexp_extract_all(_canon(F.col("body")), F.lit(_P_B_ORG), 0)
    adm = F.filter(
        blocks,
        lambda b: (F.regexp_extract(b, _P_B_LINK, 1) != "")
        & (F.regexp_extract(b, _P_B_TITLE, 1) != ""),
    )
    return store.select(
        "keyword",
        F.lit(1).alias("page_num"),
        "url",
        F.lit("ok").alias("status"),
        F.lit(None).cast("string").alias("blocked_ip"),
        F.size(adm).alias("n_organic"),
    )


def custom(
    spark: SparkSession,
    crawler: Callable[[], object] | object,
    items,
    schema: str,
    options: dict | None = None,
    pages: DataFrame | None = None,
) -> DataFrame:
    """``/custom``: run a user-supplied crawler class over the items
    (README.md:11). The reference instantiates the class once per
    worker and calls ``async crawl(item)`` per item with injected
    context (BrowserWorker base, reverse_image_google_final.js:17); the
    Spark contract is the vectorized analog: the class is instantiated
    ONCE PER PARTITION inside iterator mapInPandas and its
    ``crawl_batch(pdf) -> pdf`` processes whole Arrow batches — never
    per-row Python dispatch (north rule). ``crawler`` may be the class
    itself (instantiated per partition, receiving coerced ``options``
    if its __init__ accepts them) or a zero-arg factory.

    Items are fetched against the page store first, so the batch the
    crawler sees carries (url, status, fetch_ok, title, body,
    out_links) — the analog of the injected this.page/this.Got.
    """
    o = coerce_options(options)
    if pages is None:
        pages = spark.read.parquet(ensure_corpus(SMOKE)["pages"])
    fetched = fetch_join(_items_df(spark, items, "url"), pages)

    import inspect

    try:
        params = list(inspect.signature(crawler).parameters.values())
        # 'takes options' means a parameter that can actually BIND one
        # positional argument — keyword-only or **kwargs-only __init__
        # signatures must get the zero-arg call, not a positional
        # options dict they cannot accept
        takes_options = any(
            p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
                inspect.Parameter.VAR_POSITIONAL,
            )
            for p in params
        )
    except (TypeError, ValueError):  # builtins / odd callables
        takes_options = False

    def make():
        # decided by signature, not try/except — a TypeError raised
        # INSIDE a user __init__ must surface, not silently retry
        return crawler(o) if takes_options else crawler()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inst = make()  # per-partition init (one "browser" per worker)
        for pdf in it:
            yield inst.crawl_batch(pdf)

    return fetched.mapInPandas(batches, schema=schema)


def social(
    spark: SparkSession,
    warehouse: str,
    corpus_paths: dict | None = None,
    options: dict | None = None,
    validate_images: bool = False,
):
    """The flagship custom crawler (custom/social.js) at engine scale:
    runs the full CrawlEngine (frontier, LIFO/budget scheduling,
    same-domain gate, six-family entity extraction, optional payload
    validation) and returns its result views. The reference options
    that social.js coerces (max_requests, link_depth,
    stay_within_domain — SURVEY §1.4) are realized by the engine's
    scheduling semantics; per-seed budgets come from the corpus'
    budgets table exactly like the reference's per-job options map.
    """
    from .plans.loop import CrawlEngine

    # The engine reads per-host budgets/depth semantics from the corpus
    # tables (the reference's per-job options map analog) — options
    # passed here do NOT override them; reject attempts loudly instead
    # of silently ignoring them
    if options:
        raise ValueError(
            "social(): engine semantics come from the corpus tables "
            f"(budgets/robots); unsupported options {sorted(options)}"
        )
    paths = corpus_paths or ensure_corpus(SMOKE)
    eng = CrawlEngine(spark, warehouse, paths, validate_images=validate_images)
    eng.run()
    return {
        "crawl_order": eng.result_crawl_order(),
        "seen": eng.result_seen(),
        "entities": eng.result_entities(),
    }
