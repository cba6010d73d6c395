"""Engine-native §2.1/§2.7/§2.9 operators over the deterministic smoke
corpus (sources/corpus.py) rather than the TPC-H-ish testdata, because
their semantics involve the page store, binary payloads, or
per-partition init. DuckDB twins read THE SAME corpus parquet files via
read_parquet (paths resolved at import, corpus generation is idempotent)
so the driver gets full rows+schema+hash checks — including
sink_screenshot, whose twin reads a generator-rendered expected-bytes
sidecar (no rows-only queries remain in this module). Exactness for the
crawl path itself is additionally covered by the serial-oracle tests
(tests/test_engine_vs_oracle.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .fetch import fetch_join

from ..sources.corpus import (
    SMOKE,
    ensure_corpus,
    ensure_robots_txt,
    ensure_screenshot_expected,
    ensure_sitemaps,
    ensure_warc,
)

# resolved (and generated if absent) at import so every oracle SQL
# string below embeds a path that exists by the time DuckDB runs it
_P = ensure_corpus(SMOKE)


def _corpus(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.parquet(_P[table])


@register(
    "src_http_get",
    f"""SELECT s.url, p.status,
               CASE WHEN p.status IN ('ok','partial')
                    THEN CAST(length(p.body) AS INT) END AS body_len
        FROM read_parquet('{_P["seeds"]}') s
        LEFT JOIN read_parquet('{_P["pages"]}') p USING (url)""",
)
def src_http_get(spark, sf):
    """Get.crawl(url) -> body (crawl/http.js:4-7): the fetch stage is
    an equi-join of scheduled URLs against the page store; http kind
    returns the body only for clean fetches."""
    seeds = _corpus(spark, "seeds").select("url")
    fetched = fetch_join(seeds, _corpus(spark, "pages"))
    return fetched.select(
        "url",
        "status",
        F.when(F.col("fetch_ok"), F.length("body")).alias("body_len"),
    )


@register(
    "src_browser_render",
    f"""SELECT s.url, p.status,
               CASE WHEN p.status IN ('ok','partial') THEN p.body END AS content,
               CASE WHEN p.status IS NULL OR p.status NOT IN ('ok','partial')
                    THEN 'Navigation failed: ' || coalesce(p.status, 'no_route')
               END AS error_msg
        FROM read_parquet('{_P["seeds"]}') s
        LEFT JOIN read_parquet('{_P["pages"]}') p USING (url)""",
)
def src_browser_render(spark, sf):
    """RenderNew.crawl(url) (crawl/render.js:8-33): browser kind keeps
    partial content on timeout and carries the ORIGINAL error for
    failed navigations (render.js:24-32)."""
    seeds = _corpus(spark, "seeds").select("url")
    fetched = fetch_join(seeds, _corpus(spark, "pages"))
    return fetched.select(
        "url",
        "status",
        F.when(F.col("status").isin("ok", "partial"), F.col("body")).alias("content"),
        F.when(
            ~F.col("fetch_ok"),
            F.concat(F.lit("Navigation failed: "), F.coalesce("status", F.lit("no_route"))),
        ).alias("error_msg"),
    )


_SHOT = ensure_screenshot_expected(SMOKE)


@register(
    "sink_screenshot",
    # expected bytes rendered driver-side by the corpus generator
    # (sources/corpus.py::ensure_screenshot_expected); the query below
    # renders the same URLs on executors — the value-hash pins the
    # distributed mapInPandas encode byte-for-byte
    f"SELECT url, screen_base64 FROM read_parquet('{_SHOT}')",
)
def sink_screenshot(spark, sf):
    """Page -> PNG screenshot bytes as base64, default
    {type:'png', fullPage:false} (custom/screenshot.js:12-32). The
    'render' is the deterministic pixel function keyed by url — real
    PNG encode via the pure-numpy codec, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import base64

        from ..codec.png import png_encode
        from ..sources.corpus import image_pixels

        for pdf in it:
            shots = [
                base64.b64encode(png_encode(image_pixels(u, 16, 12))).decode("ascii")
                for u in pdf["url"]
            ]
            yield pd.DataFrame({"url": pdf["url"], "screen_base64": shots})

    pages = _corpus(spark, "pages").select("url")
    return pages.mapInPandas(batches, schema="url string, screen_base64 string")


@register(
    "udf_custom_crawler",
    # coalesce mirrors the crawler's fillna: NULL title/body/out_links
    # profile as ''/0, not NULL (the crawler never emits NULLs)
    f"""SELECT url, trim(coalesce(title, '')) AS page_title,
               CAST(coalesce(len(out_links), 0) AS INT) AS n_links,
               CAST(coalesce(length(body), 0) AS INT) AS body_len
        FROM read_parquet('{_P["pages"]}')""",
)
def udf_custom_crawler(spark, sf):
    """The /custom endpoint shape (README.md:11): a user-supplied
    crawler class whose crawl() runs per item with injected context
    (BrowserWorker base, reverse_image_google_final.js:17). Spark twin:
    the class is instantiated ONCE per partition inside iterator
    mapInPandas (per-worker browser analog) and processes whole Arrow
    batches — no per-row Python dispatch."""

    class TitleCrawler:
        """Example user crawler: page -> (title, n_links, body_len)."""

        def crawl_batch(self, pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": pdf["url"],
                    "page_title": pdf["title"].fillna("").str.strip(),
                    # null-safe: a None out_links cell profiles as 0
                    "n_links": pdf["out_links"].map(
                        lambda v: 0 if v is None else len(v)
                    ),
                    "body_len": pdf["body"].fillna("").str.len(),
                }
            )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        crawler = TitleCrawler()  # per-partition init
        for pdf in it:
            yield crawler.crawl_batch(pdf)

    pages = _corpus(spark, "pages").select("url", "title", "out_links", "body")
    return pages.mapInPandas(
        batches, schema="url string, page_title string, n_links int, body_len int"
    )


_RT = ensure_robots_txt(SMOKE)

# robots.txt line grammar (public robots exclusion standard), RE2/Java
# identical: case-insensitive field names, '#' comments, values to EOL
_RX_UA = r"(?i)^user-agent:\s*(\S.*?)\s*$"
_RX_DIR = r"(?i)^(disallow|allow|crawl-delay):\s*(\S.*?)\s*$"


@register(
    "src_robots_txt",
    f"""WITH lines AS (
          SELECT host,
                 generate_subscripts(string_split(robots_txt, chr(10)), 1) AS pos,
                 trim(regexp_replace(unnest(string_split(robots_txt, chr(10))),
                                     '#.*$', '')) AS line
          FROM read_parquet('{_RT}')),
        tagged AS (
          SELECT host, pos,
                 nullif(regexp_extract(line, '{_RX_UA}', 1), '') AS ua,
                 lower(nullif(regexp_extract(line, '{_RX_DIR}', 1), '')) AS directive,
                 nullif(regexp_extract(line, '{_RX_DIR}', 2), '') AS value
          FROM lines),
        grouped AS (
          SELECT host, pos, ua, directive, value,
                 sum(CASE WHEN ua IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY host ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS gid
          FROM tagged),
        agents AS (
          -- the group's agent must be window-computed BEFORE the
          -- directive filter (ua is NULL on every directive row)
          SELECT host, pos, directive, value,
                 max(ua) OVER (PARTITION BY host, gid) AS agent
          FROM grouped)
        SELECT host, agent, directive, value,
               CASE WHEN directive = 'crawl-delay'
                    THEN CAST(round(TRY_CAST(value AS DOUBLE) * 1000) AS BIGINT)
               END AS delay_ms,
               CAST(pos AS INT) AS line_no
        FROM agents
        WHERE directive IS NOT NULL AND agent IS NOT NULL""",
)
def src_robots_txt(spark, sf):
    """Parse raw robots.txt text into per-agent directive rows — the
    text-ingest front of the engine's robots gate (the north rule adds
    robots enforcement; the structured rules table the CrawlEngine
    joins against is exactly what this parser produces from fetched
    robots.txt bodies). Grammar: '#' comments stripped, case-
    insensitive field names, a User-agent line opens a group and its
    directives (Disallow / Allow / Crawl-delay) attach to it; Sitemap
    and unknown fields are ignored. Simplification vs the full RFC
    9309: consecutive User-agent lines form separate groups (the
    corpus generator emits single-agent groups). Pure column ops: one
    posexplode + two windows over (host, pos) — at 10^10 hosts this
    shuffles once on host, and each host's text is a few KB."""
    w_run = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lines = (
        spark.read.parquet(_RT)
        .select(
            "host",
            F.posexplode(F.split("robots_txt", "\n")).alias("pos0", "raw"),
        )
        .select(
            "host",
            (F.col("pos0") + 1).alias("pos"),
            F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
        )
    )
    tagged = lines.select(
        "host",
        "pos",
        F.nullif(F.regexp_extract("line", _RX_UA, 1), F.lit("")).alias("ua"),
        F.lower(F.nullif(F.regexp_extract("line", _RX_DIR, 1), F.lit(""))).alias(
            "directive"
        ),
        F.nullif(F.regexp_extract("line", _RX_DIR, 2), F.lit("")).alias("value"),
    )
    grouped = tagged.withColumn(
        "gid", F.sum(F.col("ua").isNotNull().cast("int")).over(w_run)
    )
    w_grp = Window.partitionBy("host", "gid")
    return (
        grouped.withColumn("agent", F.max("ua").over(w_grp))
        .filter(F.col("directive").isNotNull() & F.col("agent").isNotNull())
        .select(
            "host",
            "agent",
            "directive",
            "value",
            F.when(
                F.col("directive") == "crawl-delay",
                F.round(F.expr("try_cast(value as double)") * 1000).cast("bigint"),
            ).alias("delay_ms"),
            F.col("pos").cast("int").alias("line_no"),
        )
    )


@register(
    "fn_url_canonicalize",
    f"""WITH decorated AS (
          SELECT url,
                 CASE CAST(('0x' || substr(md5('dec:' || url), 1, 8)) AS BIGINT) % 3
                   WHEN 0 THEN url || '?utm_source=x&b=2&a=1#frag'
                   WHEN 1 THEN url || '?gclid=g&z=9&utm_campaign=c'
                   ELSE url || '#s1'
                 END AS raw
          FROM read_parquet('{_P["pages"]}')),
        split1 AS (
          SELECT url, raw,
                 regexp_replace(raw, '#.*$', '') AS no_frag
          FROM decorated),
        parts AS (
          -- split on the FIRST '?' only (instr), keeping any later '?'
          -- inside the query string — string_split would silently drop
          -- everything after a second '?', diverging from the engine's
          -- split-limit-2 canonicalizer on such URLs
          SELECT url, raw,
                 CASE WHEN instr(no_frag, '?') > 0
                      THEN substr(no_frag, 1, instr(no_frag, '?') - 1)
                      ELSE no_frag END AS base,
                 CASE WHEN instr(no_frag, '?') > 0
                      THEN substr(no_frag, instr(no_frag, '?') + 1) END AS query
          FROM split1),
        cleaned AS (
          SELECT url, raw, base,
                 list_sort(list_filter(string_split(coalesce(query, ''), '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_')
                        AND NOT starts_with(p, 'gclid=')
                        AND NOT starts_with(p, 'fbclid='))) AS params
          FROM parts)
        SELECT url, raw,
               base || CASE WHEN len(params) > 0
                            THEN '?' || array_to_string(params, '&')
                            ELSE '' END AS canonical
        FROM cleaned""",
)
def fn_url_canonicalize(spark, sf):
    """URL canonicalization for crawl dedup: strip the fragment, drop
    tracking parameters (utm_*, gclid, fbclid), and SORT the surviving
    query parameters so parameter order never splits a URL's identity
    in the seen-set. (The engine's in-crawl normalizer does the
    fragment strip the reference does — social.js:121-123; this is the
    fuller normalizer a production frontier runs before hashing into
    the Bloom/seen path.) Deterministic decorated inputs are built from
    the page URLs so the param logic is actually exercised — the
    corpus' own links carry no query strings. Narrow projection, no
    shuffle."""
    pages = _corpus(spark, "pages").select("url")
    raw = (
        F.when(
            _h32dec(F.col("url")) % 3 == 0,
            F.concat(F.col("url"), F.lit("?utm_source=x&b=2&a=1#frag")),
        )
        .when(
            _h32dec(F.col("url")) % 3 == 1,
            F.concat(F.col("url"), F.lit("?gclid=g&z=9&utm_campaign=c")),
        )
        .otherwise(F.concat(F.col("url"), F.lit("#s1")))
    )
    from ..functions.urls import canonicalize_col

    d = pages.select("url", raw.alias("raw"))
    return d.select("url", "raw", canonicalize_col(F.col("raw")).alias("canonical"))


def _h32dec(col):
    """pipeline._h32 with the 'dec' salt — one portable-hash
    construction shared repo-wide, never re-derived."""
    from .pipeline import _h32

    return _h32(col, "dec")


# RFC 9309 demo rule set: overlapping allow/disallow prefixes so the
# longest-match + allow-wins-tie semantics are actually exercised
# (the corpus' own robots tables carry only disallows, where longest-
# match degenerates to "any prefix hit" — the engine's fast path)
_ROBOTS_RULES = [
    ("allow", "/p1"),
    ("disallow", "/p"),
    ("disallow", "/admin"),
    ("allow", "/"),
]
_RULES_SQL = ", ".join(f"('{d}', '{pth}')" for d, pth in _ROBOTS_RULES)


@register(
    "filt_robots_allow",
    f"""WITH rules(directive, rule_path) AS (VALUES {_RULES_SQL}),
        urls AS (
          SELECT url, regexp_replace(url, '^https?://[^/]*', '') AS path
          FROM read_parquet('{_P["pages"]}')),
        matched AS (
          SELECT u.url, u.path, r.directive, r.rule_path,
                 row_number() OVER (
                   PARTITION BY u.url
                   ORDER BY length(r.rule_path) DESC, r.directive ASC) AS rn
          FROM urls u JOIN rules r
            ON substr(u.path, 1, length(r.rule_path)) = r.rule_path)
        SELECT u.url,
               m.rule_path AS matched_rule,
               coalesce(m.directive, 'allow') AS directive,
               coalesce(m.directive, 'allow') = 'allow' AS allowed
        FROM urls u LEFT JOIN matched m ON u.url = m.url AND m.rn = 1""",
)
def filt_robots_allow(spark, sf):
    """Full RFC 9309 robots decision per URL: among the rules whose
    path is a prefix of the URL path, the LONGEST wins; on a length
    tie, allow beats disallow; no match means allowed. (The engine's
    in-crawl gate, operators/frontier.py::expand_candidates, uses the
    degenerate disallow-only fast path; this operator is the general
    decision for rule sets with Allow lines, e.g. parsed from
    src_robots_txt.) Plan shape at scale: the rules dim is tiny and
    BROADCAST; the prefix match is a broadcast nested-loop join (a
    non-equi theta join — unavoidable for prefix semantics) followed
    by a per-url top-1 window, so the big side streams once and never
    shuffles for the join itself."""
    rules = spark.createDataFrame(_ROBOTS_RULES, "directive string, rule_path string")
    urls = _corpus(spark, "pages").select(
        "url", F.regexp_replace("url", "^https?://[^/]*", "").alias("path")
    )
    matched = urls.join(
        F.broadcast(rules),
        F.col("path").startswith(F.col("rule_path")),
        "inner",
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("url").orderBy(
                F.length("rule_path").desc(), F.col("directive").asc()
            )
        ),
    )
    best = matched.filter(F.col("rn") == 1).select(
        "url", F.col("rule_path").alias("matched_rule"), "directive"
    )
    return (
        urls.select("url")
        .join(best, "url", "left")
        .select(
            "url",
            "matched_rule",
            F.coalesce("directive", F.lit("allow")).alias("directive"),
            (F.coalesce("directive", F.lit("allow")) == "allow").alias("allowed"),
        )
    )


# PII patterns chosen to behave identically under Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backrefs, unambiguous greedy
# matching. The email form is the classic liberal matcher; the phone
# form is "digit, then >=5 digits/separators, then digit" (covers
# +49-style international and (555) 123-4567 NANP shapes the corpus
# embeds — reference families at /root/reference/custom/social.js:205-222).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9][0-9 ()./-]{5,}[0-9]"


@register(
    "fn_pii_scrub",
    f"""WITH s AS (
          SELECT url, coalesce(body, '') AS body FROM read_parquet('{_P["pages"]}')),
        e AS (
          SELECT url, body,
                 len(regexp_extract_all(body, '{_PII_EMAIL}')) AS n_emails,
                 regexp_replace(body, '{_PII_EMAIL}', '[EMAIL]', 'g') AS body1
          FROM s)
        SELECT url,
               CAST(n_emails AS INT) AS n_emails,
               CAST(len(regexp_extract_all(body1, '{_PII_PHONE}')) AS INT) AS n_phones,
               md5(regexp_replace(body1, '{_PII_PHONE}', '[PHONE]', 'g')) AS scrubbed_md5
        FROM e""",
)
def fn_pii_scrub(spark, sf):
    """PII redaction over fetched page bodies — a first-class stage of
    any training-data pipeline built on crawled text: emails then
    phone-shaped digit runs replaced by typed placeholder tokens, with
    per-kind redaction counts and a digest of the scrubbed body (the
    digest makes the driver's value-hash cover every byte of the
    scrubbed output). Pure JVM regexp_replace projection: narrow,
    codegen'd, no shuffle — at 100 TB this fuses into the page scan
    exactly like the entity extraction stage it mirrors."""
    pages = _corpus(spark, "pages").select(
        "url", F.coalesce("body", F.lit("")).alias("body")
    )
    body1 = F.regexp_replace("body", _PII_EMAIL, "[EMAIL]")
    with_emails = pages.select(
        "url",
        F.size(F.regexp_extract_all("body", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        body1.alias("body1"),
    )
    return with_emails.select(
        "url",
        "n_emails",
        F.size(F.regexp_extract_all("body1", F.lit(_PII_PHONE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(F.regexp_replace("body1", _PII_PHONE, "[PHONE]")).alias("scrubbed_md5"),
    )


@register(
    "join_payload_oracle",
    # The decode itself can't run in DuckDB, but its EXPECTED outcome is
    # a corpus invariant: every stored payload decodes back to the
    # reference pixels (exactly for png, post-quantization exactly and
    # PSNR>=40dB for qpng) by construction. The oracle therefore pins
    # pixels_allclose/psnr_ok to TRUE per row and computes caption_match
    # from the same parquet join Spark does — if the Spark decode path
    # regresses on ANY image, the hash check fails.
    f"""WITH pc AS (
          SELECT DISTINCT image_id, caption AS page_caption
          FROM read_parquet('{_P["pages"]}') WHERE image_id IS NOT NULL)
        SELECT i.image_id, i.fmt,
               TRUE AS pixels_allclose,
               TRUE AS psnr_ok,
               (pc.page_caption IS NOT NULL
                AND i.caption = pc.page_caption) AS caption_match
        FROM read_parquet('{_P["images"]}') i
        LEFT JOIN pc USING (image_id)""",
)
def join_payload_oracle(spark, sf):
    """Payload-invariant validation join (BASELINE.json input_hint):
    images equi-joined on image_id against (a) the decoded-pixel
    report (PSNR>=40dB lossy / exact lossless) and (b) the caption as
    carried by the page store — caption equality must be exact."""
    from .fetch import validate_payloads

    images = _corpus(spark, "images")
    report = validate_payloads(images)
    page_caps = (
        _corpus(spark, "pages")
        .filter(F.col("image_id").isNotNull())
        .select("image_id", F.col("caption").alias("page_caption"))
        # distinct on the PAIR (not dropDuplicates on image_id, whose
        # pick is nondeterministic): mirrors the oracle's SELECT
        # DISTINCT, so if an image_id ever carried two captions both
        # engines would fan out identically instead of silently
        # hash-mismatching
        .distinct()
    )
    return (
        images.select("image_id", "fmt", "caption")
        .join(report.select("image_id", "psnr_db", "pixels_allclose"), "image_id")
        .join(page_caps, "image_id", "left")
        .select(
            "image_id",
            "fmt",
            "pixels_allclose",
            (F.col("psnr_db") >= 40.0).alias("psnr_ok"),
            # non-null bool: unreferenced images (no page carries them)
            # report false, not NULL — keeps the driver/DuckDB canon
            # forms identical (pandas turns a NULL bool into NaN)
            (
                F.col("page_caption").isNotNull()
                & (F.col("caption") == F.col("page_caption"))
            ).alias("caption_match"),
        )
    )


_PHASH_CHUNKS = 4  # 64-bit phash -> four 16-bit chunks
_PHASH_RADIUS = 3  # pigeonhole: hd<=3 over 4 chunks => >=1 chunk exact


@register(
    "img_phash_neardup",
    f"""WITH i AS (SELECT image_id, phash FROM read_parquet('{_P["images"]}')),
        chunks AS (
          SELECT image_id, phash, k, (phash >> (16 * k)) & 65535 AS cv
          FROM i, (SELECT unnest(range(0, {_PHASH_CHUNKS})) AS k)),
        pairs AS (
          SELECT DISTINCT a.image_id AS image_a, b.image_id AS image_b,
                 CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
          FROM chunks a JOIN chunks b
            ON a.k = b.k AND a.cv = b.cv AND a.image_id < b.image_id)
        SELECT image_a, image_b, hamming FROM pairs
        WHERE hamming <= {_PHASH_RADIUS}""",
)
def img_phash_neardup(spark, sf):
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance —
    the image-payload twin of dedup_simhash, and EXACT (not
    probabilistic): with the 64-bit phash split into 4 disjoint 16-bit
    chunks, any pair within Hamming radius 3 must agree exactly on at
    least one chunk (pigeonhole), so equi-joining on (chunk_idx,
    chunk_value) generates a candidate superset and bit_count(xor)
    verification loses nothing — multi-index hashing (Norouzi et al.
    '12). Reference parity: the phash column is the corpus's stored
    perceptual hash, recomputed + validated by udf_image_decode
    (codec/phash.py).

    Scale shape (10^10 images): candidates never leave an equi-join —
    the per-chunk buckets use the same skew-safe sorted-array
    posexplode + slice-tail expansion as dedup_lsh_pairs (a hot chunk
    value, e.g. flat-color images, costs m rows x O(m) across tasks,
    never an O(m^2) array in one row), each bucket row carries
    (image_id, phash) structs so verification reads the pair row
    itself — no join back to the images table, and the 8-byte phash is
    the ONLY payload column that ever shuffles."""
    imgs = _corpus(spark, "images").select("image_id", "phash")
    return _phash_pairs(spark, imgs)


def _phash_pairs(spark: SparkSession, imgs: DataFrame) -> DataFrame:
    """(image_a, image_b, hamming<=radius) pairs over (image_id, phash)
    rows — the multi-index join described in img_phash_neardup."""
    chunk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"),
                    F.shiftright("phash", 16 * k).bitwiseAND(F.lit(65535)).alias("cv"),
                )
                for k in range(_PHASH_CHUNKS)
            ]
        )
    ).alias("c")
    chunks = imgs.select("image_id", "phash", chunk).select(
        "image_id", "phash", "c.k", "c.cv"
    )
    grouped = (
        chunks.groupBy("k", "cv")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("image_id", "phash"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    members = grouped.select(
        "members", F.posexplode("members").alias("pos", "a")
    ).repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
    tail = F.slice(F.col("members"), F.col("pos") + F.lit(2), F.size("members"))
    hamming = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    ).cast("bigint")
    return (
        members.select("a", F.explode(tail).alias("b"))
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_RADIUS)
        .distinct()
    )


_CAP_MIN_TOKENS = 5


@register(
    "img_curation_e2e",
    rf"""WITH RECURSIVE
        adm AS (
          SELECT image_id, phash, length(trim(caption)) AS cap_len
          FROM read_parquet('{_P["images"]}')
          WHERE caption IS NOT NULL
            AND len(string_split_regex(trim(caption), '\s+')) >= {_CAP_MIN_TOKENS}),
        chunks AS (
          SELECT image_id, phash, k, (phash >> (16 * k)) & 65535 AS cv
          FROM adm, (SELECT unnest(range(0, {_PHASH_CHUNKS})) AS k)),
        pairs AS (
          SELECT DISTINCT a.image_id AS ia, b.image_id AS ib
          FROM chunks a JOIN chunks b
            ON a.k = b.k AND a.cv = b.cv AND a.image_id < b.image_id
          WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_RADIUS}),
        edges AS (SELECT ia AS u, ib AS v FROM pairs
                  UNION SELECT ib, ia FROM pairs),
        reach(u, v) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges) nodes
          UNION
          SELECT e.u, r.v FROM edges e JOIN reach r ON r.u = e.v),
        cc AS (SELECT u AS image_id, min(v) AS cluster_id FROM reach GROUP BY u)
        SELECT a.image_id,
               coalesce(cc.cluster_id, a.image_id) AS cluster_id,
               (row_number() OVER (
                  PARTITION BY coalesce(cc.cluster_id, a.image_id)
                  ORDER BY a.cap_len DESC, a.image_id) = 1) AS is_kept
        FROM adm a LEFT JOIN cc USING (image_id)""",
)
def img_curation_e2e(spark, sf):
    """Flagship image+caption curation pipeline (the graft cell's
    payload axis, composed end-to-end): caption admission gate ->
    phash near-dup pairs -> connected-components clusters -> keep ONE
    image per cluster, preferring the longest caption (richest
    supervision), ties to the smallest image_id. Singletons keep
    themselves.

    Stage order is cheapest-cut-first (pipeline_curation_e2e's rule):
    the caption gate is a narrow map-side filter that shrinks every
    downstream shuffle; the pair join, clustering, and keep-window then
    run on admitted rows only. At 10^10 images the same plan holds —
    gate at the scan (predicate pushdown on caption stats), multi-index
    equi-join for candidates, O(V+E)-per-round label propagation, and
    a keep-window over small-by-construction clusters. Image payload
    bytes appear in NO stage — only (image_id, phash, cap_len)
    shuffle."""
    from .pipeline import connected_components

    imgs = _corpus(spark, "images").select(
        "image_id",
        "phash",
        F.length(F.trim("caption")).alias("cap_len"),
        F.size(F.split(F.trim("caption"), r"\s+")).alias("cap_tokens"),
        F.col("caption").isNotNull().alias("cap_present"),
    )
    adm = imgs.filter(
        F.col("cap_present") & (F.col("cap_tokens") >= _CAP_MIN_TOKENS)
    ).select("image_id", "phash", "cap_len")
    pairs = _phash_pairs(spark, adm.select("image_id", "phash"))
    cc = connected_components(pairs, "image_a", "image_b").select(
        F.col("node").alias("image_id"), "cluster_id"
    )
    joined = adm.join(cc, "image_id", "left").select(
        "image_id",
        "cap_len",
        F.coalesce("cluster_id", "image_id").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("cap_len").desc(), "image_id")
    return joined.select(
        "image_id",
        "cluster_id",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


# --------------------------------------------------------------- admission
_IMG_MIN_DIM = 24          # smallest usable training resolution here
_IMG_MAX_ASPECT_X1000 = 3000  # max(w,h)/min(w,h) <= 3.0, integer-scaled


@register(
    "img_admission_gate",
    rf"""SELECT image_id, w, h, fmt,
           (w >= {_IMG_MIN_DIM} AND h >= {_IMG_MIN_DIM}) AS size_ok,
           (1000 * greatest(w, h) <= {_IMG_MAX_ASPECT_X1000} * least(w, h))
             AS aspect_ok,
           (fmt = 'png') AS fmt_ok,
           (caption IS NOT NULL
            AND len(string_split_regex(trim(caption), '\s+'))
                >= {_CAP_MIN_TOKENS}) AS cap_ok,
           (w >= {_IMG_MIN_DIM} AND h >= {_IMG_MIN_DIM}
            AND 1000 * greatest(w, h) <= {_IMG_MAX_ASPECT_X1000} * least(w, h)
            AND fmt = 'png'
            AND caption IS NOT NULL
            AND len(string_split_regex(trim(caption), '\s+'))
                >= {_CAP_MIN_TOKENS}) AS admitted
        FROM read_parquet('{_P["images"]}')""",
)
def img_admission_gate(spark, sf):
    """LAION-style image+caption admission gate over the input_hint
    table (image_id, bytes, w, h, fmt, caption, phash): minimum
    dimension, aspect-ratio bound (integer-scaled x1000 so both
    engines compare exact ints), lossless-format whitelist, and
    caption token floor — each rule emitted as its own flag plus the
    conjunction, so downstream stages can relax one rule without
    re-scanning. Flag expressions live in admission_flags() and are
    shared verbatim with the streaming twin
    (streaming/image_stream.py).

    On this corpus w/h are uniform 32x24, so size_ok/aspect_ok are
    constant by construction — the oracle still verifies the rule
    arithmetic bit-for-bit (same convention as text_gopher_quality's
    corpus-constant stopword rule); fmt_ok and cap_ok split the rows.

    Scale shape (10^10 images): a pure narrow projection over METADATA
    columns only — the bytes payload is never referenced, so parquet
    column pruning keeps it on disk (guarded by a ReadSchema plan
    test), no shuffle anywhere, and when this gate runs as stage 1 of
    a curation pipeline (cheapest cut first) the admitted predicate
    pushes to the scan."""
    return apply_admission_gate(_corpus(spark, "images"))


def admission_flags() -> dict:
    """The four admission rules as named column expressions — one
    definition for the batch query, the composed curation pipelines,
    and the streaming twin."""
    caps = F.size(F.split(F.trim("caption"), r"\s+"))
    size_ok = (F.col("w") >= _IMG_MIN_DIM) & (F.col("h") >= _IMG_MIN_DIM)
    aspect_ok = (
        1000 * F.greatest("w", "h") <= _IMG_MAX_ASPECT_X1000 * F.least("w", "h")
    )
    fmt_ok = F.col("fmt") == "png"
    cap_ok = F.col("caption").isNotNull() & (caps >= _CAP_MIN_TOKENS)
    return {
        "size_ok": size_ok,
        "aspect_ok": aspect_ok,
        "fmt_ok": fmt_ok,
        "cap_ok": cap_ok,
        "admitted": size_ok & aspect_ok & fmt_ok & cap_ok,
    }


def apply_admission_gate(images: "DataFrame") -> "DataFrame":
    flags = admission_flags()
    return images.select(
        "image_id",
        "w",
        "h",
        "fmt",
        *[expr.alias(name) for name, expr in flags.items()],
    )


@register(
    "fn_url_surt",
    f"""SELECT url,
               array_to_string(list_reverse(string_split(
                   lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)), '.')), ',')
                 || ')' || coalesce(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$', 1), '')
                 AS surt,
               array_to_string(list_reverse(string_split(
                   lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)', 1)), '.'))[1:2], ',')
                 AS domain_key
        FROM read_parquet('{_P["pages"]}')""",
)
def fn_url_surt(spark, sf):
    """SURT keys (Sort-friendly URI Reordering Transform — the web
    archive convention, e.g. 'com,example,www)/path'): the host's
    labels reversed most-significant-first so that LEXICOGRAPHIC order
    groups every subdomain of a registrable domain contiguously. That
    ordering is the point at 10^10 URLs: range-partition or sort the
    frontier/seen-set by surt and (a) one host's URLs land in one
    partition run (politeness scheduling reads a contiguous slice, not
    a scatter), (b) a whole-domain query is a range predicate that
    prunes partitions, (c) prefix compression in parquet/Iceberg eats
    the shared 'com,example,...' prefixes. domain_key (the top two
    labels) is the coarse partition key. Pure column expressions,
    map-only, no shuffle."""
    from ..functions import urls as U

    # the canonical scheme pattern from functions/urls.py (host_col) —
    # a narrower ^[a-z]+:// would collapse any odd-scheme URL into one
    # degenerate '' host / ')' surt key
    host = U.host_col(F.col("url"))
    path = F.regexp_extract(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)$", 1
    )
    rev = F.reverse(F.split(host, r"\."))
    return _corpus(spark, "pages").select(
        "url",
        F.concat(F.array_join(rev, ","), F.lit(")"), path).alias("surt"),
        F.array_join(F.slice(rev, 1, 2), ",").alias("domain_key"),
    )


_PR_ITERS = 5
_PR_MASS = 1_000_000_000_000  # rank mass scale: all-integer PageRank


def _pagerank_oracle_sql() -> str:
    """Unrolled fixed-iteration PageRank twin (same convention as the
    pagination oracle: a Python loop emits one CTE per superstep).
    All arithmetic is BIGINT with explicit integer division, so both
    engines produce bit-identical ranks regardless of shuffle order."""
    pages = _P["pages"]
    link = (
        "replace(CASE WHEN trim(lnk) = '' THEN NULL "
        "WHEN starts_with(trim(lnk), 'http://') OR starts_with(trim(lnk), 'https://') THEN trim(lnk) "
        "WHEN starts_with(trim(lnk), '/') THEN "
        "regexp_extract(src, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]+)', 1) || trim(lnk) "
        "ELSE NULL END, '#', '')"
    )
    sql = f"""
    WITH nodes AS (SELECT url FROM read_parquet('{pages}')),
    nn AS (SELECT count(*) AS n FROM nodes),
    rawe AS (SELECT url AS src, unnest(out_links) AS lnk FROM read_parquet('{pages}')),
    edges AS (
      SELECT src, {link} AS dst FROM rawe
      WHERE {link} IN (SELECT url FROM nodes)),
    outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT url, {_PR_MASS} // (SELECT n FROM nn) AS rank FROM nodes)"""
    for k in range(_PR_ITERS):
        sql += f""",
    c{k} AS (SELECT e.dst AS url, sum(r.rank // o.deg) AS s
             FROM edges e JOIN r{k} r ON r.url = e.src JOIN outdeg o ON o.src = e.src
             GROUP BY e.dst),
    r{k + 1} AS (SELECT nodes.url,
                  (({_PR_MASS} * 15) // 100) // (SELECT n FROM nn)
                   + (85 * coalesce(c{k}.s, 0)) // 100 AS rank
                 FROM nodes LEFT JOIN c{k} USING (url))"""
    # sum(BIGINT) is HUGEINT in DuckDB (-> pandas float): cast back
    return sql + f" SELECT url, CAST(rank AS BIGINT) AS pr_scaled FROM r{_PR_ITERS}"


_PR_CACHE: dict[str, "DataFrame"] = {}


@register("rank_link_pagerank", _pagerank_oracle_sql())
def rank_link_pagerank(spark, sf):
    """Frontier prioritization by link authority: fixed-round
    (_PR_ITERS = 5) PageRank (damping 0.85, lost dangling mass — the
    simple variant)
    over the page link graph, the classic crawl-ordering signal
    (Page et al. '99; OPIC is its online analog). Links resolve with
    the engine's own resolver (functions/urls.resolve_col + normalize)
    so the graph is exactly the frontier's graph.

    Scale shape: the edge list joins out-degrees ONCE and is
    checkpointed; every round is edges JOIN ranks (equi-join on src,
    both sides shuffle-partitioned the same way) -> one
    partial-aggregated groupBy(dst) -> left join back onto nodes —
    O(E + V) rows of bigints per round, payload-free, fixed round
    count. localCheckpoint truncates the per-round lineage exactly as
    in connected_components. Arithmetic is scaled-integer (mass 10^12,
    integer division in BOTH engines), so ranks are exact, order-free
    bigints, per the no-raw-doubles rule. The one driver-side scalar
    is count(nodes) for the teleport term."""
    from pyspark.sql import functions as F

    from ..functions import urls as U

    key = f"{spark.sparkContext.applicationId}"
    hit = _PR_CACHE.get(key)
    if hit is not None:
        return hit
    pages = _corpus(spark, "pages").select("url", "out_links")
    nodes = pages.select("url")
    n = nodes.count()
    dst = U.normalize_col(U.resolve_col(F.col("lnk"), U.origin_col(F.col("src"))))
    edges = (
        pages.select(F.col("url").alias("src"), F.explode("out_links").alias("lnk"))
        .select("src", dst.alias("dst"))
        .join(nodes.select(F.col("url").alias("dst")), "dst")
        .select("src", "dst")
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e2 = edges.join(outdeg, "src").localCheckpoint()
    init = _PR_MASS // n
    base = (_PR_MASS * 15 // 100) // n
    ranks = nodes.select("url", F.lit(init).cast("bigint").alias("rank"))
    for _ in range(_PR_ITERS):
        contrib = (
            e2.join(ranks, e2["src"] == ranks["url"])
            .select("dst", F.expr("rank DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["url"] == contrib["dst"], "left")
            .select(
                nodes["url"],
                (F.lit(base) + F.expr("(85 * coalesce(s, 0)) DIV 100"))
                .cast("bigint")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    res = ranks.select("url", F.col("rank").alias("pr_scaled"))
    _PR_CACHE[key] = res
    return res


@register(
    "diff_crawl_snapshots",
    f"""WITH h AS (SELECT url, coalesce(body, '') AS body,
                  CAST(('0x' || substr(md5('snap:' || url), 1, 8)) AS BIGINT) AS h
           FROM read_parquet('{_P["pages"]}')),
        old AS (SELECT url, md5(body) AS sig FROM h),
        newp AS (SELECT url,
                        md5(CASE WHEN h % 7 = 0 THEN body || ' rev2' ELSE body END) AS sig
                 FROM h WHERE h % 13 <> 0),
        added AS (SELECT url || '?v=2' AS url, md5('new:' || body) AS sig
                  FROM h WHERE h % 17 = 0),
        new_ AS (SELECT * FROM newp UNION ALL SELECT * FROM added),
        d AS (SELECT coalesce(o.url, n.url) AS url,
                     CASE WHEN n.sig IS NULL THEN 'removed'
                          WHEN o.sig IS NULL THEN 'added'
                          WHEN o.sig <> n.sig THEN 'changed'
                          ELSE 'same' END AS change
              FROM old o FULL OUTER JOIN new_ n ON o.url = n.url)
       SELECT url, change FROM d WHERE change <> 'same'""",
)
def diff_crawl_snapshots(spark, sf):
    """Recrawl delta: classify every URL across two crawl snapshots as
    added / removed / changed (content hash differs) — the
    CommonCrawl-style diff report and the input to recrawl scheduling
    (changed pages recrawl sooner; removed ones tombstone via the
    cuckoo sidecar). The second snapshot is synthesized
    deterministically from the corpus (url-hash buckets drop ~1/13,
    mutate ~1/7, add ~1/17) so both engines diff identical inputs.

    Scale shape: bodies are hashed MAP-SIDE (md5 projection at the
    scan), so the FULL OUTER sort-merge join shuffles only
    (url, 32-hex sig) pairs — never page payloads; classification is a
    post-join projection. At 10^10 URLs this is the canonical delta
    plan; with both snapshots as SURT-range-partitioned tables the
    join co-locates and the exchange disappears entirely."""
    pages = _corpus(spark, "pages").select(
        "url", F.coalesce(F.col("body"), F.lit("")).alias("body")
    )
    from .pipeline import _h32

    hp = pages.withColumn("h", _h32(F.col("url"), "snap"))
    old = pages.select("url", F.md5("body").alias("sig"))
    newp = hp.filter(F.col("h") % 13 != 0).select(
        "url",
        F.md5(
            F.when(F.col("h") % 7 == 0, F.concat(F.col("body"), F.lit(" rev2"))).otherwise(
                F.col("body")
            )
        ).alias("sig"),
    )
    added = hp.filter(F.col("h") % 17 == 0).select(
        F.concat(F.col("url"), F.lit("?v=2")).alias("url"),
        F.md5(F.concat(F.lit("new:"), F.col("body"))).alias("sig"),
    )
    new = newp.unionByName(added)
    return (
        old.alias("o")
        .join(new.alias("n"), "url", "full_outer")
        .select(
            "url",
            F.when(F.col("n.sig").isNull(), F.lit("removed"))
            .when(F.col("o.sig").isNull(), F.lit("added"))
            .when(F.col("o.sig") != F.col("n.sig"), F.lit("changed"))
            .otherwise(F.lit("same"))
            .alias("change"),
        )
        .filter(F.col("change") != "same")
    )


@register(
    "audit_politeness_gaps",
    f"""WITH g AS (
          SELECT p.host, r.crawl_delay_ms,
                 lag(p.fetch_ms) OVER (PARTITION BY p.host ORDER BY p.url) AS gap_ms
          FROM read_parquet('{_P["pages"]}') p
          JOIN read_parquet('{_P["robots"]}') r USING (host))
       SELECT host, CAST(crawl_delay_ms AS BIGINT) AS crawl_delay_ms,
              CAST(count(*) AS BIGINT) AS n_requests,
              CAST(coalesce(sum(CASE WHEN gap_ms < crawl_delay_ms THEN 1 END), 0) AS BIGINT)
                AS n_violations,
              CAST(min(gap_ms) AS BIGINT) AS min_gap_ms
       FROM g GROUP BY host, crawl_delay_ms""",
)
def audit_politeness_gaps(spark, sf):
    """Politeness AUDIT over fetch logs: per host, how many
    consecutive-fetch gaps undercut the robots crawl-delay (sequential
    crawler model: the start-to-start gap equals the previous fetch's
    wall, ordered deterministically by url). The engine ENFORCES the
    budget at scheduling time (schedule_pops window accounting); this
    is the after-the-fact compliance report a crawl operator runs over
    the fetch log — the same window shape, pointed backwards.

    Scale: one shuffle on host for the lag window (high-cardinality
    partition key at 10^10 — millions of hosts), robots dim broadcast,
    aggregate is map-side-combinable; fetch bodies never read
    (column-pruned scan of host/url/fetch_ms)."""
    pages = _corpus(spark, "pages").select("host", "url", "fetch_ms")
    robots = _corpus(spark, "robots").select("host", "crawl_delay_ms")
    w = Window.partitionBy("host").orderBy("url")
    g = pages.join(F.broadcast(robots), "host").withColumn(
        "gap_ms", F.lag("fetch_ms").over(w)
    )
    return g.groupBy("host", F.col("crawl_delay_ms").cast("bigint").alias("crawl_delay_ms")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_requests"),
        F.coalesce(
            F.sum(F.when(F.col("gap_ms") < F.col("crawl_delay_ms"), 1)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_violations"),
        F.min("gap_ms").cast("bigint").alias("min_gap_ms"),
    )


# ---------------------------------------------------------------- WARC ingest

_WARC = ensure_warc(SMOKE)
_NL = "chr(10)"


@register(
    "src_warc_records",
    f"""WITH ex AS (
          SELECT shard_id,
                 CAST(generate_subscripts(chunks, 1) AS INT) AS rec_no,
                 unnest(chunks) AS chunk
          FROM (SELECT shard_id,
                       list_filter(string_split(warc_text, 'WARC/1.0' || {_NL}),
                                   x -> x <> '') AS chunks
                FROM read_parquet('{_WARC}'))),
        p AS (
          SELECT shard_id, rec_no, chunk,
                 strpos(chunk, {_NL} || {_NL}) AS hdr_end,
                 TRY_CAST(regexp_extract(chunk, 'Content-Length: (\\d+)', 1) AS INT)
                   AS content_length,
                 regexp_extract(chunk, 'WARC-Type: (\\S+)', 1) AS warc_type,
                 regexp_extract(chunk, 'WARC-Target-URI: (\\S+)', 1) AS target_uri,
                 TRY_CAST(regexp_extract(chunk, 'WARC-Date: 2026-07-(\\d{{2}})', 1) AS INT)
                   AS warc_day
          FROM ex)
       SELECT shard_id, rec_no, warc_type, target_uri, warc_day, content_length,
              md5(substr(chunk, hdr_end + 2, content_length)) AS payload_sig,
              substr(chunk, hdr_end + 2 + content_length, 8) = {_NL} || {_NL}
                AS well_formed
       FROM p""",
)
def src_warc_records(spark, sf):
    """WARC/1.0 archive ingest — the format a real 100 TB crawl corpus
    arrives in (Common Crawl publishes WARC; the reference's cloud
    infrastructure stores fetched HTML the same shape: raw payload +
    fetch metadata per record, google_scraper.js:70 attaches the raw
    html). Parses shard text into per-record rows: split on the
    'WARC/1.0' record header, extract typed header fields, then slice
    the payload by the DECLARED Content-Length — exactly how a real
    WARC reader frames records — and flag records whose stored payload
    disagrees with the declaration (truncated archives) instead of
    mis-slicing into the next record.

    Scale shape: map-only — shards split/parse/slice inside one
    projection, records never shuffle, payloads reduce to md5 sigs at
    the scan. At a real ingest each ~1 GB .warc.gz file is one input
    split (gzip is unsplittable) and this whole parse runs where the
    bytes land; downstream ops see only (uri, sig, headers) columns."""
    recs = (
        spark.read.parquet(_WARC)
        .select(
            "shard_id",
            F.posexplode(
                F.filter(
                    F.split("warc_text", "WARC/1\\.0\n"),
                    lambda x: x != F.lit(""),
                )
            ).alias("idx", "chunk"),
        )
        .select("shard_id", (F.col("idx") + 1).cast("int").alias("rec_no"), "chunk")
    )
    hdr_end = F.locate("\n\n", F.col("chunk"))
    declared = F.regexp_extract("chunk", r"Content-Length: (\d+)", 1).cast("int")
    payload = F.col("chunk").substr(hdr_end + F.lit(2), declared)
    trailer = F.col("chunk").substr(hdr_end + F.lit(2) + declared, F.lit(8))
    return recs.select(
        "shard_id",
        "rec_no",
        F.regexp_extract("chunk", r"WARC-Type: (\S+)", 1).alias("warc_type"),
        F.regexp_extract("chunk", r"WARC-Target-URI: (\S+)", 1).alias("target_uri"),
        F.nullif(F.regexp_extract("chunk", r"WARC-Date: 2026-07-(\d{2})", 1), F.lit(""))
        .cast("int")
        .alias("warc_day"),
        declared.alias("content_length"),
        F.md5(payload).alias("payload_sig"),
        (trailer == F.lit("\n\n")).alias("well_formed"),
    )


@register(
    "sink_warc_export",
    f"""WITH recs AS (
          SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, url,
                 'WARC/1.0' || {_NL} ||
                 'WARC-Type: response' || {_NL} ||
                 'WARC-Target-URI: ' || url || {_NL} ||
                 'WARC-Record-ID: <urn:md5:' || md5(url) || '>' || {_NL} ||
                 'Content-Type: application/http; msgtype=response' || {_NL} ||
                 'Content-Length: ' || CAST(length(body) AS VARCHAR) ||
                 {_NL} || {_NL} || body || {_NL} || {_NL} AS rec
          FROM read_parquet('{_P["pages"]}'))
       SELECT host, CAST(count(*) AS BIGINT) AS n_records,
              CAST(sum(length(rec)) AS BIGINT) AS warc_len,
              md5(string_agg(rec, '' ORDER BY url)) AS warc_sig
       FROM recs GROUP BY host""",
)
def sink_warc_export(spark, sf):
    """WARC/1.0 archive EXPORT — the inverse of src_warc_records
    (round-3 verdict #8): render the page store back into well-formed
    response records and assemble per-host shard files, completing the
    ingest/egress story (the reference's cloud infrastructure stores
    raw fetched HTML per job item, google_scraper.js:70; Common Crawl
    egress ships the same WARC shape). Each record declares
    Content-Length over its payload (character length, matching the
    character-based substr slicing of the reader twin on both engines)
    and records are concatenated in url order within a host shard, so
    export -> src_warc_records-style re-ingest round-trips exactly
    (pinned by tests/test_warc_roundtrip.py).

    KNOWN DIVERGENCE from the WARC/1.0 spec (ISO 28500), deliberate:
    the spec requires CRLF line endings and Content-Length as the
    OCTET count of the payload block; this exporter emits LF and a
    CHARACTER count (identical only for ASCII bodies). Both twins and
    the src_warc_records reader share the LF/char framing, so the
    round-trip is exact within this repo, but the shards are not
    consumable by external WARC tooling as-is. A spec-faithful export
    is the same plan with {_NL} -> CHR(13)||CHR(10) and length() ->
    octet_length()/encode(); kept LF/char here because the reader twin
    and the r4 driver record certify this exact framing.

    The driver-compared projection is the shard manifest (host,
    n_records, warc_len, md5 of the shard text): the full text flows
    through the md5, so a single altered byte anywhere in any record
    fails the compare. sink_warc_shards() returns the raw shard text
    for actual file egress.

    Scale shape: records render map-side and shuffle ONCE, one row per
    record keyed by shard — the standard partitioned-file-egress
    exchange. Per-shard state is bounded by the sharding key's fanout
    (per-host here; a real export adds a rolling shard index per size
    budget so no single shard outgrows a task). No all-shard state
    exists anywhere."""
    return (
        sink_warc_shards(spark, sf)
        .select(
            "host",
            "n_records",
            "warc_len",
            F.md5("warc_text").alias("warc_sig"),
        )
    )


def sink_warc_shards(spark, sf) -> DataFrame:
    """Full per-host WARC shard text (host, n_records, warc_len,
    warc_text) — the writable egress payload behind sink_warc_export;
    df.write.partitionBy('host').text(...) away from real files."""
    pages = spark.read.parquet(_P["pages"]).select("url", "body")
    rec = F.concat(
        F.lit("WARC/1.0\n"),
        F.lit("WARC-Type: response\n"),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit("\n"),
        F.lit("WARC-Record-ID: <urn:md5:"), F.md5("url"), F.lit(">\n"),
        F.lit("Content-Type: application/http; msgtype=response\n"),
        F.lit("Content-Length: "),
        F.length("body").cast("string"),
        F.lit("\n\n"),
        F.col("body"),
        F.lit("\n\n"),
    )
    recs = pages.select(
        F.regexp_extract("url", "^https?://([^/]+)", 1).alias("host"),
        "url",
        rec.alias("rec"),
    )
    # one row per record through the exchange; url-ordered assembly via
    # sorted struct collect (urls are unique per corpus invariant)
    return recs.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.sum(F.length("rec")).cast("bigint").alias("warc_len"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("url", "rec"))),
                lambda x: x["rec"],
            ),
            "",
        ).alias("warc_text"),
    )


# ------------------------------------------------------------- sitemap ingest

_SM = ensure_sitemaps(SMOKE)


@register(
    "src_sitemap_urls",
    f"""WITH ex AS (
          SELECT host,
                 CAST(generate_subscripts(entries, 1) AS INT) AS pos,
                 unnest(entries) AS entry
          FROM (SELECT host,
                       regexp_extract_all(sitemap_xml, '<url>(.*?)</url>', 1) AS entries
                FROM read_parquet('{_SM}')))
       SELECT host, pos,
              regexp_extract(entry, '<loc>(.*?)</loc>', 1) AS loc,
              TRY_CAST(nullif(regexp_extract(entry,
                  '<lastmod>2026-06-(\\d{{2}})</lastmod>', 1), '') AS INT) AS lastmod_day,
              TRY_CAST(nullif(regexp_extract(entry,
                  '<priority>0\\.(\\d)</priority>', 1), '') AS INT) AS priority_x10
       FROM ex""",
)
def src_sitemap_urls(spark, sf):
    """sitemap.xml ingest (sitemaps.org protocol) — the frontier
    SOURCE a polite crawler reads before expanding links: per-host
    XML -> one row per <url> entry with optional lastmod/priority
    (absent fields NULL, matching the protocol's optionality). The
    reference's robots.txt handling already points here (gen_robots_txt
    emits Sitemap: lines); these rows seed the frontier with
    publisher-declared priorities instead of uniform ones.

    Scale shape: map-only — regexp_extract_all + posexplode inside one
    projection; a host's sitemap is <=50k entries by spec (~10 MB), so
    per-row work is bounded and nothing shuffles. At 10^10 scale the
    output unions straight into the frontier MERGE keyed by
    (host_bucket, url), same partitioning the frontier already has."""
    return (
        spark.read.parquet(_SM)
        .select(
            "host",
            F.posexplode(
                F.regexp_extract_all("sitemap_xml", F.lit("<url>(.*?)</url>"), 1)
            ).alias("idx", "entry"),
        )
        .select(
            "host",
            (F.col("idx") + 1).cast("int").alias("pos"),
            F.regexp_extract("entry", "<loc>(.*?)</loc>", 1).alias("loc"),
            F.nullif(
                F.regexp_extract("entry", r"<lastmod>2026-06-(\d{2})</lastmod>", 1),
                F.lit(""),
            )
            .cast("int")
            .alias("lastmod_day"),
            F.nullif(
                F.regexp_extract("entry", r"<priority>0\.(\d)</priority>", 1),
                F.lit(""),
            )
            .cast("int")
            .alias("priority_x10"),
        )
    )


# --------------------------------------------------------------- html -> text


def html_to_text_col(body):
    """HTML -> visible text column expr: strip tags, decode the core
    entities, collapse whitespace. Entity decode order matters:
    '&amp;' must decode LAST or '&amp;lt;' double-decodes to '<'
    (round-2 ADVICE; pinned by tests/test_ingest_roundtrip.py)."""
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.regexp_replace(
                            F.coalesce(body, F.lit("")), "<[^>]*>", " "
                        ),
                        F.lit("&lt;"),
                        F.lit("<"),
                    ),
                    F.lit("&gt;"),
                    F.lit(">"),
                ),
                F.lit("&amp;"),
                F.lit("&"),
            ),
            r"\s+",
            " ",
        )
    )



@register(
    "fn_html_to_text",
    f"""SELECT url,
              CASE WHEN text = '' THEN 0
                   ELSE CAST(len(string_split(text, ' ')) AS INT) END AS n_words,
              substr(text, 1, 64) AS head,
              md5(text) AS text_sig
       FROM (SELECT url,
                    trim(regexp_replace(
                        replace(replace(replace(
                            regexp_replace(coalesce(body, ''), '<[^>]*>', ' ', 'g'),
                            '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
                        '\\s+', ' ', 'g')) AS text
             FROM read_parquet('{_P["pages"]}'))""",
)
def fn_html_to_text(spark, sf):
    """HTML -> clean text: strip tags, decode the core entities,
    collapse whitespace — the first transform of every training-data
    text pipeline (raw fetched HTML is what the reference returns,
    crawl/http.js:4-7; corpus curation consumes the visible text).
    Tag stripping is the Cheerio `$.text()` analog the reference uses
    for title/snippet extraction (social.js:62-65) applied to the
    whole document.

    Scale shape: pure map-only column expressions (regexp_replace /
    replace chains, all codegen'd JVM-side); bodies reduce to
    (sig, head, n_words) at the scan and never shuffle. A 100 TB page
    store runs this as a projection inside whatever job reads it next
    — zero extra passes."""
    return (
        _corpus(spark, "pages")
        .select("url", html_to_text_col(F.col("body")).alias("text"))
        .select(
            "url",
            F.when(F.col("text") == "", F.lit(0))
            .otherwise(F.size(F.split("text", " ", -1)))
            .cast("int")
            .alias("n_words"),
            F.substring("text", 1, 64).alias("head"),
            F.md5("text").alias("text_sig"),
        )
    )


# -------------------------------------------------------- recrawl scheduling


def _recrawl_oracle_sql() -> str:
    from .pipeline import _h32_sql

    h1 = _h32_sql("url", "rc1")
    h2 = _h32_sql("url", "rc2")
    return f"""WITH hist AS (
          SELECT host, url,
                 CAST(3 + {h1} % 5 AS INT) AS n_fetches,
                 CAST({h1} % (3 + {h1} % 5 + 1) AS INT) AS n_changes,
                 CAST(1 + {h2} % 240 AS INT) AS age_hours
          FROM read_parquet('{_P["pages"]}')),
        scored AS (
          SELECT *,
                 CAST((((2 * n_changes + 1) * 1000) // (2 * (n_fetches + 1)))
                      * age_hours AS BIGINT) AS score
          FROM hist),
        ranked AS (
          SELECT *, CAST(row_number() OVER
                   (PARTITION BY host ORDER BY score DESC, url) AS INT) AS rnk
          FROM scored)
       SELECT host, url, n_fetches, n_changes, age_hours, score, rnk
       FROM ranked WHERE rnk <= 10"""


@register("rank_recrawl_priority", _recrawl_oracle_sql())
def rank_recrawl_priority(spark, sf):
    """Recrawl scheduling: pick the top-10 URLs per host whose
    (estimated change rate x staleness) is highest — the
    Cho/Garcia-Molina freshness policy that turns diff_crawl_snapshots'
    change observations into the next crawl's frontier priorities.
    Change history is synthesized deterministically per URL (hash
    buckets), the estimator is Laplace-smoothed
    (2c+1)/(2(n+1)) in integer thousandths, and score = rate x hours
    since last fetch, so a page that changes every crawl and is 10 days
    stale outranks a static page however old.

    Scale shape: history is a map-side projection; the only shuffle is
    the per-host ranking window, which Spark executes as
    WindowGroupLimit (rank <= 10 pushes the limit into the sort) —
    per-host state is O(10), never the host's full URL set. Partition
    key is host: same layout the frontier table already has, so at
    10^10 URLs this co-locates with the MERGE that consumes it."""
    from .pipeline import _h32

    h1 = _h32(F.col("url"), "rc1")
    h2 = _h32(F.col("url"), "rc2")
    hist = _corpus(spark, "pages").select(
        "host",
        "url",
        (F.lit(3) + h1 % 5).cast("int").alias("n_fetches"),
        (h1 % (F.lit(3) + h1 % 5 + 1)).cast("int").alias("n_changes"),
        (F.lit(1) + h2 % 240).cast("int").alias("age_hours"),
    )
    scored = hist.withColumn(
        "score",
        F.expr(
            "CAST((((2 * n_changes + 1) * 1000) div (2 * (n_fetches + 1)))"
            " * age_hours AS BIGINT)"
        ),
    )
    w = Window.partitionBy("host").orderBy(F.col("score").desc(), "url")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 10)
        .select("host", "url", "n_fetches", "n_changes", "age_hours", "score", "rnk")
    )


# ------------------------------------------------------- URL template mining


def _tpl_oracle_sql() -> str:
    from .pipeline import _h32_sql

    h = _h32_sql("url", "tpl")
    th = _h32_sql("host", "trap")
    return f"""WITH base AS (
          SELECT url, host, {h} AS h, ({th} % 4 = 0) AS trap_host
          FROM read_parquet('{_P["pages"]}')),
        variants AS (
          SELECT host, url AS u FROM base
          UNION ALL
          SELECT host, url || '?session=' || CAST(h % 97 AS VARCHAR) FROM base WHERE trap_host
          UNION ALL
          SELECT host, url || '?d=2026-0' || CAST(1 + h % 9 AS VARCHAR)
                            || '-' || CAST(10 + h % 19 AS VARCHAR) FROM base WHERE trap_host
          UNION ALL
          SELECT host, url || '/page/' || CAST(h % 50 AS VARCHAR) FROM base WHERE trap_host),
        tpl AS (
          SELECT host,
                 regexp_replace(regexp_extract(u, '^https?://[^/]+(/[^?]*)', 1),
                                '[0-9]+', 'N', 'g')
                 || CASE WHEN strpos(u, '?') > 0
                         THEN '?' || regexp_replace(
                                regexp_replace(u, '^[^?]*\\?', ''), '=[^&]*', '=*', 'g')
                         ELSE '' END AS template,
                 u
          FROM variants)
       SELECT host, template,
              CAST(count(*) AS BIGINT) AS n_urls,
              min(u) AS sample_url,
              (count(*) >= 10 AND (template LIKE '%=*%' OR template LIKE '%/page/N%'))
                AS is_trap
       FROM tpl GROUP BY host, template"""


@register("audit_url_templates", _tpl_oracle_sql())
def audit_url_templates(spark, sf):
    """Crawler-trap detection by URL-template mining: normalize every
    discovered URL to its template (path digits -> N, query values ->
    *), count URLs per (host, template), and flag high-fanout
    parameterized templates — session-id echoes, calendar traps,
    infinite /page/N spaces. This is the frontier's immune system: the
    reference caps damage with max_requests (social.js:78-90) but
    never learns WHICH url shapes are traps; at 10^10 scale the
    scheduler must stop admitting a template, not just budget it.
    Trap-host variants are synthesized deterministically (url-hash) so
    both engines mine identical inputs.

    Scale shape: template normalization is a map-side projection; the
    single shuffle is the (host, template) count whose key cardinality
    is ~templates-per-site (tiny vs URLs), so partials collapse
    map-side. The flag feeds the frontier MERGE as an anti-join key —
    same host partitioning as every other frontier op."""
    from .pipeline import _h32

    h = _h32(F.col("url"), "tpl")
    base = _corpus(spark, "pages").select(
        "url",
        "host",
        h.alias("h"),
        (_h32(F.col("host"), "trap") % 4 == 0).alias("trap_host"),
    )
    sess = F.concat(F.col("url"), F.lit("?session="), (F.col("h") % 97).cast("string"))
    cal = F.concat(
        F.col("url"),
        F.lit("?d=2026-0"),
        (F.col("h") % 9 + 1).cast("string"),
        F.lit("-"),
        (F.col("h") % 19 + 10).cast("string"),
    )
    pg = F.concat(F.col("url"), F.lit("/page/"), (F.col("h") % 50).cast("string"))
    variants = base.select(
        "host",
        F.explode(
            F.array(
                F.col("url"),
                F.when(F.col("trap_host"), sess),
                F.when(F.col("trap_host"), cal),
                F.when(F.col("trap_host"), pg),
            )
        ).alias("u"),
    ).filter(F.col("u").isNotNull())
    norm_path = F.regexp_replace(
        F.regexp_extract("u", r"^https?://[^/]+(/[^?]*)", 1), "[0-9]+", "N"
    )
    norm_q = F.regexp_replace(
        F.regexp_replace("u", r"^[^?]*\?", ""), "=[^&]*", "=*"
    )
    tpl = variants.select(
        "host",
        F.when(F.locate("?", F.col("u")) > 0, F.concat(norm_path, F.lit("?"), norm_q))
        .otherwise(norm_path)
        .alias("template"),
        "u",
    )
    counted = tpl.groupBy("host", "template").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.min("u").alias("sample_url"),
    )
    return counted.select(
        "host",
        "template",
        "n_urls",
        "sample_url",
        (
            (F.col("n_urls") >= 10)
            & (
                F.col("template").contains("=*")
                | F.col("template").contains("/page/N")
            )
        ).alias("is_trap"),
    )


# -------------------------------------------------------- host reputation

# Admission thresholds shared by agg_host_reputation AND
# pipeline_frontier_admission_e2e (both engines' twins interpolate the
# same constants, so tuning them cannot decouple the scorecard from
# the e2e admission verdicts)
_REP_MAX_ERR_PERMILLE = 300
_REP_MAX_DUP_PERMILLE = 200


@register(
    "agg_host_reputation",
    f"""WITH s AS (
          SELECT host, status, md5(coalesce(body, '')) AS sig,
                 length(coalesce(body, '')) AS blen
          FROM read_parquet('{_P["pages"]}'))
       SELECT host,
              CAST(count(*) AS BIGINT) AS n_pages,
              CAST(sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
              CAST(sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END) * 1000
                   // count(*) AS BIGINT) AS err_permille,
              CAST(count(*) - count(DISTINCT sig) AS BIGINT) AS n_dup_bodies,
              CAST((count(*) - count(DISTINCT sig)) * 1000 // count(*) AS BIGINT)
                AS dup_permille,
              CAST(sum(blen) // count(*) AS BIGINT) AS avg_body_len,
              (sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END) * 1000
                   // count(*) <= {_REP_MAX_ERR_PERMILLE}
               AND (count(*) - count(DISTINCT sig)) * 1000
                   // count(*) <= {_REP_MAX_DUP_PERMILLE})
                AS reputable
       FROM s GROUP BY host""",
)
def agg_host_reputation(spark, sf):
    """Host reputation scorecard: per-host fetch-error rate, duplicate
    -body share, and mean body size, folded into an admission verdict —
    the domain-level gate every production crawl runs (a host that
    errors >30% or serves >20% duplicate bodies stops earning frontier
    slots). Complements audit_url_templates (shape-level) with
    host-level evidence; the reputable flag joins back into scheduling
    as a broadcast dim exactly like the robots rules.

    Scale shape: ONE groupBy(host) — bodies reduce to md5 sigs and
    lengths at the scan (map-side), the exchange carries per-host
    partials only. count(DISTINCT sig) is exact here for the oracle
    hash; at 10^10 pages swap approx_count_distinct (HLL) per host and
    the plan loses the Expand, becoming a plain one-pass aggregate."""
    s = _corpus(spark, "pages").select(
        "host",
        "status",
        F.md5(F.coalesce("body", F.lit(""))).alias("sig"),
        F.length(F.coalesce("body", F.lit(""))).alias("blen"),
    )
    g = s.groupBy("host").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("e"),
        F.countDistinct("sig").alias("d"),
        F.sum("blen").alias("bl"),
    )
    return g.select(
        "host",
        F.col("n").cast("bigint").alias("n_pages"),
        F.col("e").cast("bigint").alias("n_err"),
        F.expr("e * 1000 div n").cast("bigint").alias("err_permille"),
        (F.col("n") - F.col("d")).cast("bigint").alias("n_dup_bodies"),
        F.expr("(n - d) * 1000 div n").cast("bigint").alias("dup_permille"),
        F.expr("bl div n").cast("bigint").alias("avg_body_len"),
        (
            (F.expr("e * 1000 div n") <= _REP_MAX_ERR_PERMILLE)
            & (F.expr("(n - d) * 1000 div n") <= _REP_MAX_DUP_PERMILLE)
        ).alias("reputable"),
    )


# ----------------------------------------------------------- image size gate


@register(
    "img_size_gate",
    f"""WITH m AS (
          SELECT image_id, w, h, fmt,
                 length(coalesce(caption, '')) AS caption_len,
                 CASE WHEN trim(coalesce(caption, '')) = '' THEN 0
                      ELSE len(string_split_regex(trim(caption), '\\s+')) END
                   AS n_caption_tokens
          FROM read_parquet('{_P["images"]}'))
       SELECT image_id, w, h, fmt, caption_len,
              CAST(n_caption_tokens AS INT) AS n_caption_tokens,
              CASE WHEN w < 32 OR h < 32 THEN 'too_small'
                   WHEN w * 3 < h OR h * 3 < w THEN 'extreme_aspect'
                   WHEN caption_len < 5 OR caption_len > 200 THEN 'caption_len'
                   WHEN n_caption_tokens < 4 THEN 'caption_tokens'
              END AS reject_reason,
              (w >= 32 AND h >= 32 AND w * 3 >= h AND h * 3 >= w
               AND caption_len BETWEEN 5 AND 200 AND n_caption_tokens >= 4)
                AS admit
       FROM m""",
)
def img_size_gate(spark, sf):
    """LAION-style image+caption admission gate on METADATA only:
    minimum dimensions, aspect-ratio bounds, caption length and token
    floor — the stage-0 cut of an image-curation pipeline, with the
    first failing rule surfaced as reject_reason (the reference's
    admission filters report the same way: admit-or-skip per DOM rule,
    bing_scraper.js:148-151, reverse_image_google_url.js:96-100).

    Scale shape: the plan's whole point — the scan reads ONLY
    (image_id, w, h, fmt, caption); the multi-GB bytes column is
    pruned at the parquet reader (ReadSchema excludes it), so the gate
    over 10^10 images is a metadata-speed pass and the Arrow decode
    stage downstream (img_resize/img_features) consumes admitted rows
    only — same gate->decode ordering the streaming twin
    (img_admission_gate) enforces; limit-before-expensive-stage is the
    reference's own policy (reverse_image_google_final.js:44-46)."""
    cap = F.trim(F.coalesce("caption", F.lit("")))
    m = _corpus(spark, "images").select(
        "image_id",
        "w",
        "h",
        "fmt",
        F.length(F.coalesce("caption", F.lit(""))).alias("caption_len"),
        F.when(cap == "", F.lit(0))
        .otherwise(F.size(F.split(cap, r"\s+")))
        .cast("int")
        .alias("n_caption_tokens"),
    )
    return m.select(
        "image_id",
        "w",
        "h",
        "fmt",
        "caption_len",
        "n_caption_tokens",
        F.when((F.col("w") < 32) | (F.col("h") < 32), "too_small")
        .when((F.col("w") * 3 < F.col("h")) | (F.col("h") * 3 < F.col("w")), "extreme_aspect")
        .when((F.col("caption_len") < 5) | (F.col("caption_len") > 200), "caption_len")
        .when(F.col("n_caption_tokens") < 4, "caption_tokens")
        .alias("reject_reason"),
        (
            (F.col("w") >= 32)
            & (F.col("h") >= 32)
            & (F.col("w") * 3 >= F.col("h"))
            & (F.col("h") * 3 >= F.col("w"))
            & F.col("caption_len").between(5, 200)
            & (F.col("n_caption_tokens") >= 4)
        ).alias("admit"),
    )


# ------------------------------------------------------- redirect resolution


def _redirect_oracle_sql() -> str:
    from .pipeline import _h32_sql

    h = _h32_sql("url", "redir")
    return f"""WITH base AS (
          SELECT url, host,
                 TRY_CAST(regexp_extract(url, 'p(\\d+)$', 1) AS INT) AS pn,
                 {h} AS h
          FROM read_parquet('{_P["pages"]}')),
        e AS (
          SELECT url AS src,
                 regexp_replace(url, 'p\\d+$', '') || 'p' || CAST(pn + 1 AS VARCHAR) AS dst
          FROM base WHERE h % 5 = 0),
        r1 AS (SELECT b.url, e.dst AS d1 FROM base b LEFT JOIN e ON b.url = e.src),
        r2 AS (SELECT r1.url, r1.d1, e.dst AS d2 FROM r1 LEFT JOIN e ON r1.d1 = e.src),
        r3 AS (SELECT r2.url, r2.d1, r2.d2, e.dst AS d3
               FROM r2 LEFT JOIN e ON r2.d2 = e.src)
       SELECT r3.url,
              coalesce(d3, d2, d1, r3.url) AS final_url,
              CAST(CASE WHEN d3 IS NOT NULL THEN 3
                        WHEN d2 IS NOT NULL THEN 2
                        WHEN d1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS hops,
              (e2.src IS NOT NULL) AS truncated
       FROM r3 LEFT JOIN e e2 ON coalesce(d3, d2, d1) = e2.src AND d3 IS NOT NULL"""


@register("join_redirect_resolve", _redirect_oracle_sql())
def join_redirect_resolve(spark, sf):
    """Redirect-chain resolution: map every URL to its final location
    by following 3xx hops — the canonicalization every crawler runs
    before frontier identity (a redirect alias fetched twice is a
    seen-set leak; the reference follows redirects implicitly inside
    Got/page.goto, crawl/http.js:5, render.js:12-14, and never records
    the alias chain). Redirect edges are synthesized deterministically
    (1/5 of pages 301 to the next page number on their host, so
    consecutive redirectors form multi-hop chains; page numbering
    makes chains acyclic by construction). Chains are followed 3 hops;
    a final URL that still redirects is flagged truncated, never
    silently mis-resolved.

    Scale shape: k-hop resolution = k successive left equi-joins of
    the url column against the edge table — each a sort-merge join
    shuffling only (url, dst) pairs; page bodies are never touched. At
    10^10 URLs with long chains the unrolled k joins become pointer
    doubling (resolve 2^k hops in k rounds — same trick as
    dedup_cluster_cc's pointer jumping); redirect edge tables are
    ~1-5% of the frontier, so the build sides broadcast at realistic
    scale."""
    from .pipeline import _h32

    base = _corpus(spark, "pages").select(
        "url",
        F.regexp_extract("url", r"p(\d+)$", 1).cast("int").alias("pn"),
        _h32(F.col("url"), "redir").alias("h"),
    )
    e = base.filter(F.col("h") % 5 == 0).select(
        F.col("url").alias("src"),
        F.concat(
            F.regexp_replace("url", r"p\d+$", ""),
            F.lit("p"),
            (F.col("pn") + 1).cast("string"),
        ).alias("dst"),
    )
    r = base.select("url")
    r1 = r.join(e.withColumnRenamed("dst", "d1"), r.url == e.src, "left").drop("src")
    e2 = e.select(F.col("src").alias("s2"), F.col("dst").alias("d2"))
    r2 = r1.join(e2, r1.d1 == e2.s2, "left").drop("s2")
    e3 = e.select(F.col("src").alias("s3"), F.col("dst").alias("d3"))
    r3 = r2.join(e3, r2.d2 == e3.s3, "left").drop("s3")
    last = F.coalesce("d3", "d2", "d1")
    e4 = e.select(F.col("src").alias("s4"))
    out = r3.join(
        e4, (last == F.col("s4")) & F.col("d3").isNotNull(), "left"
    )
    return out.select(
        "url",
        F.coalesce("d3", "d2", "d1", "url").alias("final_url"),
        F.when(F.col("d3").isNotNull(), 3)
        .when(F.col("d2").isNotNull(), 2)
        .when(F.col("d1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("hops"),
        F.col("s4").isNotNull().alias("truncated"),
    )


# ----------------------------------------------- composed frontier admission


@register(
    "pipeline_frontier_admission_e2e",
    f"""WITH links AS (
          SELECT regexp_extract(url, '^(https?://[^/]+)', 1) AS origin,
                 trim(unnest(out_links)) AS l
          FROM read_parquet('{_P["pages"]}')),
        res AS (
          SELECT l, CASE WHEN l = '' THEN NULL
                         WHEN regexp_matches(l, '^https?://.+') THEN l
                         WHEN substr(l, 1, 1) = '/' THEN origin || l
                         ELSE NULL END AS resolved
          FROM links),
        disc AS (
          SELECT DISTINCT
                 CASE WHEN resolved IS NULL THEN l
                      ELSE replace(resolved, '#', '') END AS url,
                 (resolved IS NULL) AS unresolvable
          FROM res),
        d AS (
          SELECT url, unresolvable,
                 CASE WHEN unresolvable THEN ''
                      ELSE regexp_extract(url, '^https?://([^/]+)', 1) END AS host,
                 CASE WHEN unresolvable THEN ''
                      ELSE regexp_replace(url, '^https?://[^/]*', '') END AS path
          FROM disc),
        seen AS (SELECT DISTINCT url FROM read_parquet('{_P["pages"]}')),
        rep AS (
          SELECT host,
                 (sum(CASE WHEN status <> 'ok' THEN 1 ELSE 0 END) * 1000
                    // count(*) <= {_REP_MAX_ERR_PERMILLE}
                  AND (count(*) - count(DISTINCT md5(coalesce(body, '')))) * 1000
                    // count(*) <= {_REP_MAX_DUP_PERMILLE}) AS reputable
          FROM read_parquet('{_P["pages"]}') GROUP BY host),
        rob AS (SELECT host, disallow FROM read_parquet('{_P["robots"]}')),
        j AS (
          SELECT d.url, d.host, d.unresolvable,
                 (s.url IS NOT NULL) AS crawled,
                 coalesce(len(list_filter(rob.disallow,
                     x -> substr(d.path, 1, length(x)) = x)) > 0, FALSE) AS blocked,
                 coalesce(rep.reputable, TRUE) AS reputable
          FROM d LEFT JOIN seen s ON d.url = s.url
                 LEFT JOIN rob ON d.host = rob.host
                 LEFT JOIN rep ON d.host = rep.host)
       SELECT url, host,
              CASE WHEN unresolvable THEN 'unresolvable'
                   WHEN crawled THEN 'already_seen'
                   WHEN blocked THEN 'robots_disallow'
                   WHEN NOT reputable THEN 'bad_host'
                   ELSE 'admitted' END AS verdict,
              (NOT unresolvable AND NOT crawled AND NOT blocked AND reputable)
                AS admitted
       FROM j""",
)
def pipeline_frontier_admission_e2e(spark, sf):
    """The composed frontier-admission sweep: every DISCOVERED link is
    first RESOLVED against its source page's origin and normalized with
    the engine's own resolver (functions/urls.py resolve_col +
    normalize_col — the same semantics CrawlEngine applies before its
    seen-set anti-join, pinned to social.js:109/121-123), then runs the
    full gate chain in one pass — seen-set membership, robots Disallow
    prefixes, and host reputation — and gets a verdict with first-fail
    precedence instead of a silent drop (the reference's equivalents
    are the Set dedup social.js:127 and same-domain skip :115-119,
    which discard without a trace). Unresolvable hrefs (empty, mailto:,
    bare fragments — social.js:110-113 `continue`s on parse error) get
    an explicit 'unresolvable' verdict rather than leaking through as
    'admitted'. Composes this session's gates the way a real frontier
    MERGE consumes them.

    Scale shape, cheapest-cut-first: resolution is a map-side
    projection on the exploded edges; dedup is ONE distinct exchange
    (10^11 edges -> 10^10 urls); the seen membership is the engine's
    hot sort-merge join shape carrying (url) only; robots rules and
    the per-host reputation aggregate are broadcast dims (hosts <<
    urls), so the big side shuffles exactly twice regardless of scale
    — and the reputation aggregate reads body bytes only as map-side
    md5 partials."""
    from ..functions.urls import normalize_col, origin_col, resolve_col

    pages = _corpus(spark, "pages")
    links = pages.select(
        origin_col(F.col("url")).alias("origin"),
        F.explode("out_links").alias("link"),
    )
    resolved = normalize_col(resolve_col(F.col("link"), F.col("origin")))
    disc = links.select(
        F.coalesce(resolved, F.trim("link")).alias("url"),
        resolved.isNull().alias("unresolvable"),
    ).distinct()
    d = disc.select(
        "url",
        "unresolvable",
        F.when(F.col("unresolvable"), F.lit("")).otherwise(
            F.regexp_extract("url", "^https?://([^/]+)", 1)
        ).alias("host"),
        F.when(F.col("unresolvable"), F.lit("")).otherwise(
            F.regexp_replace("url", "^https?://[^/]*", "")
        ).alias("path"),
    )
    seen = pages.select("url").distinct().withColumn("crawled", F.lit(True))
    rep = (
        pages.groupBy("host")
        .agg(
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("e"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.md5(F.coalesce("body", F.lit("")))).alias("d"),
        )
        .select(
            "host",
            (
                (F.expr("e * 1000 div n") <= _REP_MAX_ERR_PERMILLE)
                & (F.expr("(n - d) * 1000 div n") <= _REP_MAX_DUP_PERMILLE)
            ).alias("reputable"),
        )
    )
    rob = _corpus(spark, "robots").select("host", "disallow")
    j = (
        d.join(seen, "url", "left")
        .join(F.broadcast(rob), "host", "left")
        .join(F.broadcast(rep), "host", "left")
        .select(
            "url",
            "host",
            "unresolvable",
            F.coalesce("crawled", F.lit(False)).alias("crawled"),
            F.coalesce(
                F.exists(
                    "disallow", lambda x: F.col("path").startswith(x)
                ),
                F.lit(False),
            ).alias("blocked"),
            F.coalesce("reputable", F.lit(True)).alias("reputable"),
        )
    )
    return j.select(
        "url",
        "host",
        F.when(F.col("unresolvable"), "unresolvable")
        .when(F.col("crawled"), "already_seen")
        .when(F.col("blocked"), "robots_disallow")
        .when(~F.col("reputable"), "bad_host")
        .otherwise("admitted")
        .alias("verdict"),
        (
            ~F.col("unresolvable")
            & ~F.col("crawled")
            & ~F.col("blocked")
            & F.col("reputable")
        ).alias("admitted"),
    )
