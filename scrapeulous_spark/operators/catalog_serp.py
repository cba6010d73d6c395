"""SERP projection operators (SURVEY.md §2.2 proj_* family), driven
from PAGE PAYLOADS: every query parses SERP-shaped markup out of the
synthetic page store (sources/serp_corpus.py) with JVM-side regexp —
scan → posexplode(blocks) → per-field regexp projection → admission
filter → per-url rank window. No Python UDFs anywhere; the only
shuffle in any of these plans is the per-url rank window.

Each extractor preserves its reference's transform semantics exactly
(SURVEY §1.4.4): pre- vs post-filter position counters, error-string
fallback fields, ' - '/' · ' split arity dispatch, Set-dedup'd
extensions, parseFloat's longest-numeric-prefix quirk
(parseFloat(["4,5"]) === 4), decodeURIComponent on image URL params,
and the reverse-image 3-level imgurl/imgrefurl fallback chain.

DuckDB twins parse THE SAME parquet with the SAME regex patterns
(module constants are interpolated into both sides), so the driver
gets full rows+schema+hash checks against the payload path.

Cross-engine normalizations (documented, applied identically on both
sides): absent DOM fields are NULL (JS leaves the key absent or '');
array-valued fields are '|'-joined strings; bing-shopping extensions
are sorted before joining (JS Set insertion order is document order,
which the sort makes engine-independent).

Reference citations per operator in the docstrings (file:line into
/root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from ..sources.serp_corpus import (
    INLINE_PAIR_RES,
    JUNCTION_WS_RE,
    NEG_SRC,
    POS_SRC,
    SMOKE as SERP_SMOKE,
    ensure_serp_corpus,
)

# resolved (and generated if absent) at import so every oracle SQL
# string below embeds a path that exists by the time DuckDB runs it
_SP = ensure_serp_corpus(SERP_SMOKE)

# ------------------------------------------------- canonicalization
#
# The v2 corpus injects real-DOM markup variance (serp_corpus.py:
# whitespace-only text nodes between tags, permuted attribute order,
# inline formatting tags nested in innerText-read text). Every parser
# runs on the CANONICAL body: junction whitespace collapsed, inline
# formatting tags stripped (the regex twin of innerText flattening).
# Attribute-order variance is handled structurally instead — see the
# _tag_attr / _el_* two-stage helpers below. The same pre-pass exists
# in three engines: Spark (_canon), DuckDB (_OBODY), and plain Python
# (serp_corpus.canon_py, used by the serial pagination oracle).


def _canon(c):
    c = F.regexp_replace(c, JUNCTION_WS_RE, "><")
    for pat, g in INLINE_PAIR_RES:
        c = F.regexp_replace(c, pat, f"${g}")
    return c


_OBODY = f"regexp_replace(body, '{JUNCTION_WS_RE}', '><', 'g')"
for _pat, _g in INLINE_PAIR_RES:
    _OBODY = f"regexp_replace({_OBODY}, '{_pat}', '\\{_g}', 'g')"
# canonical page source for every oracle twin (sink_raw_html excepted:
# a raw-payload sink ships the body untransformed on both sides)
_OP = (
    f"(SELECT url, engine, keyword, page_num, {_OBODY} AS body "
    f"FROM read_parquet('{_SP}'))"
)

# error-string fallbacks: the reference formats `Error parsing ad
# <field>: ${err.message}`; the message is the deterministic null-deref
# text for the selector that failed (google_scraper.js:228-244,
# bing_scraper.js:175-191, :230-234)
_E_INNER = "Cannot read properties of null (reading 'innerText')"
_E_QSEL = "Cannot read properties of null (reading 'querySelector')"
_E_GATTR = "Cannot read properties of null (reading 'getAttribute')"
ERR_AD_TITLE = f"Error parsing ad title: {_E_INNER}"
ERR_AD_DISPLAYED = f"Error parsing ad displayed_link: {_E_QSEL}"
ERR_AD_DESC = f"Error parsing ad description: {_E_INNER}"
ERR_AD_TRACKING = f"Error parsing ad tracking_link: {_E_GATTR}"


def _q(s: str) -> str:
    """Escape a python string for embedding in a single-quoted SQL literal."""
    return s.replace("'", "''")


# --------------------------------------------------- spark-side helpers


def _serp(spark: SparkSession, engine: str, raw: bool = False) -> DataFrame:
    df = spark.read.parquet(_SP).where(F.col("engine") == engine)
    if raw:
        return df
    return df.withColumn("body", _canon(F.col("body")))


def _blocks(spark: SparkSession, engine: str, pat: str) -> DataFrame:
    """(url, pos1, blk): 1-based document-order block index + block markup."""
    return (
        _serp(spark, engine)
        .select(
            "url",
            F.posexplode(F.regexp_extract_all(F.col("body"), F.lit(pat), 0)).alias(
                "pos0", "blk"
            ),
        )
        .select("url", (F.col("pos0") + 1).alias("pos1"), "blk")
    )


def _x(c, pat: str, idx: int = 1):
    """Nullable regexp field: '' (no match / empty group) -> NULL —
    mirrors JS truthiness where '' and a missing node behave alike."""
    return F.nullif(F.regexp_extract(c, pat, idx), F.lit(""))


def _strip_tags(c):
    return F.regexp_replace(c, "<[^>]*>", "")


def _adec(c):
    """Attribute-value entity decode: a DOM serializer writes '&' in
    attribute values as '&amp;' (the E variance class); the reference
    reads DECODED values via getAttribute/el.href, so every attribute
    extraction decodes. Serp attr values contain no other entities."""
    return F.replace(c, F.lit("&amp;"), F.lit("&"))


def _tag_attr(c, tagpat: str, attr: str):
    """Order-insensitive attribute read (v2 corpus permutes attribute
    order): match the tag by its distinguishing class/attribute
    anywhere via `tagpat`, then pull `attr` out of the matched tag
    text (entity-decoded). NULL when the tag or the attribute is
    absent."""
    return F.nullif(
        _adec(F.regexp_extract(F.regexp_extract(c, tagpat, 0), attr + '="([^"]*)"', 1)),
        F.lit(""),
    )


def _dec(c):
    """decodeURIComponent for the fixed escape set the corpus encodes
    (serp_corpus.url_encode_fixed)."""
    c = F.replace(c, F.lit("%20"), F.lit(" "))
    c = F.replace(c, F.lit("%2F"), F.lit("/"))
    c = F.replace(c, F.lit("%3A"), F.lit(":"))
    return F.replace(c, F.lit("%25"), F.lit("%"))


def _js_parsefloat(c):
    """JS parseFloat: longest numeric prefix — parseFloat('4,5')===4,
    parseFloat('4.5')===4.5. `c` is a match string or NULL."""
    return F.nullif(F.regexp_extract(c, r"^[0-9]+(\.[0-9]+)?", 0), F.lit("")).try_cast(
        "double"
    )


# --------------------------------------------------- duckdb-side helpers


def _ob(engine: str, pat: str) -> str:
    """Oracle CTE `b(url, pos1, blk)` — same block extraction as
    _blocks() over the CANONICAL body; generate_subscripts zips
    1-based positions with unnest."""
    return (
        "WITH b AS (SELECT url, "
        f"unnest(regexp_extract_all(body, '{pat}')) AS blk, "
        f"generate_subscripts(regexp_extract_all(body, '{pat}'), 1) AS pos1 "
        f"FROM {_OP} WHERE engine = '{engine}')"
    )


_ODEC = (
    "replace(replace(replace(replace({x}, '%20', ' '), '%2F', '/'), "
    "'%3A', ':'), '%25', '%')"
)


def _odec(x: str) -> str:
    return _ODEC.format(x=x)


def _ojspf(x: str) -> str:
    """Oracle twin of _js_parsefloat."""
    return (
        f"TRY_CAST(nullif(regexp_extract({x}, '^[0-9]+(\\.[0-9]+)?'), '') AS DOUBLE)"
    )


def _oadec(x: str) -> str:
    """Oracle twin of _adec."""
    return f"replace({x}, '&amp;', '&')"


def _otag_attr(x: str, tagpat: str, attr: str) -> str:
    """Oracle twin of _tag_attr."""
    inner = (
        f"regexp_extract(regexp_extract({x}, '{tagpat}'), "
        f"'{attr}=\"([^\"]*)\"', 1)"
    )
    return f"nullif({_oadec(inner)}, '')"


# ================================================================ google


_P_G_ORG = '<div class="g">.*?</div>'
# group1 = date text (before the literal ' - ' the reference strips,
# google_scraper.js:154-156), group2 = snippet text
_P_G_ST = '<span class="st">(?:<span class="f">([^<]*) - </span>)?([^<]*)</span>'
# next-page link + blocked-page IP line — shared with the pagination
# engine (plans/serp_loop.py imports these; google_scraper.js:631-636).
# The #pnnext anchor's attributes permute, so the tag is matched by id
# and href read from the matched tag (two-stage).
_P_NEXT_TAG = '<a[^>]*id="pnnext"[^>]*>'
_P_IP = "IP address: (.*?)Time:"
# sitelink anchor element, attribute-order-insensitive (class="fl"
# anywhere in the tag); titles/links are read from the matched element
_P_SL_EL = '<a[^>]*class="fl"[^>]*>[^<]*</a>'


@register(
    "proj_google_organic",
    f"""{_ob("google", _P_G_ORG)}
    SELECT url, pos1 AS position,
           regexp_extract(blk, '<h3>([^<]*)</h3>', 1) AS title,
           nullif({_oadec('''regexp_extract(blk, '<a href="([^"]*)"><h3>', 1)''')}, '') AS link,
           nullif(regexp_extract(blk, '<cite>([^<]*)</cite>', 1), '') AS displayed_link,
           nullif(regexp_extract(blk, '{_P_G_ST}', 1), '') AS result_date,
           trim(regexp_extract(blk, '{_P_G_ST}', 2)) AS snippet,
           nullif(array_to_string(list_transform(regexp_extract_all(blk, '{_P_SL_EL}'),
               a -> regexp_extract(a, '>([^<]*)<', 1)), '|'), '') AS sitelinks_titles,
           nullif(array_to_string(list_transform(regexp_extract_all(blk, '{_P_SL_EL}'),
               a -> replace(regexp_extract(a, 'href="([^"]*)"', 1), '&amp;', '&')), '|'), '') AS sitelinks_links
    FROM b
    WHERE regexp_extract(blk, '<h3>([^<]*)</h3>', 1) <> ''
      AND trim(regexp_extract(blk, '{_P_G_ST}', 2)) <> ''
      AND nullif(regexp_extract(blk, '<a href="([^"]*)"><h3>', 1), '') IS NOT NULL""",
)
def proj_google_organic(spark, sf):
    """#center_col .g blocks (google_scraper.js:122-211): position is
    the PRE-filter DOM index + 1 (:144-145 — admitted rows keep gaps),
    admission requires title && snippet && link (:203-206), the span.f
    date node's text is captured then removed from the snippet
    (:152-158), sitelinks from .osl a.fl (:186-199)."""
    b = _blocks(spark, "google", _P_G_ORG)
    title = F.regexp_extract("blk", "<h3>([^<]*)</h3>", 1)
    link = F.nullif(
        _adec(F.regexp_extract("blk", '<a href="([^"]*)"><h3>', 1)), F.lit("")
    )
    snippet = F.trim(F.regexp_extract("blk", _P_G_ST, 2))
    out = b.select(
        "url",
        F.col("pos1").alias("position"),
        title.alias("title"),
        link.alias("link"),
        _x(F.col("blk"), "<cite>([^<]*)</cite>").alias("displayed_link"),
        _x(F.col("blk"), _P_G_ST, 1).alias("result_date"),
        snippet.alias("snippet"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.regexp_extract_all(F.col("blk"), F.lit(_P_SL_EL), 0),
                    lambda a: F.regexp_extract(a, ">([^<]*)<", 1),
                ),
                "|",
            ),
            F.lit(""),
        ).alias("sitelinks_titles"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.regexp_extract_all(F.col("blk"), F.lit(_P_SL_EL), 0),
                    lambda a: _adec(F.regexp_extract(a, 'href="([^"]*)"', 1)),
                ),
                "|",
            ),
            F.lit(""),
        ).alias("sitelinks_links"),
    )
    return out.where(
        (F.col("title") != "") & (F.col("snippet") != "") & F.col("link").isNotNull()
    )


_P_G_ADS_TOP = '<ul id="tads">(.*?)</ul>'
_P_G_ADS_BOT = '<ul id="tadsb">(.*?)</ul>'
_P_LI = "<li>.*?</li>"


@register(
    "proj_google_ads",
    f"""WITH p AS (SELECT url, body FROM {_OP} WHERE engine = 'google'),
    sec AS (
      SELECT url, 0 AS block_rank, 'top' AS block_position,
             regexp_extract(body, '{_P_G_ADS_TOP}', 1) AS s FROM p
      UNION ALL
      SELECT url, 1, 'bottom', regexp_extract(body, '{_P_G_ADS_BOT}', 1) FROM p),
    b AS (SELECT url, block_rank, block_position,
                 unnest(regexp_extract_all(s, '{_P_LI}')) AS blk,
                 generate_subscripts(regexp_extract_all(s, '{_P_LI}'), 1) AS pos1
          FROM sec WHERE s <> '')
    SELECT url,
           row_number() OVER (PARTITION BY url ORDER BY block_rank, pos1) AS position,
           block_position,
           nullif(regexp_extract(blk, 'data-rw="([^"]*)"', 1), '') AS tracking_link,
           {_otag_attr("blk", "<a[^>]*data-rw=[^>]*>", "href")} AS link,
           coalesce(nullif(regexp_extract(blk, '<div role="heading">([^<]*)</div>', 1), ''),
                    '{_q(ERR_AD_TITLE)}') AS title,
           coalesce(nullif(regexp_extract(blk, '<span>Ad</span><span>([^<]*)</span>', 1), ''),
                    '{_q(ERR_AD_DISPLAYED)}') AS displayed_link,
           coalesce(nullif(regexp_extract(blk, '<div class="desc">([^<]*)</div>', 1), ''),
                    '{_q(ERR_AD_DESC)}') AS description,
           coalesce(array_to_string(list_transform(regexp_extract_all(blk,
               '<a[^>]*data-arwt=[^>]*>[^<]*</a>'),
               a -> regexp_extract(a, '>([^<]*)<', 1)), '|'), '') AS sitelinks_titles
    FROM b""",
)
def proj_google_ads(spark, sf):
    """#tads li then #tadsb li share ONE position counter
    (google_scraper.js:215-259); title/displayed_link/description fall
    back to `Error parsing ad <field>: <message>` strings (:228-244);
    sitelinks always present as an array ('' when empty, :246-252)."""
    p = _serp(spark, "google").select(
        "url",
        F.regexp_extract("body", _P_G_ADS_TOP, 1).alias("top"),
        F.regexp_extract("body", _P_G_ADS_BOT, 1).alias("bot"),
    )
    sec = (
        p.select(
            "url",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("block_rank"),
                        F.lit("top").alias("block_position"),
                        F.col("top").alias("s"),
                    ),
                    F.struct(
                        F.lit(1).alias("block_rank"),
                        F.lit("bottom").alias("block_position"),
                        F.col("bot").alias("s"),
                    ),
                )
            ).alias("e"),
        )
        .select("url", "e.block_rank", "e.block_position", "e.s")
        .where(F.col("s") != "")
    )
    b = sec.select(
        "url",
        "block_rank",
        "block_position",
        F.posexplode(F.regexp_extract_all(F.col("s"), F.lit(_P_LI), 0)).alias(
            "pos0", "blk"
        ),
    )
    w = Window.partitionBy("url").orderBy("block_rank", "pos0")
    return b.select(
        "url",
        F.row_number().over(w).alias("position"),
        "block_position",
        _x(F.col("blk"), 'data-rw="([^"]*)"').alias("tracking_link"),
        _tag_attr(F.col("blk"), "<a[^>]*data-rw=[^>]*>", "href").alias("link"),
        F.coalesce(
            _x(F.col("blk"), '<div role="heading">([^<]*)</div>'), F.lit(ERR_AD_TITLE)
        ).alias("title"),
        F.coalesce(
            _x(F.col("blk"), "<span>Ad</span><span>([^<]*)</span>"),
            F.lit(ERR_AD_DISPLAYED),
        ).alias("displayed_link"),
        F.coalesce(
            _x(F.col("blk"), '<div class="desc">([^<]*)</div>'), F.lit(ERR_AD_DESC)
        ).alias("description"),
        F.array_join(
            F.transform(
                F.regexp_extract_all(
                    F.col("blk"), F.lit("<a[^>]*data-arwt=[^>]*>[^<]*</a>"), 0
                ),
                lambda a: F.regexp_extract(a, ">([^<]*)<", 1),
            ),
            "|",
        ).alias("sitelinks_titles"),
    )


_P_G_MAP = '<div class="H93uF"><a href="([^"]*)"><img src="([^"]*)">'


@register(
    "proj_google_local_map",
    f"""WITH m AS (
      SELECT url,
             nullif({_oadec(f"regexp_extract(body, '{_P_G_MAP}', 1)")}, '') AS link,
             regexp_extract(body, '{_P_G_MAP}', 2) AS imgsrc
      FROM {_OP} WHERE engine = 'google'),
    g AS (SELECT url, link, substr(imgsrc, 1, 50) AS image,
                 string_split(regexp_extract(link, 'rllag=([^&"]*)', 1), ',') AS gps
          FROM m WHERE link IS NOT NULL)
    SELECT url, link, image,
           CASE WHEN len(gps) = 3 THEN
             TRY_CAST(substr(gps[1], 1, 2) || '.' || substr(gps[1], 3) AS DOUBLE) END AS latitude,
           CASE WHEN len(gps) = 3 THEN
             TRY_CAST(substr(gps[2], 1, 2) || '.' || substr(gps[2], 3) AS DOUBLE) END AS longitude,
           CASE WHEN len(gps) = 3 THEN TRY_CAST(gps[3] AS DOUBLE) END AS altitude
    FROM g""",
)
def proj_google_local_map(spark, sf):
    """.H93uF a (google_scraper.js:271-309): image src sliced to 50
    chars (:289-291), rllag URL param split on ',' — gps struct only
    when exactly 3 parts (:299-308), '.' inserted at digit index 2."""
    m = _serp(spark, "google").select(
        "url",
        F.nullif(_adec(F.regexp_extract("body", _P_G_MAP, 1)), F.lit("")).alias("link"),
        F.regexp_extract("body", _P_G_MAP, 2).alias("imgsrc"),
    )
    g = m.where(F.col("link").isNotNull()).select(
        "url",
        "link",
        F.substring("imgsrc", 1, 50).alias("image"),
        F.split(F.regexp_extract("link", 'rllag=([^&"]*)', 1), ",").alias("gps"),
    )

    def ins_dot(d):
        return F.concat(F.substring(d, 1, 2), F.lit("."), F.substring(d, 3, 32)).try_cast(
            "double"
        )

    three = F.size("gps") == 3
    return g.select(
        "url",
        "link",
        "image",
        F.when(three, ins_dot(F.get("gps", 0))).alias("latitude"),
        F.when(three, ins_dot(F.get("gps", 1))).alias("longitude"),
        F.when(three, F.get("gps", 2).try_cast("double")).alias("altitude"),
    )


_P_G_PLACE = '<a [^>]*class="rllt__link"[^>]*>.*?</a>'
_P_G_SVC = '<div class="RGCvMc"><img[^>]*class="rISBZc"[^>]*>[^<]*</div>'


@register(
    "proj_google_places",
    f"""{_ob("google", _P_G_PLACE)},
    f AS (SELECT url, pos1 AS position,
            nullif(regexp_extract(blk, 'data-cid="([^"]*)"', 1), '') AS place_id,
            nullif(regexp_extract(replace(regexp_extract(blk, ' href="([^"]*)"', 1),
                                  '&amp;', '&'), 'lsig=([^&"]*)', 1), '') AS lsig,
            nullif(regexp_extract(blk, '<img src="([^"]*)">', 1), '') AS thumbnail,
            trim(regexp_extract(blk, '<div role="heading"><span>([^<]*)</span></div>', 1)) AS title,
            regexp_extract(blk, '<div class="r1">(.*?)</div>', 1) AS r1,
            regexp_extract(blk, '<div class="r2">([^<]*)</div>', 1) AS r2,
            nullif(trim(regexp_extract(blk, '<div class="r3">([^<]*)</div>', 1)), '') AS hours,
            nullif(trim(regexp_extract(blk, '<div class="rllt__wrapped">([^<]*)</div>', 1)), '') AS description,
            regexp_extract_all(blk, '{_P_G_SVC}') AS svc
          FROM b),
    g AS (SELECT *, string_split(trim(r2), ' · ') AS parts,
            string_split(trim(regexp_replace(r1, '<[^>]*>', '', 'g')), ' · ') AS r1parts
          FROM f)
    SELECT url, position, place_id, lsig, thumbnail, title,
           CASE WHEN r1 = '' THEN 0.0
                ELSE TRY_CAST(replace(trim(regexp_extract(r1, '<span>([^<]*)</span>', 1)),
                                      ',', '.') AS DOUBLE) END AS rating,
           CASE WHEN r1 <> '' THEN
             TRY_CAST(regexp_extract(r1, '<span>\\(([0-9]+)\\)</span>', 1) AS BIGINT) END AS reviews,
           CASE WHEN r1 <> '' THEN r1parts[-1] END AS place_type,
           CASE WHEN r2 = '' THEN NULL
                WHEN len(parts) = 1 THEN parts[1] ELSE parts[-2] END AS address,
           CASE WHEN r2 <> '' AND len(parts) > 1 THEN parts[-1] END AS phone,
           hours, description,
           nullif(array_to_string(list_filter(list_transform(svc, s ->
             CASE WHEN regexp_extract(s, 'src="([^"]*)"', 1) = '{POS_SRC}'
                  THEN lower(regexp_replace(trim(regexp_extract(s, '>([^<]*)</div>', 1)),
                                            '\\s', '_', 'g')) || '=true'
                  WHEN regexp_extract(s, 'src="([^"]*)"', 1) = '{NEG_SRC}'
                  THEN lower(regexp_replace(trim(regexp_extract(s, '>([^<]*)</div>', 1)),
                                            '\\s', '_', 'g')) || '=false'
             END), x -> x IS NOT NULL), '|'), '') AS service_options
    FROM g""",
)
def proj_google_places(spark, sf):
    """.rllt__link cards (google_scraper.js:311-414): rating defaults
    0.0 and is parseFloat(','→'.') of the first detail span (:335,
    :344-352); reviews strip parens (:353-357); type = last ' · '
    part of the first detail row's text (:359); address/phone arity
    dispatch — phone = LAST part only when ≥2 parts (:362-371);
    service_options keyed by lower(trim→'_') label with booleans from
    the positive/negative icon blobs (:386-406); position 1-based over
    ALL cards (:317-320, no admission filter)."""
    b = _blocks(spark, "google", _P_G_PLACE)
    href = _adec(F.regexp_extract("blk", ' href="([^"]*)"', 1))
    f = b.select(
        "url",
        F.col("pos1").alias("position"),
        _x(F.col("blk"), 'data-cid="([^"]*)"').alias("place_id"),
        _x(href, 'lsig=([^&"]*)').alias("lsig"),
        _x(F.col("blk"), '<img src="([^"]*)">').alias("thumbnail"),
        F.trim(
            F.regexp_extract("blk", '<div role="heading"><span>([^<]*)</span></div>', 1)
        ).alias("title"),
        F.regexp_extract("blk", '<div class="r1">(.*?)</div>', 1).alias("r1"),
        F.regexp_extract("blk", '<div class="r2">([^<]*)</div>', 1).alias("r2"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<div class="r3">([^<]*)</div>', 1)),
            F.lit(""),
        ).alias("hours"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<div class="rllt__wrapped">([^<]*)</div>', 1)
            ),
            F.lit(""),
        ).alias("description"),
        F.regexp_extract_all(F.col("blk"), F.lit(_P_G_SVC), 0).alias("svc"),
    )
    parts = F.split(F.trim("r2"), " · ")
    r1parts = F.split(F.trim(_strip_tags(F.col("r1"))), " · ")
    has_r1 = F.col("r1") != ""

    def svc_entry(s):
        key = F.lower(
            F.regexp_replace(
                F.trim(F.regexp_extract(s, ">([^<]*)</div>", 1)), r"\s", "_"
            )
        )
        src = F.regexp_extract(s, 'src="([^"]*)"', 1)
        return (
            F.when(src == POS_SRC, F.concat(key, F.lit("=true")))
            .when(src == NEG_SRC, F.concat(key, F.lit("=false")))
            .otherwise(F.lit(None))
        )

    return f.select(
        "url",
        "position",
        "place_id",
        "lsig",
        "thumbnail",
        "title",
        F.when(~has_r1, F.lit(0.0))
        .otherwise(
            F.replace(
                F.trim(F.regexp_extract("r1", "<span>([^<]*)</span>", 1)),
                F.lit(","),
                F.lit("."),
            ).try_cast("double")
        )
        .alias("rating"),
        F.when(
            has_r1,
            F.regexp_extract("r1", r"<span>\(([0-9]+)\)</span>", 1).try_cast("bigint"),
        ).alias("reviews"),
        F.when(has_r1, F.get(r1parts, F.size(r1parts) - 1)).alias("place_type"),
        F.when(F.col("r2") == "", F.lit(None))
        .when(F.size(parts) == 1, F.get(parts, 0))
        .otherwise(F.get(parts, F.size(parts) - 2))
        .alias("address"),
        F.when(
            (F.col("r2") != "") & (F.size(parts) > 1), F.get(parts, F.size(parts) - 1)
        ).alias("phone"),
        "hours",
        "description",
        F.nullif(
            F.array_join(
                F.filter(F.transform("svc", svc_entry), lambda x: x.isNotNull()), "|"
            ),
            F.lit(""),
        ).alias("service_options"),
    )


_P_G_BRS = '<div id="brs">(.*?)</div>'
_P_G_REL_A = '<a href="([^"]*)">([^<]*)</a>'


@register(
    "proj_google_related",
    f"""WITH p AS (SELECT url, regexp_extract(body, '{_P_G_BRS}', 1) AS brs
                   FROM {_OP} WHERE engine = 'google'),
    b AS (SELECT url, unnest(regexp_extract_all(brs, '{_P_G_REL_A}')) AS a
          FROM p WHERE brs <> '')
    SELECT url,
           regexp_extract(a, '{_P_G_REL_A}', 2) AS query,
           regexp_extract(a, '{_P_G_REL_A}', 1) AS link
    FROM b""",
)
def proj_google_related(spark, sf):
    """#brs .brs_col a -> {query: innerText, link: href}
    (google_scraper.js:428-444)."""
    p = _serp(spark, "google").select(
        "url", F.regexp_extract("body", _P_G_BRS, 1).alias("brs")
    )
    b = p.where(F.col("brs") != "").select(
        "url",
        F.explode(F.regexp_extract_all(F.col("brs"), F.lit(_P_G_REL_A), 0)).alias("a"),
    )
    return b.select(
        "url",
        F.regexp_extract("a", _P_G_REL_A, 2).alias("query"),
        F.regexp_extract("a", _P_G_REL_A, 1).alias("link"),
    )


_P_INPUT_TAG = '<input[^>]*name="q"[^>]*>'
_P_G_STATS = '<div id="result-stats">([^<]*)</div>'
_P_FPRSL = '<span id="fprsl">([^<]*)</span>'
# JS: num_res_text.match(/[\d,\.\s]{2,20}/g) — match[0] total, match[1] time
_P_G_NUMS = "[0-9,.\\s]{2,20}"


@register(
    "proj_google_search_info",
    f"""WITH p AS (
      SELECT url,
             {_otag_attr("body", _P_INPUT_TAG, "value")} AS input_q,
             nullif(regexp_extract(body, '{_P_FPRSL}', 1), '') AS effective_query,
             regexp_extract_all(regexp_extract(body, '{_P_G_STATS}', 1),
                                '{_P_G_NUMS}') AS nums
      FROM {_OP} WHERE engine = 'google')
    SELECT url,
           coalesce(effective_query, input_q) AS query_displayed,
           CASE WHEN effective_query IS NOT NULL
                THEN 'Results for spelling corrected query'
                ELSE 'Results for exact spelling' END AS organic_results_state,
           trim(nums[1]) AS total_results,
           trim(nums[2]) AS time_taken_displayed
    FROM p""",
)
def proj_google_search_info(spark, sf):
    """search_information (google_scraper.js:446-523): query_displayed
    from input[name=q].value, overridden by the #fprsl effective query
    which also flips organic_results_state (:509-523); total_results
    and time_taken_displayed are the FIRST TWO matches of the
    digits-and-separators regex, kept as trimmed STRINGS (:488-499 —
    google does not parseInt, unlike bing)."""
    p = _serp(spark, "google").select(
        "url",
        _tag_attr(F.col("body"), _P_INPUT_TAG, "value").alias("input_q"),
        _x(F.col("body"), _P_FPRSL).alias("effective_query"),
        F.regexp_extract_all(
            F.regexp_extract("body", _P_G_STATS, 1), F.lit(_P_G_NUMS), 0
        ).alias("nums"),
    )
    return p.select(
        "url",
        F.coalesce("effective_query", "input_q").alias("query_displayed"),
        F.when(
            F.col("effective_query").isNotNull(),
            F.lit("Results for spelling corrected query"),
        )
        .otherwise(F.lit("Results for exact spelling"))
        .alias("organic_results_state"),
        F.trim(F.get("nums", 0)).alias("total_results"),
        F.trim(F.get("nums", 1)).alias("time_taken_displayed"),
    )


# ================================================================== bing


_P_B_ORG = '<li class="b_algo">.*?</li>'
# bing organic admission pair (title && link, bing_scraper.js:148-151) —
# shared with the /serp facade (api.py) so facade counts can never
# drift from proj_bing_organic
_P_B_TITLE = '<h2><a href="[^"]*">([^<]*)</a></h2>'
_P_B_LINK = '<h2><a href="([^"]*)">'


@register(
    "proj_bing_organic",
    f"""{_ob("bing", _P_B_ORG)},
    f AS (SELECT url, pos1,
            nullif(regexp_extract(blk, '{_P_B_TITLE}', 1), '') AS title,
            nullif({_oadec(f"regexp_extract(blk, '{_P_B_LINK}', 1)")}, '') AS link,
            nullif(regexp_extract(blk, '<cite>([^<]*)</cite>', 1), '') AS displayed_link,
            nullif(trim(regexp_extract(blk, '<div class="b_caption"><p>([^<]*)</p></div>', 1)), '') AS snippet,
            nullif(array_to_string(regexp_extract_all(blk,
                '<span class="fre">([^<]*)</span>', 1), '|'), '') AS rich_extensions,
            nullif(array_to_string(list_transform(regexp_extract_all(blk, '{_P_SL_EL}'),
                a -> regexp_extract(a, '>([^<]*)<', 1)), '|'), '') AS sitelinks_titles,
            nullif(array_to_string(list_transform(regexp_extract_all(blk, '{_P_SL_EL}'),
                a -> replace(regexp_extract(a, 'href="([^"]*)"', 1), '&amp;', '&')), '|'), '') AS sitelinks_links
          FROM b)
    SELECT url,
           row_number() OVER (PARTITION BY url ORDER BY pos1) AS position,
           title, link, displayed_link, snippet, rich_extensions,
           sitelinks_titles, sitelinks_links
    FROM f WHERE title IS NOT NULL AND link IS NOT NULL""",
)
def proj_bing_organic(spark, sf):
    """#b_results .b_algo (bing_scraper.js:81-156): admission is
    title && link ONLY (:148-151); position assigned AFTER the filter —
    dense post-filter rank (:148-150, SURVEY §1.4.4). snippet stays
    null when .b_caption p is absent (:89, :108-112); rich-snippet
    extensions and sitelinks joined '|'."""
    b = _blocks(spark, "bing", _P_B_ORG)
    f = b.select(
        "url",
        "pos1",
        _x(F.col("blk"), _P_B_TITLE).alias("title"),
        F.nullif(_adec(F.regexp_extract("blk", _P_B_LINK, 1)), F.lit("")).alias("link"),
        _x(F.col("blk"), "<cite>([^<]*)</cite>").alias("displayed_link"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<div class="b_caption"><p>([^<]*)</p></div>', 1)
            ),
            F.lit(""),
        ).alias("snippet"),
        F.nullif(
            F.array_join(
                F.regexp_extract_all(
                    F.col("blk"), F.lit('<span class="fre">([^<]*)</span>'), 1
                ),
                "|",
            ),
            F.lit(""),
        ).alias("rich_extensions"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.regexp_extract_all(F.col("blk"), F.lit(_P_SL_EL), 0),
                    lambda a: F.regexp_extract(a, ">([^<]*)<", 1),
                ),
                "|",
            ),
            F.lit(""),
        ).alias("sitelinks_titles"),
        F.nullif(
            F.array_join(
                F.transform(
                    F.regexp_extract_all(F.col("blk"), F.lit(_P_SL_EL), 0),
                    lambda a: _adec(F.regexp_extract(a, 'href="([^"]*)"', 1)),
                ),
                "|",
            ),
            F.lit(""),
        ).alias("sitelinks_links"),
    )
    admitted = f.where(F.col("title").isNotNull() & F.col("link").isNotNull())
    w = Window.partitionBy("url").orderBy("pos1")
    return admitted.select(
        "url",
        F.row_number().over(w).alias("position"),
        "title",
        "link",
        "displayed_link",
        "snippet",
        "rich_extensions",
        "sitelinks_titles",
        "sitelinks_links",
    )


_P_B_ADS_TOP = '<div class="b_ad"><ul>(.*?)</ul>'
_P_B_ADS_BOT = '<div class="b_ad b_adBottom"><ul>(.*?)</ul>'
_P_B_RATING = "[0-9][,.][0-9]"


@register(
    "proj_bing_ads",
    f"""WITH p AS (SELECT url, body FROM {_OP} WHERE engine = 'bing'),
    sec AS (
      SELECT url, 0 AS block_rank, 'top' AS block_position,
             regexp_extract(body, '{_P_B_ADS_TOP}', 1) AS s FROM p
      UNION ALL
      SELECT url, 1, 'bottom', regexp_extract(body, '{_P_B_ADS_BOT}', 1) FROM p),
    b AS (SELECT url, block_rank, block_position,
                 unnest(regexp_extract_all(s, '{_P_LI}')) AS blk,
                 generate_subscripts(regexp_extract_all(s, '{_P_LI}'), 1) AS pos1
          FROM sec WHERE s <> ''),
    f AS (SELECT *,
            trim(regexp_extract(blk, '<div class="Qezod">([^<]*)</div>', 1)) AS qz,
            regexp_extract(regexp_extract(blk, 'aria-label="([^"]*)"', 1),
                           '{_P_B_RATING}') AS rat,
            nullif(trim(regexp_extract(blk, '<div class="EkiqXc MUxGbd">([^<]*)</div>', 1)), '') AS phone_el
          FROM b),
    g AS (SELECT *, string_split(qz, ' - ') AS parts FROM f)
    SELECT url,
           row_number() OVER (PARTITION BY url ORDER BY block_rank, pos1) AS position,
           block_position,
           coalesce(nullif(regexp_extract(blk, '<div class="b_textAdTitleLink">([^<]*)</div>', 1), ''),
                    '{_q(ERR_AD_TITLE)}') AS title,
           coalesce(nullif(regexp_extract(blk, '<div class="b_adurl"><cite>([^<]*)</cite></div>', 1), ''),
                    'Error parsing ad displayed_link: {_q(_E_INNER)}') AS displayed_link,
           coalesce(nullif(regexp_extract(blk, '<div class="b_caption"><p>([^<]*)</p></div>', 1), ''),
                    '{_q(ERR_AD_DESC)}') AS description,
           nullif(trim(regexp_extract(blk, '<div class="MUxGbd lyLwlc aLF0Z">([^<]*)</div>', 1)), '') AS extensions,
           CASE WHEN len(parts) >= 2 THEN parts[1] END AS address,
           coalesce(phone_el, CASE WHEN len(parts) >= 2 THEN parts[2] END) AS phone,
           {_ojspf("rat")} AS rating,
           coalesce(nullif({_oadec('''regexp_extract(blk, '<h2><a href="([^"]*)"></a></h2>', 1)''')}, ''),
                    '{_q(ERR_AD_TRACKING)}') AS tracking_link,
           nullif(array_to_string(list_transform(regexp_extract_all(blk,
               '<div class="b_ads1line">.*?</div>'), d ->
               array_to_string(list_transform(regexp_extract_all(d,
                   '<a href="[^"]*">([^<]*)</a>', 1), t -> trim(t)), '|')), '|'), '') AS sitelinks_titles
    FROM g""",
)
def proj_bing_ads(spark, sf):
    """.b_ad ul li with block_position from the b_adBottom ancestor
    (bing_scraper.js:158-253): error-string fallbacks for title/
    displayed_link/description/tracking_link (:175-191, :230-234);
    ' - ' address/phone split only when >= 2 parts (:203-211), then the
    .EkiqXc phone element OVERRIDES phone (:223-226); rating is
    parseFloat of the aria-label match ARRAY — JS coerces the array to
    a string, so '4,1' parses as 4.0 but '3.2' as 3.2 (:214-221,
    SURVEY §1.4.4); one shared position counter over top+bottom."""
    p = _serp(spark, "bing").select(
        "url",
        F.regexp_extract("body", _P_B_ADS_TOP, 1).alias("top"),
        F.regexp_extract("body", _P_B_ADS_BOT, 1).alias("bot"),
    )
    sec = (
        p.select(
            "url",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("block_rank"),
                        F.lit("top").alias("block_position"),
                        F.col("top").alias("s"),
                    ),
                    F.struct(
                        F.lit(1).alias("block_rank"),
                        F.lit("bottom").alias("block_position"),
                        F.col("bot").alias("s"),
                    ),
                )
            ).alias("e"),
        )
        .select("url", "e.block_rank", "e.block_position", "e.s")
        .where(F.col("s") != "")
    )
    b = sec.select(
        "url",
        "block_rank",
        "block_position",
        F.posexplode(F.regexp_extract_all(F.col("s"), F.lit(_P_LI), 0)).alias(
            "pos0", "blk"
        ),
    )
    qz = F.trim(F.regexp_extract("blk", '<div class="Qezod">([^<]*)</div>', 1))
    parts = F.split(qz, " - ")
    rat = F.regexp_extract(
        F.regexp_extract("blk", 'aria-label="([^"]*)"', 1), _P_B_RATING, 0
    )
    phone_el = F.nullif(
        F.trim(F.regexp_extract("blk", '<div class="EkiqXc MUxGbd">([^<]*)</div>', 1)),
        F.lit(""),
    )
    sl = F.transform(
        F.regexp_extract_all(F.col("blk"), F.lit('<div class="b_ads1line">.*?</div>'), 0),
        lambda d: F.array_join(
            F.transform(
                F.regexp_extract_all(d, F.lit('<a href="[^"]*">([^<]*)</a>'), 1),
                lambda t: F.trim(t),
            ),
            "|",
        ),
    )
    w = Window.partitionBy("url").orderBy("block_rank", "pos0")
    return b.select(
        "url",
        F.row_number().over(w).alias("position"),
        "block_position",
        F.coalesce(
            _x(F.col("blk"), '<div class="b_textAdTitleLink">([^<]*)</div>'),
            F.lit(ERR_AD_TITLE),
        ).alias("title"),
        F.coalesce(
            _x(F.col("blk"), '<div class="b_adurl"><cite>([^<]*)</cite></div>'),
            F.lit(f"Error parsing ad displayed_link: {_E_INNER}"),
        ).alias("displayed_link"),
        F.coalesce(
            _x(F.col("blk"), '<div class="b_caption"><p>([^<]*)</p></div>'),
            F.lit(ERR_AD_DESC),
        ).alias("description"),
        F.nullif(
            F.trim(
                F.regexp_extract(
                    "blk", '<div class="MUxGbd lyLwlc aLF0Z">([^<]*)</div>', 1
                )
            ),
            F.lit(""),
        ).alias("extensions"),
        F.when(F.size(parts) >= 2, F.get(parts, 0)).alias("address"),
        F.coalesce(phone_el, F.when(F.size(parts) >= 2, F.get(parts, 1))).alias("phone"),
        _js_parsefloat(rat).alias("rating"),
        F.coalesce(
            F.nullif(
                _adec(F.regexp_extract("blk", '<h2><a href="([^"]*)"></a></h2>', 1)),
                F.lit(""),
            ),
            F.lit(ERR_AD_TRACKING),
        ).alias("tracking_link"),
        F.nullif(F.array_join(sl, "|"), F.lit("")).alias("sitelinks_titles"),
    )


_P_B_SHOP_R = '<section class="Yi78Pd">(.*?)</section>'
_P_B_SHOP_T = '<section class="top-pla-group-inner">(.*?)</section>'
_P_B_UNIT = '<div class="pla-unit">.*?</div>'


@register(
    "proj_bing_shopping",
    f"""WITH p AS (
      SELECT url,
             nullif(regexp_extract(body, '{_P_B_SHOP_R}', 1), '') AS right_s,
             nullif(regexp_extract(body, '{_P_B_SHOP_T}', 1), '') AS top_s
      FROM {_OP} WHERE engine = 'bing'),
    sec AS (SELECT url,
                   coalesce(right_s, top_s) AS s,
                   CASE WHEN right_s IS NOT NULL THEN 'right' ELSE 'top' END AS block_position
            FROM p WHERE coalesce(right_s, top_s) IS NOT NULL),
    b AS (SELECT url, block_position,
                 unnest(regexp_extract_all(s, '{_P_B_UNIT}')) AS blk,
                 generate_subscripts(regexp_extract_all(s, '{_P_B_UNIT}'), 1) AS pos1
          FROM sec),
    f AS (SELECT *,
            nullif(trim(regexp_extract(blk, '<span class="T4OwTb">([^<]*)</span>', 1)), '') AS price,
            regexp_extract_all(
                regexp_extract(blk, '<g-review-stars><span aria-label="([^"]*)"', 1),
                '([0-9],[0-9])', 1) AS rmatches
          FROM b)
    SELECT url, pos1 AS position, block_position,
           {_otag_attr("blk", '<a[^>]*class="plantl pla-unit-title-link"[^>]*>', "href")} AS source_link,
           trim(coalesce(
             nullif(regexp_extract(blk, '<span class="LbUacb"><span class="rhsl5s">([^<]*)</span></span>', 1), ''),
             nullif(regexp_extract(blk, '<span class="LbUacb">([^<]*)</span>', 1), ''))) AS source,
           TRY_CAST(replace(rmatches[-1], ',', '.') AS DOUBLE) AS rating,
           TRY_CAST(replace(replace(replace(
             regexp_extract(blk, '<span class="fl">\\(([^)<]*)\\)</span>', 1),
             '(', ''), ')', ''), ',', '') AS BIGINT) AS reviews,
           nullif(trim(regexp_extract(blk, '<span class="rhsl5">([^<]*)</span>', 1)), '') AS title,
           price,
           TRY_CAST(nullif(trim(regexp_replace(replace(price, ',', '.'),
                                               '[^0-9.-]', '', 'g')), '') AS DOUBLE) AS extracted_price,
           nullif(array_to_string(list_sort(list_distinct(list_filter(
             list_transform(regexp_extract_all(blk,
               '<span class="pla-extensions-container">([^<]*)</span>', 1), t -> trim(t)),
             t -> t <> ''))), '|'), '') AS extensions,
           nullif({_oadec('''regexp_extract(blk, '<div class="pla-unit"><a href="([^"]*)">', 1)''')}, '') AS link,
           {_otag_attr("blk", '<a[^>]*class="plantl pla-unit-title-link"[^>]*>', "href")} AS vendor_link,
           nullif(regexp_extract(blk, '<span class="Gor6zc"><img src="([^"]*)">', 1), '') AS thumbnail
    FROM f WHERE price IS NOT NULL""",
)
def proj_bing_shopping(spark, sf):
    """.pla-unit shopping units — right rail preferred, top group as
    fallback (bing_scraper.js:255-264); position is ++position over ALL
    units so non-priced units leave gaps, admission requires price
    (:268-271, :356-358); rating = parseFloat of the LAST (\\d,\\d)
    aria-label match with ','→'.' (:287-296); reviews strip parens and
    ',' then parseInt (:299-305); extracted_price ','→'.' then strip
    non-numerics (:312-320); extensions are Set-deduped (:323-339 —
    sorted here on both sides for engine-independent order); link from
    the unit's first anchor, source_link == vendor_link (both reference
    selectors resolve to a.plantl.pla-unit-title-link, :273-276,
    :346-349)."""
    p = _serp(spark, "bing").select(
        "url",
        F.nullif(F.regexp_extract("body", _P_B_SHOP_R, 1), F.lit("")).alias("right_s"),
        F.nullif(F.regexp_extract("body", _P_B_SHOP_T, 1), F.lit("")).alias("top_s"),
    )
    sec = p.select(
        "url",
        F.coalesce("right_s", "top_s").alias("s"),
        F.when(F.col("right_s").isNotNull(), F.lit("right"))
        .otherwise(F.lit("top"))
        .alias("block_position"),
    ).where(F.col("s").isNotNull())
    b = sec.select(
        "url",
        "block_position",
        F.posexplode(F.regexp_extract_all(F.col("s"), F.lit(_P_B_UNIT), 0)).alias(
            "pos0", "blk"
        ),
    )
    price = F.nullif(
        F.trim(F.regexp_extract("blk", '<span class="T4OwTb">([^<]*)</span>', 1)),
        F.lit(""),
    )
    rmatches = F.regexp_extract_all(
        F.regexp_extract("blk", '<g-review-stars><span aria-label="([^"]*)"', 1),
        F.lit("([0-9],[0-9])"),
        1,
    )
    ext = F.array_sort(
        F.array_distinct(
            F.filter(
                F.transform(
                    F.regexp_extract_all(
                        F.col("blk"),
                        F.lit('<span class="pla-extensions-container">([^<]*)</span>'),
                        1,
                    ),
                    lambda t: F.trim(t),
                ),
                lambda t: t != "",
            )
        )
    )
    f = b.withColumn("price", price).where(F.col("price").isNotNull())
    return f.select(
        "url",
        (F.col("pos0") + 1).alias("position"),
        "block_position",
        _tag_attr(F.col("blk"), '<a[^>]*class="plantl pla-unit-title-link"[^>]*>', "href").alias(
            "source_link"
        ),
        F.trim(
            F.coalesce(
                _x(
                    F.col("blk"),
                    '<span class="LbUacb"><span class="rhsl5s">([^<]*)</span></span>',
                ),
                _x(F.col("blk"), '<span class="LbUacb">([^<]*)</span>'),
            )
        ).alias("source"),
        F.replace(F.get(rmatches, F.size(rmatches) - 1), F.lit(","), F.lit("."))
        .try_cast("double")
        .alias("rating"),
        F.replace(
            F.replace(
                F.replace(
                    F.regexp_extract("blk", r'<span class="fl">\(([^)<]*)\)</span>', 1),
                    F.lit("("),
                    F.lit(""),
                ),
                F.lit(")"),
                F.lit(""),
            ),
            F.lit(","),
            F.lit(""),
        )
        .try_cast("bigint")
        .alias("reviews"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<span class="rhsl5">([^<]*)</span>', 1)),
            F.lit(""),
        ).alias("title"),
        "price",
        F.nullif(
            F.trim(
                F.regexp_replace(
                    F.replace(F.col("price"), F.lit(","), F.lit(".")), "[^0-9.-]", ""
                )
            ),
            F.lit(""),
        )
        .try_cast("double")
        .alias("extracted_price"),
        F.nullif(F.array_join(ext, "|"), F.lit("")).alias("extensions"),
        F.nullif(
            _adec(
                F.regexp_extract("blk", '<div class="pla-unit"><a href="([^"]*)">', 1)
            ),
            F.lit(""),
        ).alias("link"),
        _tag_attr(F.col("blk"), '<a[^>]*class="plantl pla-unit-title-link"[^>]*>', "href").alias(
            "vendor_link"
        ),
        _x(F.col("blk"), '<span class="Gor6zc"><img src="([^"]*)">').alias("thumbnail"),
    )


_P_B_ITEM_A = '<div class="item">.*?</div>'
_P_B_ITEM_B = '<div class="b_scard">.*?</div>'
_P_B_RATING_B = "[0-9][,.]*[0-9]*"
_P_B_TAG1 = '<span class="tags"><span class="tag">([^<]*)</span>'
_P_B_TAG2 = '<span class="tags"><span class="tag">[^<]*</span><span class="tag">([^<]*)</span>'
_O_ARIA = ("regexp_extract(regexp_extract(regexp_extract(blk, "
           "'<span[^>]*class=\"csrc sc_rc1\"[^>]*>'), "
           "'aria-label=\"([^\"]*)\"', 1), '{pat}')")
_O_RAT_A = _ojspf(_O_ARIA.format(pat=_P_B_RATING))
_O_RAT_B = _ojspf(_O_ARIA.format(pat=_P_B_RATING_B))



@register(
    "proj_bing_places",
    f"""WITH pages AS (SELECT url, body FROM {_OP} WHERE engine = 'bing'),
    a AS (SELECT url, 'A' AS layout,
                 unnest(regexp_extract_all(body, '{_P_B_ITEM_A}')) AS blk,
                 generate_subscripts(regexp_extract_all(body, '{_P_B_ITEM_A}'), 1) AS pos1
          FROM pages),
    bb AS (SELECT url, 'B' AS layout,
                 unnest(regexp_extract_all(body, '{_P_B_ITEM_B}')) AS blk,
                 generate_subscripts(regexp_extract_all(body, '{_P_B_ITEM_B}'), 1) AS pos1
          FROM pages),
    fa AS (SELECT url, layout, pos1 AS position,
             nullif(regexp_extract(blk, 'id="c-eid_([^"]*)"', 1), '') AS place_id,
             nullif(regexp_extract(blk, 'elat="([^"]*)"', 1), '') AS latitude,
             nullif(regexp_extract(blk, 'elong="([^"]*)"', 1), '') AS longitude,
             nullif(regexp_extract(blk, '<img src="([^"]*)">', 1), '') AS thumbnail,
             nullif(trim(regexp_extract(blk, '<span class="tit">([^<]*)</span>', 1)), '') AS title,
             nullif(trim(regexp_extract(blk, '<span class="ft_otl b_primtxt">([^<]*)</span>', 1)), '') AS mention,
             nullif(trim(regexp_extract(blk, '<span class="opHours">([^<]*)</span>', 1)), '') AS hours,
             {_O_RAT_A} AS rating,
             TRY_CAST(nullif(regexp_extract(regexp_extract(blk, '{_P_B_TAG1}', 1),
                                            '\\(([0-9]+)\\)', 1), '') AS BIGINT) AS reviews,
             string_split(regexp_extract(blk, '{_P_B_TAG2}', 1), ' · ') AS parts3,
             NULL AS address, NULL AS phone
           FROM a),
    fb AS (SELECT url, layout, pos1 AS position,
             NULL AS place_id, NULL AS latitude, NULL AS longitude,
             nullif(regexp_extract(blk, '<img src="([^"]*)">', 1), '') AS thumbnail,
             nullif(trim(regexp_extract(blk, '<span class="lc_content"><h2>([^<]*)</h2></span>', 1)), '') AS title,
             nullif(trim(regexp_extract(blk, '<span class="ft_otl ft_wm">([^<]*)</span>', 1)), '') AS mention,
             nullif(trim(regexp_extract(blk, '<cite class="opHours">([^<]*)</cite>', 1)), '') AS hours,
             {_O_RAT_B} AS rating,
             TRY_CAST(nullif(regexp_extract(regexp_extract(regexp_extract(blk,
               '<cite[^>]*class="csrc"[^>]*>'), 'aria-label="([^"]*)"', 1), '\\(([0-9]+)\\)', 1), '') AS BIGINT) AS reviews,
             CAST(NULL AS VARCHAR[]) AS parts3,
             string_split(regexp_extract(blk, '<span class="b_factrow fr3">([^<]*)</span>', 1), ' · ') AS parts2
           FROM bb)
    SELECT url, layout, position, place_id, latitude, longitude, thumbnail,
           title, mention, hours, rating, reviews,
           CASE WHEN len(parts3) = 3 THEN trim(parts3[1]) END AS place_type,
           CASE WHEN len(parts3) = 3 THEN trim(parts3[2]) END AS price,
           CASE WHEN len(parts3) = 3 THEN trim(parts3[3]) END AS location,
           address, phone
    FROM fa
    UNION ALL
    SELECT url, layout, position, place_id, latitude, longitude, thumbnail,
           title, mention, hours, rating, reviews,
           NULL, NULL, NULL,
           CASE WHEN len(parts2) = 2 THEN trim(parts2[1]) END,
           CASE WHEN len(parts2) = 2 THEN trim(parts2[2]) END
    FROM fb""",
)
def proj_bing_places(spark, sf):
    """Two place layouts unioned (bing_scraper.js:374-553): layout A
    #ent-car-exp .item (:383-471 — place_id strips 'c-eid_' :396,
    gps lat/long kept as attribute STRINGS :399-402, 3-way
    type/price/location split only at exactly 3 parts :459-468,
    reviews from the first tag's parenthesized count :445-451); layout
    B #lMapContainer .b_scard (:474-549 — 2-way address/phone split
    :538-546, reviews from the aria-label regex :528-536). The
    position counter RESTARTS for layout B (:476-478). Ratings use
    JS's parseFloat-of-match-array prefix quirk; layout B's laxer
    rating regex \\d[,.]*\\d* (:521-526). Website/directions links
    come from parent-node traversal outside the item markup and are
    not modeled. Layout-A pages where the first tag has no
    parenthesized count would crash the reference (null.length,
    :448); the dataflow twin yields NULL reviews instead."""
    pages = _serp(spark, "bing")

    def layer(pat, layout):
        return pages.select(
            "url",
            F.lit(layout).alias("layout"),
            F.posexplode(F.regexp_extract_all(F.col("body"), F.lit(pat), 0)).alias(
                "pos0", "blk"
            ),
        ).select("url", "layout", (F.col("pos0") + 1).alias("position"), "blk")

    a = layer(_P_B_ITEM_A, "A")
    aria_a = F.regexp_extract(
        F.regexp_extract("blk", '<span[^>]*class="csrc sc_rc1"[^>]*>', 0),
        'aria-label="([^"]*)"',
        1,
    )
    parts3 = F.split(F.regexp_extract("blk", _P_B_TAG2, 1), " · ")
    fa = a.select(
        "url",
        "layout",
        "position",
        _x(F.col("blk"), 'id="c-eid_([^"]*)"').alias("place_id"),
        _x(F.col("blk"), 'elat="([^"]*)"').alias("latitude"),
        _x(F.col("blk"), 'elong="([^"]*)"').alias("longitude"),
        _x(F.col("blk"), '<img src="([^"]*)">').alias("thumbnail"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<span class="tit">([^<]*)</span>', 1)),
            F.lit(""),
        ).alias("title"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<span class="ft_otl b_primtxt">([^<]*)</span>', 1)
            ),
            F.lit(""),
        ).alias("mention"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<span class="opHours">([^<]*)</span>', 1)),
            F.lit(""),
        ).alias("hours"),
        _js_parsefloat(F.regexp_extract(aria_a, _P_B_RATING, 0)).alias("rating"),
        F.nullif(
            F.regexp_extract(F.regexp_extract("blk", _P_B_TAG1, 1), r"\(([0-9]+)\)", 1),
            F.lit(""),
        )
        .try_cast("bigint")
        .alias("reviews"),
        F.when(F.size(parts3) == 3, F.trim(F.get(parts3, 0))).alias("place_type"),
        F.when(F.size(parts3) == 3, F.trim(F.get(parts3, 1))).alias("price"),
        F.when(F.size(parts3) == 3, F.trim(F.get(parts3, 2))).alias("location"),
        F.lit(None).cast("string").alias("address"),
        F.lit(None).cast("string").alias("phone"),
    )

    bb = layer(_P_B_ITEM_B, "B")
    aria_b = F.regexp_extract(
        F.regexp_extract("blk", '<span[^>]*class="csrc sc_rc1"[^>]*>', 0),
        'aria-label="([^"]*)"',
        1,
    )
    parts2 = F.split(
        F.regexp_extract("blk", '<span class="b_factrow fr3">([^<]*)</span>', 1), " · "
    )
    fb = bb.select(
        "url",
        "layout",
        "position",
        F.lit(None).cast("string").alias("place_id"),
        F.lit(None).cast("string").alias("latitude"),
        F.lit(None).cast("string").alias("longitude"),
        _x(F.col("blk"), '<img src="([^"]*)">').alias("thumbnail"),
        F.nullif(
            F.trim(
                F.regexp_extract(
                    "blk", '<span class="lc_content"><h2>([^<]*)</h2></span>', 1
                )
            ),
            F.lit(""),
        ).alias("title"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<span class="ft_otl ft_wm">([^<]*)</span>', 1)
            ),
            F.lit(""),
        ).alias("mention"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<cite class="opHours">([^<]*)</cite>', 1)),
            F.lit(""),
        ).alias("hours"),
        _js_parsefloat(F.regexp_extract(aria_b, _P_B_RATING_B, 0)).alias("rating"),
        F.nullif(
            F.regexp_extract(
                F.regexp_extract(
                    F.regexp_extract("blk", '<cite[^>]*class="csrc"[^>]*>', 0),
                    'aria-label="([^"]*)"',
                    1,
                ),
                r"\(([0-9]+)\)",
                1,
            ),
            F.lit(""),
        )
        .try_cast("bigint")
        .alias("reviews"),
        F.lit(None).cast("string").alias("place_type"),
        F.lit(None).cast("string").alias("price"),
        F.lit(None).cast("string").alias("location"),
        F.when(F.size(parts2) == 2, F.trim(F.get(parts2, 0))).alias("address"),
        F.when(F.size(parts2) == 2, F.trim(F.get(parts2, 1))).alias("phone"),
    )
    return fa.unionByName(fb)


@register(
    "proj_bing_questions",
    f"""WITH p AS (SELECT url, body FROM {_OP} WHERE engine = 'bing')
    SELECT url, trim(unnest(regexp_extract_all(body,
        '<div class="df_topAlAs">([^<]*)</div>', 1))) AS question
    FROM p""",
)
def proj_bing_questions(spark, sf):
    """#relatedQnAListDisplay .df_topAlAs -> {question: trimmed text}
    (bing_scraper.js:556-567)."""
    return (
        _serp(spark, "bing")
        .select(
            "url",
            F.explode(
                F.regexp_extract_all(
                    F.col("body"), F.lit('<div class="df_topAlAs">([^<]*)</div>'), 1
                )
            ).alias("q"),
        )
        .select("url", F.trim("q").alias("question"))
    )


_P_B_PAG = '<div class="b_pag">(.*?)</div>'
_P_B_PAG_A = '<li><a href="([^"]*)">([^<]*)</a></li>'


@register(
    "proj_bing_pagination",
    f"""WITH p AS (SELECT url, regexp_extract(body, '{_P_B_PAG}', 1) AS pag
                   FROM {_OP} WHERE engine = 'bing'),
    b AS (SELECT url, pag, unnest(regexp_extract_all(pag, '{_P_B_PAG_A}')) AS a
          FROM p WHERE pag <> '')
    SELECT url,
           trim(regexp_extract(a, '{_P_B_PAG_A}', 2)) AS page_text,
           {_oadec(f"regexp_extract(a, '{_P_B_PAG_A}', 1)")} AS href,
           {_otag_attr("pag", '<a[^>]*class="sb_pagN sb_pagN_bp"[^>]*>', "href")} AS next,
           TRY_CAST(nullif(regexp_extract(pag,
             '<a class="sb_pagS sb_pagS_bp b_widePag sb_bp">([^<]*)</a>', 1), '') AS BIGINT) AS current
    FROM b
    WHERE trim(regexp_extract(a, '{_P_B_PAG_A}', 2)) <> ''
      AND regexp_extract(a, '{_P_B_PAG_A}', 1) <> ''""",
)
def proj_bing_pagination(spark, sf):
    """.b_pag other_pages map relationalized to (page_text, href) rows
    plus the shared next/current fields (bing_scraper.js:569-596):
    entries admitted only when text && href (:587-590), current =
    parseInt of the selected-page anchor (:582-584)."""
    p = _serp(spark, "bing").select(
        "url", F.regexp_extract("body", _P_B_PAG, 1).alias("pag")
    )
    b = p.where(F.col("pag") != "").select(
        "url",
        "pag",
        F.explode(F.regexp_extract_all(F.col("pag"), F.lit(_P_B_PAG_A), 0)).alias("a"),
    )
    out = b.select(
        "url",
        F.trim(F.regexp_extract("a", _P_B_PAG_A, 2)).alias("page_text"),
        _adec(F.regexp_extract("a", _P_B_PAG_A, 1)).alias("href"),
        _tag_attr(F.col("pag"), '<a[^>]*class="sb_pagN sb_pagN_bp"[^>]*>', "href").alias("next"),
        _x(
            F.col("pag"), '<a class="sb_pagS sb_pagS_bp b_widePag sb_bp">([^<]*)</a>'
        )
        .try_cast("bigint")
        .alias("current"),
    )
    return out.where((F.col("page_text") != "") & (F.col("href") != ""))


_P_B_VID = '<li class="gT5me">.*?</li>'


@register(
    "proj_bing_videos",
    f"""{_ob("bing", _P_B_VID)},
    f AS (SELECT url,
            nullif(trim(regexp_extract(blk, '<div class="mB12kf">([^<]*)</div>', 1)), '') AS title,
            nullif(regexp_extract(blk, '<a href="([^"]*)">', 1), '') AS link,
            nullif(regexp_extract(blk, '<img src="([^"]*)">', 1), '') AS thumbnail,
            nullif(trim(regexp_extract(blk, '<div class="RgAZAc">([^<]*)</div>', 1)), '') AS channel,
            nullif(trim(regexp_extract(blk, '<div class="Woharf LQFTgb">([^<]*)</div>', 1)), '') AS duration,
            string_split(trim(regexp_extract(blk, '<div class="nHGuld">([^<]*)</div>', 1)), ' - ') AS parts
          FROM b)
    SELECT url, title, link, thumbnail, channel, duration,
           CASE WHEN len(parts) = 2 THEN parts[1] END AS platform,
           CASE WHEN len(parts) = 2 THEN parts[2] END AS video_date
    FROM f WHERE title IS NOT NULL AND link IS NOT NULL""",
)
def proj_bing_videos(spark, sf):
    """.gT5me inline videos (bing_scraper.js:598-648): platform/date
    from the ' - ' split only at exactly 2 parts (:631-639), admission
    title && link (:641-643); no position field in the reference."""
    b = _blocks(spark, "bing", _P_B_VID)
    parts = F.split(
        F.trim(F.regexp_extract("blk", '<div class="nHGuld">([^<]*)</div>', 1)), " - "
    )
    f = b.select(
        "url",
        F.nullif(
            F.trim(F.regexp_extract("blk", '<div class="mB12kf">([^<]*)</div>', 1)),
            F.lit(""),
        ).alias("title"),
        _x(F.col("blk"), '<a href="([^"]*)">').alias("link"),
        _x(F.col("blk"), '<img src="([^"]*)">').alias("thumbnail"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<div class="RgAZAc">([^<]*)</div>', 1)),
            F.lit(""),
        ).alias("channel"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<div class="Woharf LQFTgb">([^<]*)</div>', 1)
            ),
            F.lit(""),
        ).alias("duration"),
        F.when(F.size(parts) == 2, F.get(parts, 0)).alias("platform"),
        F.when(F.size(parts) == 2, F.get(parts, 1)).alias("video_date"),
    )
    return f.where(F.col("title").isNotNull() & F.col("link").isNotNull())


_P_B_COUNT = '<div class="sb_count">([^<]*)</div>'
# bing keeps the RTL-mark/apostrophe separators in the match class then
# strips them before parseInt (bing_scraper.js:689-698)
_P_B_NUMS = "[0-9,.\\s’]{2,20}"


@register(
    "proj_bing_search_info",
    f"""WITH p AS (
      SELECT url,
             {_otag_attr("body", _P_INPUT_TAG, "value")} AS query_displayed,
             nullif(trim(regexp_extract(body, '{_P_FPRSL}', 1)), '') AS fix,
             regexp_extract_all(regexp_extract(body, '{_P_B_COUNT}', 1),
                                '{_P_B_NUMS}') AS nums
      FROM {_OP} WHERE engine = 'bing')
    SELECT url, query_displayed,
           CASE WHEN fix IS NOT NULL
                THEN 'Some results for exact spelling but showing fixed spelling'
                ELSE 'Results for exact spelling' END AS organic_results_state,
           fix AS showing_results_for,
           fix AS spelling_fix,
           TRY_CAST(nullif(trim(regexp_replace(nums[1], '[,.\\s’]', '', 'g')), '') AS BIGINT)
             AS total_results
    FROM p""",
)
def proj_bing_search_info(spark, sf):
    """Bing search_information (bing_scraper.js:664-701):
    query_displayed from input[name=q]; the #fprsl spelling fix sets
    showing_results_for + spelling_fix AND flips organic_results_state
    (:681-686); total_results = parseInt of the first digits-and-
    separators match with [,.\\s’] stripped (:688-698) — an INT here,
    unlike google's string."""
    p = _serp(spark, "bing").select(
        "url",
        _tag_attr(F.col("body"), _P_INPUT_TAG, "value").alias("query_displayed"),
        F.nullif(F.trim(F.regexp_extract("body", _P_FPRSL, 1)), F.lit("")).alias("fix"),
        F.regexp_extract_all(
            F.regexp_extract("body", _P_B_COUNT, 1), F.lit(_P_B_NUMS), 0
        ).alias("nums"),
    )
    return p.select(
        "url",
        "query_displayed",
        F.when(
            F.col("fix").isNotNull(),
            F.lit("Some results for exact spelling but showing fixed spelling"),
        )
        .otherwise(F.lit("Results for exact spelling"))
        .alias("organic_results_state"),
        F.col("fix").alias("showing_results_for"),
        F.col("fix").alias("spelling_fix"),
        F.nullif(
            F.trim(F.regexp_replace(F.get("nums", 0), "[,.\\s’]", "")), F.lit("")
        )
        .try_cast("bigint")
        .alias("total_results"),
    )


# ================================================== amazon / nytimes


_P_AMZ_ITEM = '<div[^>]*class="s-result-item"[^>]*>.*?</div>'


@register(
    "proj_amazon_products",
    f"""{_ob("amazon", _P_AMZ_ITEM)},
    f AS (SELECT url, blk,
            nullif(regexp_extract(blk, 'data-asin="([^"]*)"', 1), '') AS asin,
            nullif(regexp_extract(blk, '<h2><a href="([^"]*)"><cite>', 1), '') AS product_url,
            nullif(regexp_extract(blk, '<cite>([^<]*)</cite>', 1), '') AS title,
            nullif(trim(regexp_extract(blk, '<span class="a-price"><span class="a-offscreen">([^<]*)</span></span>', 1)), '') AS price
          FROM b)
    SELECT url, asin, product_url, title,
           nullif(array_to_string(list_filter(list_transform(regexp_extract_all(blk,
             '<span class="a-section">([^<]*)</span>', 1), t -> trim(t)), t -> t <> ''), '|'), '')
             AS product_info,
           contains(blk, '<i class="a-icon-prime">') AS prime_delivery,
           nullif(trim(regexp_extract(blk, '<span class="a-color-price">([^<]*)</span>', 1)), '') AS stock,
           price,
           nullif(trim(regexp_extract(blk, '<em aria-label="s">([^<]*)</em>', 1)), '') AS stars,
           nullif(trim(regexp_extract(blk, '<em aria-label="r">([^<]*)</em>', 1)), '') AS num_ratings
    FROM f WHERE price IS NOT NULL""",
)
def proj_amazon_products(spark, sf):
    """.s-result-list .s-result-item (serp/amazon.js:23-74): url+title
    only when the h2>a link element exists (:33-38, row kept);
    product_info collects every nonempty trimmed .a-section text
    (:40-49); prime_delivery is icon presence (:50-55); the price
    selector throws when absent, so the catch DROPS the whole product
    (:62, :67-70) — price is the admission filter; stars/num_ratings
    optional (:63-67)."""
    b = _blocks(spark, "amazon", _P_AMZ_ITEM)
    info = F.filter(
        F.transform(
            F.regexp_extract_all(
                F.col("blk"), F.lit('<span class="a-section">([^<]*)</span>'), 1
            ),
            lambda t: F.trim(t),
        ),
        lambda t: t != "",
    )
    f = b.select(
        "url",
        _x(F.col("blk"), 'data-asin="([^"]*)"').alias("asin"),
        _x(F.col("blk"), '<h2><a href="([^"]*)"><cite>').alias("product_url"),
        _x(F.col("blk"), "<cite>([^<]*)</cite>").alias("title"),
        F.nullif(F.array_join(info, "|"), F.lit("")).alias("product_info"),
        F.col("blk").contains('<i class="a-icon-prime">').alias("prime_delivery"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<span class="a-color-price">([^<]*)</span>', 1)
            ),
            F.lit(""),
        ).alias("stock"),
        F.nullif(
            F.trim(
                F.regexp_extract("blk", '<span class="a-price"><span class="a-offscreen">([^<]*)</span></span>', 1)
            ),
            F.lit(""),
        ).alias("price"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<em aria-label="s">([^<]*)</em>', 1)),
            F.lit(""),
        ).alias("stars"),
        F.nullif(
            F.trim(F.regexp_extract("blk", '<em aria-label="r">([^<]*)</em>', 1)),
            F.lit(""),
        ).alias("num_ratings"),
    )
    return f.where(F.col("price").isNotNull())


_P_NYT_STORY = '<div class="story">.*?</div>'


@register(
    "proj_nytimes_headlines",
    f"""{_ob("nytimes", _P_NYT_STORY)},
    f AS (SELECT url,
            regexp_extract(blk, '<span class="balancedHeadline">([^<]*)</span>', 1) AS headline,
            nullif(regexp_extract(blk, '<p>([^<]*)</p>', 1), '') AS snippet,
            nullif(regexp_extract(blk, '<a href="([^"]*)">', 1), '') AS link
          FROM b)
    SELECT url, headline, snippet, link
    FROM f WHERE snippet IS NOT NULL AND link IS NOT NULL""",
)
def proj_nytimes_headlines(spark, sf):
    """h2 .balancedHeadline with the 4th-parent block traversal
    flattened to block scope (custom/nytimes.js:21-48): a story emits
    only when both the sibling <p> text and <a> link exist (:33-40)."""
    b = _blocks(spark, "nytimes", _P_NYT_STORY)
    f = b.select(
        "url",
        F.regexp_extract("blk", '<span class="balancedHeadline">([^<]*)</span>', 1).alias(
            "headline"
        ),
        _x(F.col("blk"), "<p>([^<]*)</p>").alias("snippet"),
        _x(F.col("blk"), '<a href="([^"]*)">').alias("link"),
    )
    return f.where(F.col("snippet").isNotNull() & F.col("link").isNotNull())


# ================================================== reverse image


_P_RG_BOX = '<div class="rg_bx">.*?</div>'
# the block's first anchor, href'd or not: group1 = its attribute text
_P_RG_A1 = "<a([^>]*)>"
# trailing second anchor: the reference's a:nth-child(2)
_P_RG_A2 = '</a><a href="([^"]*)">([^<]*)</a></div>'
# `a img` (img inside an anchor) src for the dataimage fallback
_P_RG_AIMG = '<a[^>]*><span>[^<]*</span>(<img[^>]*>)'


@register(
    "proj_rev_image_meta",
    f"""{_ob("revimg_google", _P_RG_BOX)},
    f AS (SELECT url, pos1 - 1 AS rank, blk,
            nullif(replace(regexp_extract(regexp_extract(blk, '{_P_RG_A1}', 1),
                                  'href="([^"]*)"', 1), '&amp;', '&'), '') AS href,
            nullif(regexp_extract(blk, 'data-iurl="([^"]*)"', 1), '') AS iurl,
            contains(blk, '<img ') AS has_img,
            nullif({_oadec(f"regexp_extract(blk, '{_P_RG_A2}', 1)")}, '') AS a2_href,
            regexp_extract(blk, '{_P_RG_A2}', 2) AS a2_text,
            contains(blk, '</a><a href=') AS has_a2,
            nullif(regexp_extract(regexp_extract(blk, '{_P_RG_AIMG}', 1),
                                  'src="([^"]*)"', 1), '') AS aimg_src
          FROM b),
    g AS (SELECT *,
            nullif({_odec("regexp_extract(coalesce(href, ''), 'imgurl=([^&]*)&', 1)")}, '') AS imgurl1,
            nullif({_odec("regexp_extract(coalesce(href, ''), 'imgrefurl=([^&]*)&', 1)")}, '') AS imgrefurl1,
            CASE WHEN href IS NOT NULL THEN 'normal' ELSE '' END AS type1,
            CASE WHEN href IS NOT NULL
                 THEN regexp_replace(blk, '<[^>]*>', '', 'g') END AS imgtext1
          FROM f),
    h AS (SELECT *,
            (imgurl1 IS NULL OR imgrefurl1 IS NULL) AS need_fb,
            CASE WHEN (imgurl1 IS NULL OR imgrefurl1 IS NULL) AND has_img
                 THEN iurl ELSE imgurl1 END AS imgurl2,
            CASE WHEN (imgurl1 IS NULL OR imgrefurl1 IS NULL) AND has_img
                 THEN 'data-iurl' ELSE type1 END AS type2,
            CASE WHEN (imgurl1 IS NULL OR imgrefurl1 IS NULL) AND has_a2
                 THEN (CASE WHEN a2_href = '#' THEN NULL ELSE a2_href END)
                 ELSE imgrefurl1 END AS imgrefurl2,
            CASE WHEN (imgurl1 IS NULL OR imgrefurl1 IS NULL) AND has_a2
                 THEN a2_text ELSE imgtext1 END AS imgtext2
          FROM g)
    SELECT url, rank,
           CASE WHEN imgurl2 IS NULL AND aimg_src IS NOT NULL
                THEN 'dataimage' ELSE type2 END AS type,
           coalesce(imgurl2, aimg_src) AS imgurl,
           imgrefurl2 AS imgrefurl,
           imgtext2 AS imgtext
    FROM h""",
)
def proj_rev_image_meta(spark, sf):
    """Reverse-image metadata with the 3-level fallback chain
    (custom/reverse_image_google_final.js:109-182): rank is 0-based
    over ALL candidates (:134); level 1 'normal' = first anchor's href
    with imgurl=/imgrefurl= params decodeURIComponent'd, imgtext =
    parent innerText (:136-146); when either param is missing, the img
    node's data-iurl OVERWRITES imgurl (even when the attribute is
    null) and type becomes 'data-iurl' (:148-156), the second anchor
    supplies imgrefurl ('#' -> null) and imgtext (:158-168); finally
    with options.extract_data_image (pinned true here) a still-null
    imgurl falls back to the `a img` src as type 'dataimage'
    (:170-176). Variant rank conventions vs reverse_image_bing's
    1-based rank per SURVEY §1.4.4."""
    b = _blocks(spark, "revimg_google", _P_RG_BOX)
    href = F.nullif(
        _adec(
            F.regexp_extract(F.regexp_extract("blk", _P_RG_A1, 1), 'href="([^"]*)"', 1)
        ),
        F.lit(""),
    )
    f = b.select(
        "url",
        (F.col("pos1") - 1).alias("rank"),
        "blk",
        href.alias("href"),
        _x(F.col("blk"), 'data-iurl="([^"]*)"').alias("iurl"),
        F.col("blk").contains("<img ").alias("has_img"),
        F.nullif(_adec(F.regexp_extract("blk", _P_RG_A2, 1)), F.lit("")).alias("a2_href"),
        F.regexp_extract("blk", _P_RG_A2, 2).alias("a2_text"),
        F.col("blk").contains('</a><a href=').alias("has_a2"),
        _x(F.regexp_extract("blk", _P_RG_AIMG, 1), 'src="([^"]*)"').alias("aimg_src"),
    )
    imgurl1 = F.nullif(
        _dec(F.regexp_extract(F.coalesce("href", F.lit("")), "imgurl=([^&]*)&", 1)),
        F.lit(""),
    )
    imgrefurl1 = F.nullif(
        _dec(F.regexp_extract(F.coalesce("href", F.lit("")), "imgrefurl=([^&]*)&", 1)),
        F.lit(""),
    )
    g = f.select(
        "*",
        imgurl1.alias("imgurl1"),
        imgrefurl1.alias("imgrefurl1"),
        F.when(F.col("href").isNotNull(), F.lit("normal")).otherwise("").alias("type1"),
        F.when(F.col("href").isNotNull(), _strip_tags(F.col("blk"))).alias("imgtext1"),
    )
    need_fb = F.col("imgurl1").isNull() | F.col("imgrefurl1").isNull()
    h = g.select(
        "*",
        F.when(need_fb & F.col("has_img"), F.col("iurl"))
        .otherwise(F.col("imgurl1"))
        .alias("imgurl2"),
        F.when(need_fb & F.col("has_img"), F.lit("data-iurl"))
        .otherwise(F.col("type1"))
        .alias("type2"),
        F.when(
            need_fb & F.col("has_a2"),
            F.when(F.col("a2_href") == "#", F.lit(None)).otherwise(F.col("a2_href")),
        )
        .otherwise(F.col("imgrefurl1"))
        .alias("imgrefurl2"),
        F.when(need_fb & F.col("has_a2"), F.col("a2_text"))
        .otherwise(F.col("imgtext1"))
        .alias("imgtext2"),
    )
    return h.select(
        "url",
        "rank",
        F.when(
            F.col("imgurl2").isNull() & F.col("aimg_src").isNotNull(), F.lit("dataimage")
        )
        .otherwise(F.col("type2"))
        .alias("type"),
        F.coalesce("imgurl2", "aimg_src").alias("imgurl"),
        F.col("imgrefurl2").alias("imgrefurl"),
        F.col("imgtext2").alias("imgtext"),
    )


_P_RB_BOX = '<div class="richImage">.*?</div>'
_P_RB_CAP = '<span class="captionContainer">([^<]*)<'
_P_RB_REF = '<span class="captionContainer">[^<]*<a href="([^"]*)">'


@register(
    "proj_bing_rev_image",
    f"""{_ob("revimg_bing", _P_RB_BOX)},
    f AS (SELECT url, pos1 AS rank,
            {_otag_attr("blk", '<a[^>]*class="richImgLnk"[^>]*>', "href")} AS href,
            nullif(regexp_extract(blk, '{_P_RB_CAP}', 1), '') AS imgtext,
            nullif(regexp_extract(blk, '{_P_RB_REF}', 1), '') AS imgrefurl
          FROM b)
    SELECT url, rank,
           nullif({_odec("regexp_extract(coalesce(href, ''), 'mediaurl=(.*)', 1)")}, '') AS imgurl,
           imgtext, imgrefurl
    FROM f""",
)
def proj_bing_rev_image(spark, sf):
    """#i_results div.richImage (custom/reverse_image_bing.js:46-74):
    rank is 1-BASED (:60 — vs google's 0-based, SURVEY §1.4.4); imgurl
    = decodeURIComponent of the mediaurl= param matched to END of href
    (:47-53); imgtext/imgrefurl from the caption container; a block
    missing .richImgLnk throws into the catch and stays a rank-only
    row (:62-69)."""
    b = _blocks(spark, "revimg_bing", _P_RB_BOX)
    href = _tag_attr(F.col("blk"), '<a[^>]*class="richImgLnk"[^>]*>', "href")
    return b.select(
        "url",
        F.col("pos1").alias("rank"),
        F.nullif(
            _dec(F.regexp_extract(F.coalesce(href, F.lit("")), "mediaurl=(.*)", 1)),
            F.lit(""),
        ).alias("imgurl"),
        _x(F.col("blk"), _P_RB_CAP).alias("imgtext"),
        _x(F.col("blk"), _P_RB_REF).alias("imgrefurl"),
    )


# ================================== engine-level SERP pagination loop


def _pagination_oracle_sql(num_pages: int = 3) -> str:
    """Unrolled-CTE twin of SerpPaginationEngine.run(): each superstep
    is one join + projection CTE, the next state coalesces #pnnext with
    the current url (re-parse quirk) and drops blocked keywords."""
    adm = (
        "b -> regexp_extract(b, '<h3>([^<]*)</h3>', 1) <> '' "
        f"AND trim(regexp_extract(b, '{_P_G_ST}', 2)) <> '' "
        "AND regexp_extract(b, '<a href=\"([^\"]*)\"><h3>', 1) <> ''"
    )
    parts = [
        f"WITH s AS (SELECT url, body FROM {_OP} WHERE engine = 'google'),",
        f"st1 AS (SELECT keyword, url FROM read_parquet('{_SP}') "
        "WHERE engine = 'google' AND page_num = 1),",
    ]
    for r in range(1, num_pages + 1):
        parts.append(
            f"p{r} AS (SELECT st{r}.keyword, s.url, s.body FROM st{r} "
            f"JOIN s ON st{r}.url = s.url),"
        )
        # shared parse constants, quote-escaped for the SQL literal —
        # the engine (serp_loop) and this oracle can never drift apart
        org_esc = _P_G_ORG.replace('"', '\\"')
        next_esc = _P_NEXT_TAG.replace('"', '\\"')
        parts.append(
            f"r{r} AS (SELECT keyword, {r} AS page_num, url, "
            "contains(body, 'id=\"recaptcha\"') AS blocked, "
            "CASE WHEN contains(body, 'id=\"recaptcha\"') THEN "
            f"trim(regexp_extract(body, '{_P_IP}', 1)) END AS blocked_ip, "
            "CASE WHEN NOT contains(body, 'id=\"recaptcha\"') THEN CAST(len(list_filter("
            f"regexp_extract_all(body, '{org_esc}'), {adm})) AS INT) "
            "END AS n_organic, "
            f"nullif(replace(regexp_extract(regexp_extract(body, '{next_esc}'), "
            "'href=\\\"([^\\\"]*)\\\"', 1), '&amp;', '&'), '') "
            f"AS next_href FROM p{r}),"
        )
        if r < num_pages:
            parts.append(
                f"st{r + 1} AS (SELECT keyword, coalesce(next_href, url) AS url "
                f"FROM r{r} WHERE NOT blocked),"
            )
    union = " UNION ALL ".join(
        f"SELECT keyword, page_num, url, "
        f"CASE WHEN blocked THEN 'Failed' ELSE 'ok' END AS status, "
        f"blocked_ip, n_organic FROM r{r}"
        for r in range(1, num_pages + 1)
    )
    sql = "\n".join(parts).rstrip(",")
    return f"{sql}\n{union}"


@register("serp_pagination_engine", _pagination_oracle_sql(3))
def serp_pagination_engine(spark, sf):
    """num_pages=3 pagination superstep over the SERP page store
    (google_scraper.js:43-94): per-keyword state advances via #pnnext
    (:631-636, missing -> re-parse same page), recaptcha pages emit one
    Failed row with blocked_ip and abort the keyword (:52-67). The
    engine-vs-serial-oracle exact match lives in
    tests/test_serp_pagination.py; this catalog twin unrolls the three
    supersteps as chained SQL CTEs for the driver's hash check."""
    from ..plans.serp_loop import SerpPaginationEngine

    return SerpPaginationEngine(spark, _SP, num_pages=3).run()


@register(
    "sink_raw_html",
    f"""SELECT url, keyword, body AS html
        FROM read_parquet('{_SP}') WHERE engine = 'amazon'""",
)
def sink_raw_html(spark, sf):
    """Raw payload attach: the reference appends the full page HTML to
    every parse result (`results.html = await this.page.content()`,
    google_scraper.js:70 equivalent at :98, amazon.js:75,
    nytimes.js:50) — the sink is the page body itself, straight from
    the page store with no transformation (raw=True: a payload sink
    must ship the page bytes untouched — canonicalization is a PARSER
    pre-pass, not a storage transform)."""
    return _serp(spark, "amazon", raw=True).select(
        "url", "keyword", F.col("body").alias("html")
    )


# ========================= SERP -> crawl lifecycle (one composed run)


def _lifecycle_oracle_sql(num_pages: int = 3) -> str:
    """Unrolled-CTE twin of pipeline_serp_crawl_lifecycle: the
    3-superstep pagination unroll (collecting ADMITTED organic blocks
    instead of counts) feeds a depth-0/depth-1 crawl unroll over the
    crawl corpus, sharing the pagination CTE structure with
    _pagination_oracle_sql and the resolve/normalize/same-host CASE
    with pipeline_frontier_admission_e2e's twin."""
    from ..sources.corpus import SMOKE as CRAWL_SMOKE, ensure_corpus

    cp = ensure_corpus(CRAWL_SMOKE)["pages"]
    adm = (
        "b -> regexp_extract(b, '<h3>([^<]*)</h3>', 1) <> '' "
        f"AND trim(regexp_extract(b, '{_P_G_ST}', 2)) <> '' "
        "AND regexp_extract(b, '<a href=\"([^\"]*)\"><h3>', 1) <> ''"
    )
    org_esc = _P_G_ORG.replace('"', '\\"')
    next_esc = _P_NEXT_TAG.replace('"', '\\"')
    parts = [
        f"WITH s AS (SELECT url, body FROM {_OP} WHERE engine = 'google'),",
        f"st1 AS (SELECT keyword, url FROM read_parquet('{_SP}') "
        "WHERE engine = 'google' AND page_num = 1),",
    ]
    for r in range(1, num_pages + 1):
        parts.append(
            f"p{r} AS (SELECT st{r}.keyword, s.url, s.body FROM st{r} "
            f"JOIN s ON st{r}.url = s.url),"
        )
        parts.append(
            f"r{r} AS (SELECT keyword, url, "
            "contains(body, 'id=\"recaptcha\"') AS blocked, "
            f"list_filter(regexp_extract_all(body, '{org_esc}'), {adm}) AS blks, "
            f"nullif(replace(regexp_extract(regexp_extract(body, '{next_esc}'), "
            "'href=\\\"([^\\\"]*)\\\"', 1), '&amp;', '&'), '') "
            f"AS next_href FROM p{r}),"
        )
        if r < num_pages:
            parts.append(
                f"st{r + 1} AS (SELECT keyword, coalesce(next_href, url) AS url "
                f"FROM r{r} WHERE NOT blocked),"
            )
    blk_union = " UNION ALL ".join(
        f"SELECT keyword, unnest(blks) AS blk FROM r{r} WHERE NOT blocked"
        for r in range(1, num_pages + 1)
    )
    parts.append(f"lb AS ({blk_union}),")
    parts.append(
        "links AS (SELECT DISTINCT keyword, "
        "replace(regexp_extract(blk, '<a href=\"([^\"]*)\"><h3>', 1), "
        "'&amp;', '&') AS link FROM lb),"
    )
    parts.append(
        f"pages AS (SELECT url, status, out_links FROM read_parquet('{cp}')),"
    )
    parts.append(
        "seeds AS (SELECT keyword, replace(link, '#', '') AS seed FROM links),"
    )
    parts.append(
        "d0 AS (SELECT se.keyword, se.seed, 0 AS depth, se.seed AS url, "
        "coalesce(pg.status, 'miss') AS status "
        "FROM seeds se LEFT JOIN pages pg ON se.seed = pg.url),"
    )
    parts.append(
        # unnest runs over the bare pages scan (no join in the same
        # SELECT): DuckDB's binder hits an internal error when a
        # predicate is pushed down into an unnest-over-join CTE
        "pout AS (SELECT url AS purl, trim(unnest(out_links)) AS l "
        "FROM pages WHERE status = 'ok'),"
        "out0 AS (SELECT se.keyword, se.seed, p.l "
        "FROM seeds se JOIN pout p ON se.seed = p.purl),"
    )
    parts.append(
        "res AS (SELECT keyword, seed, "
        "CASE WHEN trim(l) = '' THEN NULL "
        "WHEN regexp_matches(trim(l), '^https?://.+') THEN trim(l) "
        "WHEN substr(trim(l), 1, 1) = '/' "
        "THEN regexp_extract(seed, '^(https?://[^/]+)', 1) || trim(l) "
        "ELSE NULL END AS resolved FROM out0),"
    )
    parts.append(
        "adm1 AS (SELECT DISTINCT keyword, seed, "
        "replace(resolved, '#', '') AS target FROM res "
        "WHERE resolved IS NOT NULL "
        "AND regexp_extract(replace(resolved, '#', ''), '^https?://([^/]+)', 1) "
        "= regexp_extract(seed, '^https?://([^/]+)', 1) "
        "AND replace(resolved, '#', '') <> seed),"
    )
    parts.append(
        "d1 AS (SELECT a.keyword, a.seed, 1 AS depth, a.target AS url, "
        "coalesce(pg.status, 'miss') AS status "
        "FROM adm1 a LEFT JOIN pages pg ON a.target = pg.url)"
    )
    tail = (
        "SELECT keyword, seed, CAST(depth AS INT) AS depth, url, status FROM d0 "
        "UNION ALL "
        "SELECT keyword, seed, CAST(depth AS INT) AS depth, url, status FROM d1"
    )
    return "\n".join(parts) + "\n" + tail


@register("pipeline_serp_crawl_lifecycle", _lifecycle_oracle_sql(3))
def pipeline_serp_crawl_lifecycle(spark, sf):
    """THE composed lifecycle: keyword -> 3-page SERP pagination
    (google_scraper.js:43-94: #pnnext advance, recaptcha abort) ->
    admitted organic links (:203-206) -> those links SEED a bounded
    link-depth crawl over the crawl corpus with social.js's frontier
    semantics (resolve vs seed origin :109, '#'-removal normalize
    :121-123, same-host gate :115-119, per-crawl seen set :127).
    Output: one audit row per (keyword, seed, depth, url) with the
    fetch status ('miss' = the frontier pointed outside the page
    store). Exercises SURVEY §3.2 feeding §3.3 as ONE run — the m==0
    organic variant's links land inside the crawl corpus URL space by
    construction (sources/serp_corpus.py), so depth 0 fetches succeed
    and depth 1 expands real out_links.

    Scale shape: pagination state is a per-keyword broadcast dim
    (keywords << pages) joined against the page store 3x; link
    collection is map-side regexp + one distinct exchange; the crawl
    legs are two hash joins on url (the engine's hot seen-set shape)
    carrying (keyword, seed, url) only — bodies never leave the scan.
    At 10^10 pages the depth unroll becomes CrawlEngine's superstep
    loop (plans/loop.py) with the SERP-link seed table MERGEd into the
    frontier; this composed query is its auditable 2-depth twin."""
    from ..functions.urls import normalize_col, resolve_col
    from ..sources.corpus import SMOKE as CRAWL_SMOKE, ensure_corpus

    cp = ensure_corpus(CRAWL_SMOKE)["pages"]
    adm = (
        lambda b: (F.regexp_extract(b, "<h3>([^<]*)</h3>", 1) != "")
        & (F.trim(F.regexp_extract(b, _P_G_ST, 2)) != "")
        & (F.regexp_extract(b, '<a href="([^"]*)"><h3>', 1) != "")
    )
    store = _serp(spark, "google").select("url", "body")
    state = _serp(spark, "google", raw=True).where(F.col("page_num") == 1).select(
        "keyword", "url"
    )
    collected = []
    for _page in range(1, 4):
        fetched = store.join(F.broadcast(state), "url", "inner")
        parsed = fetched.select(
            "keyword",
            "url",
            F.col("body").contains('id="recaptcha"').alias("blocked"),
            F.filter(
                F.regexp_extract_all(F.col("body"), F.lit(_P_G_ORG), 0), adm
            ).alias("blks"),
            F.nullif(
                _adec(
                    F.regexp_extract(
                        F.regexp_extract("body", _P_NEXT_TAG, 0), 'href="([^"]*)"', 1
                    )
                ),
                F.lit(""),
            ).alias("next_href"),
        ).localCheckpoint(eager=True)
        collected.append(
            parsed.where(~F.col("blocked")).select(
                "keyword", F.explode("blks").alias("blk")
            )
        )
        state = parsed.where(~F.col("blocked")).select(
            "keyword", F.coalesce("next_href", "url").alias("url")
        )
    lb = collected[0]
    for c in collected[1:]:
        lb = lb.unionByName(c)
    links = lb.select(
        "keyword",
        _adec(F.regexp_extract("blk", '<a href="([^"]*)"><h3>', 1)).alias("link"),
    ).distinct()
    seeds = links.select("keyword", normalize_col(F.col("link")).alias("seed"))
    pages = spark.read.parquet(cp).select("url", "status", "out_links")
    pstat = pages.select(F.col("url").alias("pu"), F.col("status").alias("pstatus"))
    d0 = seeds.join(pstat, seeds.seed == pstat.pu, "left").select(
        "keyword",
        "seed",
        F.lit(0).cast("int").alias("depth"),
        F.col("seed").alias("url"),
        F.coalesce("pstatus", F.lit("miss")).alias("status"),
    )
    out0 = (
        seeds.join(
            pages.where(F.col("status") == "ok").select(
                F.col("url").alias("pu"), "out_links"
            ),
            seeds.seed == F.col("pu"),
            "inner",
        )
        .select("keyword", "seed", F.explode("out_links").alias("l"))
    )
    origin = F.regexp_extract("seed", "^(https?://[^/]+)", 1)
    resolved = normalize_col(resolve_col(F.col("l"), origin))
    host = lambda c: F.regexp_extract(c, "^https?://([^/]+)", 1)  # noqa: E731
    adm1 = (
        out0.select("keyword", "seed", resolved.alias("target"))
        .where(
            F.col("target").isNotNull()
            & (host(F.col("target")) == host(F.col("seed")))
            & (F.col("target") != F.col("seed"))
        )
        .distinct()
    )
    d1 = adm1.join(pstat, adm1.target == pstat.pu, "left").select(
        "keyword",
        "seed",
        F.lit(1).cast("int").alias("depth"),
        F.col("target").alias("url"),
        F.coalesce("pstatus", F.lit("miss")).alias("status"),
    )
    return d0.unionByName(d1)
