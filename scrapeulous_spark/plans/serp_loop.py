"""SERP pagination as an engine superstep (SURVEY §3.2 lifecycle).

The reference loops page_num = 1..num_pages per keyword
(serp/google_scraper.js:43-94): parse the current SERP, then click
#pnnext (:631-636). Two behaviors are load-bearing and preserved:

  * if #pnnext is ABSENT, next_page() is a no-op and the loop
    RE-PARSES the same page for every remaining page_num;
  * a recaptcha interstitial pushes ONE {status:'Failed', blocked_ip}
    row and aborts the whole keyword (:52-67) — earlier pages' rows
    are kept, later pages are never visited.

Spark shape: per-keyword state is a DataFrame (keyword, url); each
superstep inner-joins state against the SERP page store on url (state
is the small side — broadcast; the page store streams), derives the
parse row + the next-page URL with JVM regexp only, and the new state
is the non-blocked rows. localCheckpoint() truncates the lineage per
superstep so plan depth stays O(1) in num_pages. No collect() — state
stays distributed (keywords can be millions at scale).

SerialOracle twin: `run_serp_oracle` replays the same loop row-by-row
in pure Python with Python `re` — tests/test_serp_pagination.py
asserts exact result equality at num_pages=3.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the SAME pattern objects the proj_* catalog queries parse with —
# imported, not re-declared, so a selector change there propagates to
# the pagination engine and its unrolled oracle mechanically
from ..operators.catalog_serp import (  # noqa: E402
    _P_G_ORG,
    _P_G_ST,
    _P_IP,
    _P_NEXT_TAG,
    _adec,
    _canon,
)
from ..sources.serp_corpus import canon_py  # noqa: E402


def _adec_py(v: str) -> str:
    """Python twin of catalog_serp._adec (attribute entity decode —
    getAttribute/el.href return decoded values)."""
    return v.replace("&amp;", "&")


def _n_admitted(body):
    """Count of admitted organic results on the page — title && snippet
    && link (google_scraper.js:203-206)."""
    blocks = F.regexp_extract_all(body, F.lit(_P_G_ORG), 0)
    adm = F.filter(
        blocks,
        lambda b: (F.regexp_extract(b, "<h3>([^<]*)</h3>", 1) != "")
        & (F.trim(F.regexp_extract(b, _P_G_ST, 2)) != "")
        & (F.regexp_extract(b, '<a href="([^"]*)"><h3>', 1) != ""),
    )
    return F.size(adm)


class SerpPaginationEngine:
    """num_pages-bounded pagination superstep over a SERP page store."""

    def __init__(self, spark: SparkSession, serp_path: str, num_pages: int = 3):
        self.spark = spark
        self.serp_path = serp_path
        self.num_pages = num_pages

    def _store(self) -> DataFrame:
        return (
            self.spark.read.parquet(self.serp_path)
            .where(F.col("engine") == "google")
            .select("url", "keyword", "page_num", _canon(F.col("body")).alias("body"))
        )

    def seeds(self) -> DataFrame:
        """(keyword, url): each keyword's page-1 SERP — the state after
        direct_search(keyword) (google_scraper.js:45-51)."""
        return self._store().where(F.col("page_num") == 1).select("keyword", "url")

    def run(self, seeds: DataFrame | None = None) -> DataFrame:
        store = self._store().select("url", "body")
        state = (seeds or self.seeds()).localCheckpoint(eager=True)
        out: list[DataFrame] = []
        for page_num in range(1, self.num_pages + 1):
            fetched = store.join(F.broadcast(state), "url", "inner")
            parsed = fetched.select(
                "keyword",
                F.lit(page_num).alias("page_num"),
                "url",
                F.col("body").contains('id="recaptcha"').alias("blocked"),
                F.when(
                    F.col("body").contains('id="recaptcha"'),
                    F.trim(F.regexp_extract("body", _P_IP, 1)),
                ).alias("blocked_ip"),
                F.when(
                    ~F.col("body").contains('id="recaptcha"'), _n_admitted(F.col("body"))
                ).alias("n_organic"),
                F.nullif(
                    _adec(
                        F.regexp_extract(
                            F.regexp_extract("body", _P_NEXT_TAG, 0),
                            'href="([^"]*)"',
                            1,
                        )
                    ),
                    F.lit(""),
                ).alias("next_href"),
            ).localCheckpoint(eager=True)
            out.append(
                parsed.select(
                    "keyword",
                    "page_num",
                    "url",
                    F.when(F.col("blocked"), F.lit("Failed"))
                    .otherwise(F.lit("ok"))
                    .alias("status"),
                    "blocked_ip",
                    "n_organic",
                )
            )
            if page_num < self.num_pages:
                state = (
                    parsed.where(~F.col("blocked"))
                    .select(
                        "keyword",
                        F.coalesce("next_href", "url").alias("url"),
                    )
                    .localCheckpoint(eager=True)
                )
        res = out[0]
        for df in out[1:]:
            res = res.unionByName(df)
        return res


# ------------------------------------------------------ serial oracle


def run_serp_oracle(rows: list[dict], num_pages: int = 3) -> list[tuple]:
    """Pure-Python replay of google_scraper.js:43-94 over the same
    corpus rows [{url, engine, keyword, page_num, body}]. Returns
    sorted (keyword, page_num, url, status, blocked_ip, n_organic)."""
    body_by_url = {
        r["url"]: canon_py(r["body"]) for r in rows if r["engine"] == "google"
    }
    seeds = sorted(
        (r["keyword"], r["url"])
        for r in rows
        if r["engine"] == "google" and r["page_num"] == 1
    )
    org_re = re.compile(_P_G_ORG)
    st_re = re.compile(_P_G_ST)
    out = []
    for kw, url in seeds:
        cur = url
        for page_num in range(1, num_pages + 1):
            body = body_by_url[cur]
            if 'id="recaptcha"' in body:
                m = re.search(_P_IP, body)
                ip = m.group(1).strip() if m else None
                out.append((kw, page_num, cur, "Failed", ip, None))
                break  # early return of the whole keyword (js:52-67)
            n = 0
            for blk in org_re.findall(body):
                tm = re.search("<h3>([^<]*)</h3>", blk)
                lm = re.search('<a href="([^"]*)"><h3>', blk)
                sm = st_re.search(blk)
                title = tm.group(1) if tm else ""
                link = lm.group(1) if lm else ""
                snippet = (sm.group(2) if sm else "").strip()
                if title and snippet and link:
                    n += 1
            out.append((kw, page_num, cur, "ok", None, n))
            nm = re.search(_P_NEXT_TAG, body)
            nh = re.search('href="([^"]*)"', nm.group(0)) if nm else None
            if nh and nh.group(1):
                cur = _adec_py(nh.group(1))  # no-match: re-parse (js:631-636)
    return sorted(out)
