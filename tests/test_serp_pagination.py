"""SerpPaginationEngine vs the serial oracle: exact result-set match
at num_pages=3 (verdict item: engine-level SERP pagination), plus the
two reference quirks — blocked early-exit and missing-#pnnext
re-parse (google_scraper.js:43-94, :631-636)."""

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrapeulous_spark.plans.serp_loop import SerpPaginationEngine, run_serp_oracle
from scrapeulous_spark.sources.serp_corpus import SMOKE, ensure_serp_corpus


@pytest.fixture(scope="module")
def serp_path():
    return ensure_serp_corpus(SMOKE)


@pytest.fixture(scope="module")
def corpus_rows(serp_path):
    return pq.read_table(serp_path).to_pylist()


def _engine_rows(spark, serp_path, num_pages):
    df = SerpPaginationEngine(spark, serp_path, num_pages=num_pages).run()
    return sorted(
        (r.keyword, r.page_num, r.url, r.status, r.blocked_ip, r.n_organic)
        for r in df.collect()
    )


@pytest.mark.parametrize("num_pages", [1, 3])
def test_engine_matches_serial_oracle(spark, serp_path, corpus_rows, num_pages):
    assert _engine_rows(spark, serp_path, num_pages) == run_serp_oracle(
        corpus_rows, num_pages
    )


def test_blocked_keyword_exits_early(spark, serp_path, corpus_rows):
    rows = run_serp_oracle(corpus_rows, 3)
    failed = [r for r in rows if r[3] == "Failed"]
    assert failed, "corpus must contain a recaptcha page"
    for kw, page_num, _u, _s, ip, n in failed:
        assert ip and n is None
        later = [r for r in rows if r[0] == kw and r[1] > page_num]
        assert later == [], "no pages after the Failed row"
        earlier = [r for r in rows if r[0] == kw and r[1] < page_num]
        assert all(r[3] == "ok" for r in earlier)


def test_missing_pnnext_reparses_same_page(spark, serp_path, corpus_rows):
    rows = run_serp_oracle(corpus_rows, 3)
    by_kw = {}
    for r in rows:
        by_kw.setdefault(r[0], []).append(r)
    stuck = [
        kw
        for kw, rs in by_kw.items()
        if len(rs) == 3 and len({r[2] for r in rs}) == 1
    ]
    assert stuck, "corpus must contain a page-1-without-#pnnext keyword"
    advancing = [kw for kw, rs in by_kw.items() if len({r[2] for r in rs}) == 3]
    assert advancing, "most keywords advance through distinct pages"


def test_serp_crawl_lifecycle_matches_python_replay(spark, corpus_rows):
    """Independent plain-Python replay of the composed lifecycle
    (pagination -> admitted organic links -> 2-depth same-host crawl):
    exact row-set match against pipeline_serp_crawl_lifecycle. Own
    regex walk, own resolve/normalize, own seen logic — shared only
    with the reference semantics, not with the Spark plan."""
    import re

    from scrapeulous_spark.functions.urls import normalize, resolve
    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.operators.catalog_serp import (
        _P_G_ORG,
        _P_G_ST,
        _P_NEXT_TAG,
    )
    from scrapeulous_spark.sources.corpus import SMOKE as CRAWL_SMOKE, ensure_corpus
    from scrapeulous_spark.sources.serp_corpus import canon_py

    body_by_url = {
        r["url"]: canon_py(r["body"]) for r in corpus_rows if r["engine"] == "google"
    }
    seeds_serp = sorted(
        (r["keyword"], r["url"])
        for r in corpus_rows
        if r["engine"] == "google" and r["page_num"] == 1
    )
    org_re = re.compile(_P_G_ORG)
    st_re = re.compile(_P_G_ST)
    links = set()
    for kw, url in seeds_serp:
        cur = url
        for _page in range(3):
            body = body_by_url[cur]
            if 'id="recaptcha"' in body:
                break
            for blk in org_re.findall(body):
                tm = re.search("<h3>([^<]*)</h3>", blk)
                lm = re.search('<a href="([^"]*)"><h3>', blk)
                sm = st_re.search(blk)
                if (
                    tm and tm.group(1)
                    and lm and lm.group(1)
                    and sm and sm.group(2).strip()
                ):
                    links.add((kw, lm.group(1).replace("&amp;", "&")))
            nm = re.search(_P_NEXT_TAG, body)
            nh = re.search('href="([^"]*)"', nm.group(0)) if nm else None
            if nh and nh.group(1):
                cur = nh.group(1).replace("&amp;", "&")
    pages = {
        r["url"]: r
        for r in pq.read_table(
            ensure_corpus(CRAWL_SMOKE)["pages"], columns=["url", "status", "out_links"]
        ).to_pylist()
    }
    expected = set()
    for kw, link in links:
        seed = normalize(link)
        pg = pages.get(seed)
        expected.add((kw, seed, 0, seed, pg["status"] if pg else "miss"))
        if pg is None or pg["status"] != "ok":
            continue
        host = seed.split("://", 1)[1].split("/", 1)[0]
        origin = seed.split("://", 1)[0] + "://" + host
        for raw in pg["out_links"]:
            res = resolve(raw, origin)
            if res is None:
                continue
            tgt = normalize(res)
            thost = tgt.split("://", 1)[1].split("/", 1)[0] if "://" in tgt else ""
            if thost != host or tgt == seed:
                continue
            tp = pages.get(tgt)
            expected.add((kw, seed, 1, tgt, tp["status"] if tp else "miss"))
    q = load_all_catalogs()["pipeline_serp_crawl_lifecycle"]
    got = {
        (r.keyword, r.seed, r.depth, r.url, r.status)
        for r in q.spark(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == expected
    assert any(d == 1 and s == "ok" for (_k, _s, d, _u, s) in got), (
        "lifecycle must actually expand depth-1 links inside the page store"
    )
