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
