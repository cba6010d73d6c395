"""Pin the §1.4.4 per-extractor conventions on the payload-driven
proj_* queries: pre- vs post-filter position counters, error-string
fallbacks, the reverse-image fallback chain's type labels, and the
parseFloat prefix quirk. The generic oracle equivalence is covered by
test_queries_contract; these assertions pin the SEMANTICS so a
regression that changed both sides identically would still fail."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"  # ignored by serp queries (corpus-backed)


@pytest.fixture(scope="module")
def registry():
    from scrapeulous_spark.operators import load_all_catalogs

    return load_all_catalogs()


def _run(registry, spark, name):
    return registry[name].spark(spark, SF).toPandas()


def test_google_organic_prefilter_positions_keep_gaps(registry, spark):
    """google position = DOM index + 1 assigned BEFORE admission
    (google_scraper.js:144-145, :203-206): dropped blocks leave gaps."""
    df = _run(registry, spark, "proj_google_organic")
    per_url = df.groupby("url")["position"].apply(list)
    assert any(
        sorted(p) != list(range(1, len(p) + 1)) for p in per_url
    ), "expected at least one page with position gaps from dropped blocks"
    # never duplicated within a page
    assert all(len(set(p)) == len(p) for p in per_url)


def test_bing_organic_postfilter_positions_dense(registry, spark):
    """bing position assigned on admission (bing_scraper.js:148-150):
    always exactly 1..n per page."""
    df = _run(registry, spark, "proj_bing_organic")
    for _url, p in df.groupby("url")["position"]:
        assert sorted(p) == list(range(1, len(p) + 1))


def test_ads_error_string_fallbacks(registry, spark):
    from scrapeulous_spark.operators.catalog_serp import (
        ERR_AD_DESC,
        ERR_AD_TITLE,
        ERR_AD_TRACKING,
    )

    g = _run(registry, spark, "proj_google_ads")
    assert (g["title"] == ERR_AD_TITLE).any()
    assert (g["description"] == ERR_AD_DESC).any()
    assert g["title"].notna().all()  # fallback means never-null
    b = _run(registry, spark, "proj_bing_ads")
    assert (b["tracking_link"] == ERR_AD_TRACKING).any()
    assert b["description"].notna().all()


def test_ads_shared_position_counter_spans_blocks(registry, spark):
    """top+bottom ads share one counter (google_scraper.js:215-259)."""
    g = _run(registry, spark, "proj_google_ads")
    pages = g.groupby("url")
    both = [u for u, d in pages if set(d["block_position"]) == {"top", "bottom"}]
    assert both, "corpus must contain a page with top AND bottom ads"
    for u in both:
        d = g[g["url"] == u].sort_values("position")
        assert list(d["position"]) == list(range(1, len(d) + 1))
        # all top positions precede all bottom positions (document order)
        tops = d[d["block_position"] == "top"]["position"]
        bots = d[d["block_position"] == "bottom"]["position"]
        assert tops.max() < bots.min()


def test_rev_image_fallback_chain_types(registry, spark):
    """All three type labels are produced, with google's 0-based rank
    (reverse_image_google_final.js:134) vs bing's 1-based (:60)."""
    g = _run(registry, spark, "proj_rev_image_meta")
    assert {"normal", "data-iurl", "dataimage"} <= set(g["type"])
    assert g["rank"].min() == 0
    # dataimage rows fell through BOTH param and data-iurl levels
    di = g[g["type"] == "dataimage"]
    assert (di["imgurl"].str.startswith("data:")).all()
    b = _run(registry, spark, "proj_bing_rev_image")
    assert b["rank"].min() == 1
    # decodeURIComponent applied: no %2F survives in decoded urls
    assert not b["imgurl"].dropna().str.contains("%2F").any()
    assert b["imgurl"].dropna().str.contains("://").all()


def test_parsefloat_prefix_quirk(registry, spark):
    """parseFloat(['4,1']) === 4 (bing_scraper.js:214-221): comma
    ratings truncate to the integer prefix, dot ratings keep decimals."""
    b = _run(registry, spark, "proj_bing_ads")
    rated = b["rating"].dropna()
    assert len(rated) > 0
    assert ((rated == rated.astype(int)) | (rated % 1 != 0)).all()
    assert (rated == rated.astype(int)).any(), "comma variant truncates"
    assert (rated % 1 != 0).any(), "dot variant keeps decimals"
    # google places uses replace(',','.') -> full value (js:344-352)
    p = _run(registry, spark, "proj_google_places")
    with_r1 = p[p["reviews"].notna()]
    assert (with_r1["rating"] % 1 != 0).any()


def test_places_rating_defaults_zero(registry, spark):
    """google place rating initialized 0.0 and kept when the details
    row is missing (google_scraper.js:335)."""
    p = _run(registry, spark, "proj_google_places")
    no_r1 = p[p["place_type"].isna()]
    assert len(no_r1) > 0
    assert (no_r1["rating"] == 0.0).all()


def test_shopping_admission_leaves_position_gaps(registry, spark):
    """bing shopping position is pre-filter ++position; units without a
    price are dropped but consume a position (bing_scraper.js:268-271,
    :356-358)."""
    s = _run(registry, spark, "proj_bing_shopping")
    assert s["price"].notna().all()
    per_url = s.groupby("url")["position"].apply(list)
    assert any(sorted(p) != list(range(1, len(p) + 1)) for p in per_url)


def test_serp_corpus_deterministic():
    from scrapeulous_spark.sources.serp_corpus import SMOKE, canon_py, gen_serps

    a = gen_serps(SMOKE)
    b = gen_serps(SMOKE)
    assert a.equals(b)
    assert a.column("body").null_count == 0
    # v2 bodies carry newlines BETWEEN tags; canonicalization restores
    # single-line parse input (the '.'-pattern safety invariant)
    bodies = a.column("body").to_pylist()
    assert all("\n" not in canon_py(s) for s in bodies)


# ------------------------------------------------- markup variance (v2)


def _v2_bodies():
    from scrapeulous_spark.sources.serp_corpus import SMOKE, gen_serps

    return gen_serps(SMOKE).column("body").to_pylist()


def test_variance_junction_whitespace_present():
    """W class: the corpus actually stresses whitespace-only text
    nodes — spaces, tabs AND newlines between adjacent tags."""
    import re

    joined = "\n".join(_v2_bodies())
    assert re.search(r">\n+ *<", joined), "newline junctions missing"
    assert re.search(r"> +<", joined), "space junctions missing"
    assert re.search(r">\t<", joined), "tab junctions missing"


def test_variance_attr_order_present():
    """A class: multi-attribute tags appear in permuted order (href
    before the distinguishing class, data-asin before class, ...)."""
    import re

    joined = "\n".join(_v2_bodies())
    assert re.search(r'<a href="[^"]*" class="fl">', joined), "fl permutation"
    assert re.search(r'<a href="[^"]*" data-rw=', joined), "data-rw permutation"
    assert re.search(r'<input value="[^"]*" name="q">', joined), "input permutation"
    assert re.search(r'<div data-asin="[^"]*" class="s-result-item">', joined), (
        "amazon permutation"
    )
    assert re.search(r'<a href="[^"]*" id="pnnext">', joined), "pnnext permutation"


def test_variance_href_entities_present():
    """E class: serialized href values entity-encode '&' as '&amp;'
    (page.content() serializes; the reference reads decoded values via
    getAttribute/el.href) — the #pnnext and imgres hrefs must carry
    encoded separators in the stored markup."""
    import re

    joined = "\n".join(_v2_bodies())
    assert re.search(r'href="[^"]*&amp;[^"]*"', joined), "no encoded hrefs"
    assert re.search(r'href="[^"]*\?q=[^"]*&amp;start=', joined), "pnnext"
    assert re.search(r'href="/imgres\?imgurl=[^"]*&amp;', joined), "imgres"
    # raw '&' never appears inside an href value anymore
    assert not re.search(r'href="[^"]*&(?!amp;)[^"]*"', joined)


def test_variance_inline_tags_present():
    """N class: benign inline formatting tags nest inside innerText-read
    text (google_scraper.js:146 reads innerText, which flattens them)."""
    joined = "\n".join(_v2_bodies())
    for t in ("<em>", "<strong>", "<b>"):
        assert t in joined, f"{t} nesting missing"
    # specifically inside an organic title
    import re

    assert re.search(r"<h3>[^<]*<(?:em|strong|b)>", joined) or re.search(
        r"<h3><b>", joined
    )


def test_markup_variance_invisible_to_extractors():
    """THE robustness gate: every proj_* extractor must return
    IDENTICAL results on the varied (v2) corpus and the unvaried (v1)
    baseline — a silent extraction miss under junction whitespace,
    attribute permutation, or inline-tag nesting fails here. Runs the
    DuckDB twin as the executable spec on both corpora (Spark/DuckDB
    parity is covered separately by test_queries_contract)."""
    import duckdb

    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.operators.catalog_serp import _SP
    from scrapeulous_spark.sources.serp_corpus import SMOKE, ensure_serp_corpus
    from dataclasses import replace

    v1 = ensure_serp_corpus(replace(SMOKE, markup_version=1))
    assert v1 != _SP
    reg = load_all_catalogs()
    con = duckdb.connect()
    names = sorted(n for n in reg if n.startswith("proj_"))
    assert len(names) == 18
    for name in names:
        sql2 = reg[name].oracle
        assert _SP in sql2, name
        sql1 = sql2.replace(_SP, v1)
        r2 = sorted(map(repr, con.execute(sql2).fetchall()))
        r1 = sorted(map(repr, con.execute(sql1).fetchall()))
        assert r2 == r1, f"{name}: variance changed extraction output"
        assert len(r2) > 0, name


def test_href_entity_guard_scoped_to_tags():
    """The non-href '&' asymmetry guard must fire on real attributes
    inside tags but NOT on attribute-shaped substrings in visible text
    content (round-4 ADVICE, serp_corpus.py:128)."""
    import pytest

    from scrapeulous_spark.sources.serp_corpus import encode_href_entities

    # attr-shaped text content with '&' is fine — it is not an attribute
    ok = '<span class="st">the literal text foo="a&amp;b" appears</span>'
    assert encode_href_entities(ok) == ok

    # a real non-href attribute carrying '&' still fails loudly
    with pytest.raises(ValueError, match="data-rw"):
        encode_href_entities('<a data-rw="x&y">t</a>')

    # href values are entity-encoded (the E-class serializer behavior)
    got = encode_href_entities('<a href="https://e.org/?a=1&b=2">t</a>')
    assert 'href="https://e.org/?a=1&amp;b=2"' in got
