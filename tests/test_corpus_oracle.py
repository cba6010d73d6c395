"""Corpus generator determinism + serial-oracle semantics tests."""

import pyarrow.parquet as pq
import pytest

from scrapeulous_spark.functions import urls as U
from scrapeulous_spark.functions.entities import extract_py
from scrapeulous_spark.plans.oracle import load_corpus_for_oracle, run_oracle
from scrapeulous_spark.sources.corpus import SMOKE, ensure_corpus, gen_pages, gen_seeds


@pytest.fixture(scope="module")
def corpus_paths():
    return ensure_corpus(SMOKE)


def test_generator_deterministic():
    a = gen_pages(SMOKE)
    b = gen_pages(SMOKE)
    assert a.equals(b)
    assert gen_seeds(SMOKE, a).equals(gen_seeds(SMOKE, b))


def test_url_twins():
    assert U.host_of("http://h0.example.com/p1") == "h0.example.com"
    assert U.origin_of("https://h1.example.com/p2#x") == "https://h1.example.com"
    assert U.path_of("http://h0.example.com/p1#s2") == "/p1#s2"
    assert U.resolve("/p3", "http://h.com") == "http://h.com/p3"
    assert U.resolve("http://x.com/y", "http://h.com") == "http://x.com/y"
    assert U.resolve("mailto:a@b.c", "http://h.com") is None
    assert U.resolve("", "http://h.com") is None
    # literal '#'-removal, NOT fragment strip (social.js:121-123)
    assert U.normalize("http://h.com/p1#s2") == "http://h.com/p1s2"


def test_entity_regex_exclusions():
    body = (
        "mail a.b@x-y.com https://twitter.com/intent/tweet "
        "https://twitter.com/real_user https://instagram.com/p/XYZ "
        "https://www.instagram.com/gooduser https://facebook.com/share.php?u=1 "
        "https://facebook.com/realpage/ https://github.com/some-dev call (555) 123-4567"
    )
    assert extract_py("email", body) == ["a.b@x-y.com"]
    tw = extract_py("twitter", body)
    assert len(tw) == 1 and "intent" not in tw[0]
    ig = extract_py("instagram", body)
    assert len(ig) == 1 and "/p/" not in ig[0]
    fb = extract_py("facebook", body)
    assert len(fb) == 1 and "share.php" not in fb[0]
    gh = extract_py("github", body)
    assert len(gh) == 1 and gh[0].startswith("https://github.com/some-dev")
    assert "(555) 123-4567" in extract_py("phone", body)


def test_oracle_semantics(corpus_paths):
    pages, seeds, budgets, robots = load_corpus_for_oracle(corpus_paths)
    res = run_oracle(pages, seeds, budgets, robots)

    # every valid seed appears at step 0; invalid seed produces no steps
    valid = [s for s in seeds if s[1].startswith("http")]
    step0 = {(sid, u) for sid, st, u, d in res.crawl_order if st == 0}
    assert step0 == {(sid, u) for sid, u in valid}
    invalid = [s for s in seeds if not s[1].startswith("http")]
    assert all(
        (sid, "invalid_url") in {(e[0], e[1]) for e in res.entities} for sid, _ in invalid
    )

    # depth-1 only; steps contiguous per seed
    by_seed = {}
    for sid, st, u, d in res.crawl_order:
        assert d in (0, 1) and (d == 0) == (st == 0)
        by_seed.setdefault(sid, []).append(st)
    for sid, steps in by_seed.items():
        assert steps == list(range(len(steps)))

    # budget: successful non-seed fetches per seed <= seed-host budget
    for sid, url in valid:
        fetched_ok = [
            u
            for s2, st, u, d in res.crawl_order
            if s2 == sid and d == 1 and pages.get(u, {}).get("status") in ("ok", "partial")
        ]
        assert len(fetched_ok) <= budgets.get(U.host_of(url), 0)

    # same-host gate: every depth-1 url on the seed's host
    for sid, url in valid:
        for s2, st, u, d in res.crawl_order:
            if s2 == sid and d == 1:
                assert U.host_of(u) == U.host_of(url)

    # seen set distinct + normalized
    assert len(res.seen_set) == len(set(res.seen_set))
    assert all("#" not in u for u in res.seen_set)

    # no url visited twice within a seed (frontier dedup)
    for sid in by_seed:
        urls = [u for s2, st, u, d in res.crawl_order if s2 == sid and d == 1]
        assert len(urls) == len(set(urls))

    assert len(res.crawl_order) > len(valid)  # some expansion happened
    kinds = {e[1] for e in res.entities}
    assert {"email", "phone", "twitter", "github", "page_title"} <= kinds


def test_oracle_lifo_order(corpus_paths):
    """Depth-1 visit order is the REVERSE of first-occurrence cleaned-link
    order (LIFO pop, social.js:79)."""
    pages, seeds, budgets, robots = load_corpus_for_oracle(corpus_paths)
    res = run_oracle(pages, seeds, budgets, robots)
    from scrapeulous_spark.plans.oracle import _clean_links

    for sid, seed_url in seeds:
        if not seed_url.startswith("http"):
            continue
        page = pages.get(seed_url)
        if page is None or page["status"] not in ("ok", "partial"):
            continue
        cleaned = _clean_links(
            page["out_links"], U.origin_of(seed_url), U.host_of(seed_url), robots
        )
        visited = [u for s2, st, u, d in res.crawl_order if s2 == sid and d == 1]
        assert visited == list(reversed(cleaned))[: len(visited)]


def test_guarded_spark_extraction_matches_python_twin(spark):
    """extract_entities_raw (with its literal-contains guards) must agree
    with the unguarded Python twin on adversarial bodies: guards prune
    scans, never matches."""
    from pyspark.sql import functions as F

    from scrapeulous_spark.functions.entities import KIND_ORDER, extract_py
    from scrapeulous_spark.operators.extract import extract_entities_raw

    bodies = [
        # literal present but no match (guard passes, regex rejects)
        "mail@ @corp twitter.com-less text + plus fb.com",
        # exclusions right after the literal
        "https://twitter.com/intent/x https://instagram.com/p/A "
        "https://facebook.com/share.php?u=1",
        # matches
        "a.b@x-y.com +49 30 12 345 678 90 (555) 123-4567 "
        "https://twitter.com/u1 https://www.instagram.com/i1 "
        "https://facebook.com/pg/ http://fb.com/z https://github.com/g-1",
        # no literals at all (guard prunes every family but generic phone)
        "lorem ipsum 5551234567 dolor 123 456 7890",
        "",
        # quote branch: the '".+"' alternation CAN span spaces, so these
        # must take the full-body email scan, not the token fast path
        '"a b"@x.com and more',
        'stray " quote then c.d@y.org',
    ]
    df = spark.createDataFrame(
        [(i, 0, b) for i, b in enumerate(bodies)],
        "seed_id long, page_order int, body string",
    )
    got = [
        (r["seed_id"], r["kind"], r["match_pos"], r["value"])
        for r in extract_entities_raw(df)
        .orderBy("seed_id", "kind", "match_pos")
        .collect()
    ]
    want = [
        (i, kind, pos, v)
        for i, b in enumerate(bodies)
        for kind in sorted(KIND_ORDER)
        for pos, v in enumerate(extract_py(kind, b))
    ]
    assert got == sorted(want)
