"""Semantics pins for the decontamination / span-dedup operators
(pipeline.py decon section) beyond the DuckDB comparator: recompute
every flag and count in plain Python from the parquet, so a twin-SQL
bug shared by both engines cannot hide."""

import re
from collections import Counter

import pytest

SF = "/root/testdata/sf0.001"
N = 3  # _DECON_N
EVAL_MOD = 97
BOILER_MIN = 3


@pytest.fixture(scope="module")
def registry():
    from scrapeulous_spark.operators import load_all_catalogs

    return load_all_catalogs()


def _grams(text: str) -> set:
    toks = re.split(r"\s+", text.strip())
    return {" ".join(toks[i : i + N]) for i in range(len(toks) - N + 1)}


@pytest.fixture(scope="module")
def docs(spark):
    return {
        r.doc_id: _grams(r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def test_decon_overlap_recomputed(spark, registry, docs):
    eval_grams = set().union(
        *(g for d, g in docs.items() if d % EVAL_MOD == 0)
    )
    rows = registry["decon_ngram_overlap"].spark(spark, SF).collect()
    train = {d for d in docs if d % EVAL_MOD != 0}
    assert {r.doc_id for r in rows} == train
    hit_any = False
    for r in rows:
        g = docs[r.doc_id]
        hits = len(g & eval_grams)
        assert (r.n_grams, r.n_eval_hits, r.contaminated) == (
            len(g),
            hits,
            hits > 0,
        ), r.doc_id
        hit_any = hit_any or hits > 0
    # the gate must actually split rows on this corpus, or the oracle
    # comparison only ever verifies zeros
    assert hit_any
    assert any(not r.contaminated for r in rows)


def test_boilerplate_spans_recomputed(spark, registry, docs):
    counts = Counter(g for gs in docs.values() for g in gs)
    expect = {g: c for g, c in counts.items() if c >= BOILER_MIN}
    got = {
        r.gram: r.n_docs
        for r in registry["decon_boilerplate_spans"].spark(spark, SF).collect()
    }
    assert got == expect
    assert expect  # non-degenerate on this corpus


def test_span_ratio_recomputed(spark, registry, docs):
    counts = Counter(g for gs in docs.values() for g in gs)
    boiler = {g for g, c in counts.items() if c >= BOILER_MIN}
    rows = registry["decon_span_ratio"].spark(spark, SF).collect()
    assert {r.doc_id for r in rows} == set(docs)
    for r in rows:
        g = docs[r.doc_id]
        want = 0 if not g else int(1000 * len(g & boiler) / len(g))
        assert r.dup_ratio_x1000 == want, r.doc_id


def test_short_doc_gram_guard(spark):
    """Docs shorter than N tokens must yield an EMPTY shingle list —
    Spark's sequence(1, k) silently produces a DESCENDING array when
    k < 1, which would fabricate negative-index slices."""
    from scrapeulous_spark.operators.pipeline import _DECON_N, _decon_grams

    assert _DECON_N == N
    df = spark.createDataFrame(
        [(1, "one two"), (2, "a b c"), (3, "   x   ")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_short_docs")
    import scrapeulous_spark.operators.pipeline as P
    from pyspark.sql import functions as F

    orig = P.T
    try:
        P.T = lambda spark, sf, name: df
        got = {r.doc_id: r.gs for r in _decon_grams(spark, SF).collect()}
    finally:
        P.T = orig
    assert got[1] == [] and got[3] == []
    assert got[2] == ["a b c"]
