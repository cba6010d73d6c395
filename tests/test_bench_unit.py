"""Spark-free unit tests for the bench helpers and serp-corpus codecs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_idlest_cores_counts_and_membership():
    import bench

    allowed = os.sched_getaffinity(0)
    for n in (1, 4):
        cores = bench._idlest_cores(n)
        assert len(cores) == min(n, len(allowed))
        assert cores <= allowed


def test_url_encode_fixed_roundtrip():
    """The decode chain the proj_rev_image queries apply (%20/%2F/%3A/
    %25 replaces, in that order) must invert url_encode_fixed exactly —
    including the %-escape-of-% ordering trap."""
    from scrapeulous_spark.sources.serp_corpus import url_encode_fixed

    def decode(s: str) -> str:
        for esc, ch in (("%20", " "), ("%2F", "/"), ("%3A", ":"), ("%25", "%")):
            s = s.replace(esc, ch)
        return s

    for raw in [
        "https://pics.example.org/full 0_0.jpg",
        "plain",
        "a%b",             # literal % must survive the round trip
        "100% of /x: y",
        "%20",             # pre-escaped text is DATA, not an escape
    ]:
        assert decode(url_encode_fixed(raw)) == raw


def test_pagination_oracle_sql_unrolls_n_steps():
    from scrapeulous_spark.operators.catalog_serp import _pagination_oracle_sql

    for n in (1, 2, 3, 5):
        sql = _pagination_oracle_sql(n)
        assert f"r{n} " in sql or f"r{n}\n" in sql or f"FROM r{n}" in sql
        assert f"st{n + 1}" not in sql  # no state CTE past the last step
        assert sql.count("UNION ALL") == n - 1
