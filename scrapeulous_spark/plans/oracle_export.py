"""Materialize the serial oracle's crawl results as parquet so DuckDB
can serve them as driver-checkable twins for the engine-native queries.

The serial oracle (plans/oracle.py) is an independent from-scratch
replay of the reference's crawl semantics (social.js:34-98) in plain
Python — no Spark, no shared dataflow code. tests/test_engine_vs_oracle
asserts engine == oracle exactly; exporting the oracle's output lets
the DRIVER make the same comparison as a rows+schema+hash check
(`SELECT ... FROM read_parquet(<oracle output>)`), upgrading
loop_frontier_dfs / dedup_url_seen_engine / udaf_social_extract from
rows-only to fully hash-verified.

fetch_ok is recomputed here from the page store (the oracle's
crawl_order carries (seed_id, step, url, depth); the engine adds
fetch_ok = status in OK_STATUSES from the same fetch join,
operators/fetch.py) — a pure lookup, not crawl logic.

Cached per corpus tag next to the corpus cache; generation is a few
hundred ms at SMOKE scale.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from .oracle import OK_STATUSES, load_corpus_for_oracle, run_oracle
from ..sources.corpus import CorpusParams, default_cache_dir, ensure_corpus


def ensure_oracle_parquet(p: CorpusParams) -> dict[str, str]:
    paths = ensure_corpus(p)
    out_dir = os.path.join(os.path.dirname(default_cache_dir(p)), f"{p.tag}_oracle")
    os.makedirs(out_dir, exist_ok=True)
    out = {
        name: os.path.join(out_dir, f"{name}.parquet")
        for name in ("crawl_order", "seen", "entities")
    }
    marker = os.path.join(out_dir, ".done")
    if os.path.exists(marker):
        return out

    pages, seeds, budgets, robots = load_corpus_for_oracle(paths)
    res = run_oracle(pages, seeds, budgets, robots)

    def fetch_ok(url: str) -> bool:
        pg = pages.get(url)
        return pg is not None and pg["status"] in OK_STATUSES

    co = sorted(res.crawl_order)
    pq.write_table(
        pa.table(
            {
                "seed_id": pa.array([r[0] for r in co], pa.int64()),
                "step": pa.array([r[1] for r in co], pa.int64()),
                "url": pa.array([r[2] for r in co], pa.string()),
                "depth": pa.array([r[3] for r in co], pa.int32()),
                "fetch_ok": pa.array([fetch_ok(r[2]) for r in co], pa.bool_()),
            }
        ),
        out["crawl_order"],
    )
    pq.write_table(
        pa.table({"url": pa.array(sorted(res.seen_set), pa.string())}), out["seen"]
    )
    ents = sorted(res.entities)
    pq.write_table(
        pa.table(
            {
                "seed_id": pa.array([r[0] for r in ents], pa.int64()),
                "kind": pa.array([r[1] for r in ents], pa.string()),
                "ord": pa.array([r[2] for r in ents], pa.int32()),
                "value": pa.array([r[3] for r in ents], pa.string()),
            }
        ),
        out["entities"],
    )
    with open(marker, "w") as f:
        f.write(p.tag)
    return out
