"""Simulate the driver's correctness pass: first N names from
__spark_entry__.queries() (the data-driven stalest-first ordering),
each run on Spark AND its oracle_sql() twin in DuckDB at sf0.01,
compared rows/columns/values the same way tools/check_queries.py does.

    python tools/driver_sim.py [--n 50] [--sf /root/testdata/sf0.01]

This is the round-5 pre-flight: the driver's 50 slots must re-green
the 24 r1-era entries and the two rewritten dedup ops
(dedup_ngram_jaccard, dedup_ppjoin_prefix) — run this BEFORE the
driver does to catch any regression locally.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def canon(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        "|".join(canon_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def main():
    args = sys.argv[1:]
    n = int(args[args.index("--n") + 1]) if "--n" in args else 50
    sf_dir = args[args.index("--sf") + 1] if "--sf" in args else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from scrapeulous_spark.session import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = list(qs)[:n]

    spark = get_spark(cpus=8, shuffle_partitions=8, app_name="driver_sim")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failed, passed, rows_only = [], [], []
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {str(e)[:300]}"))
            print(f"[{i}/{len(names)}] FAIL {name} (spark error)", flush=True)
            continue
        if name not in oracles:
            rows_only.append((name, len(sdf)))
            print(f"[{i}/{len(names)}] ROWS-ONLY {name} ({len(sdf)})", flush=True)
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failed.append((name, f"duckdb error: {str(e)[:300]}"))
            print(f"[{i}/{len(names)}] FAIL {name} (duckdb error)", flush=True)
            continue
        scols, srows = canon(sdf)
        dcols, drows = canon(ddf)
        if scols != dcols:
            failed.append((name, f"columns differ: spark={scols} duck={dcols}"))
            verdict = "FAIL cols"
        elif len(srows) != len(drows):
            failed.append((name, f"row count: spark={len(srows)} duck={len(drows)}"))
            verdict = "FAIL rows"
        elif srows != drows:
            d = next((j, a, b) for j, (a, b) in enumerate(zip(srows, drows)) if a != b)
            failed.append(
                (name,
                 f"values differ at sorted-row {d[0]}:\n"
                 f"  spark={d[1][:200]}\n  duck ={d[2][:200]}")
            )
            verdict = "FAIL vals"
        else:
            passed.append((name, len(srows)))
            verdict = "PASS"
        print(
            f"[{i}/{len(names)}] {verdict} {name} "
            f"({len(sdf)} rows, {time.monotonic() - t0:.1f}s)",
            flush=True,
        )

    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, {len(failed)} fail")
    for name, msg in failed:
        print(f"FAIL  {name}: {msg}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
