"""Local driver-style correctness check: run every catalog query on
Spark AND its DuckDB oracle, compare row count / column names /
order-insensitive values. Usage:

    python tools/check_queries.py [--time] [sf_dir] [name ...]

--time prints per-query Spark/DuckDB wall seconds (slowest first) and
the totals — the budget view of what the driver's correctness pass
costs.
"""

from __future__ import annotations

import math
import os
import sys

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
    import time

    argv = [a for a in sys.argv[1:] if a != "--time"]
    timing = "--time" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from scrapeulous_spark.operators import load_all_catalogs
    from scrapeulous_spark.session import get_spark

    REGISTRY = load_all_catalogs()

    spark = get_spark(cpus=8, shuffle_partitions=8, app_name="check_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failed, passed, rows_only = [], [], []
    times: dict[str, tuple[float, float]] = {}
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append((name, f"spark error: {str(e)[:300]}"))
            continue
        t1 = time.monotonic()
        # record the spark wall even when the oracle side errors below
        # — the budget view must not lose exactly the expensive
        # entries being debugged
        times[name] = (t1 - t0, 0.0)
        if q.oracle is None:
            rows_only.append((name, len(sdf)))
            continue
        try:
            ddf = con.sql(q.oracle).df()
        except Exception as e:
            failed.append((name, f"duckdb error: {str(e)[:300]}"))
            continue
        times[name] = (t1 - t0, time.monotonic() - t1)
        scols, srows = canon(sdf)
        dcols, drows = canon(ddf)
        if scols != dcols:
            failed.append((name, f"columns differ: spark={scols} duck={dcols}"))
        elif len(srows) != len(drows):
            failed.append((name, f"row count: spark={len(srows)} duck={len(drows)}"))
        elif srows != drows:
            diff = next(
                (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
            )
            failed.append((name, f"values differ at sorted-row {diff[0]}:\n  spark={diff[1][:200]}\n  duck ={diff[2][:200]}"))
        else:
            passed.append((name, len(srows)))

    for name, n in passed:
        print(f"PASS  {name}  ({n} rows)")
    for name, n in rows_only:
        print(f"ROWS-ONLY  {name}  ({n} rows)")
    for name, msg in failed:
        print(f"FAIL  {name}: {msg}")
    if timing:
        print("\nper-query wall (spark_s, duck_s), slowest spark first:")
        for name, (ts, td) in sorted(times.items(), key=lambda kv: -kv[1][0]):
            print(f"  {ts:7.2f}  {td:7.2f}  {name}")
        tot_s = sum(t[0] for t in times.values())
        tot_d = sum(t[1] for t in times.values())
        print(f"TOTAL spark {tot_s:.1f}s  duckdb {tot_d:.1f}s")
    print(f"\n{len(passed)} pass, {len(rows_only)} rows-only, {len(failed)} fail")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
