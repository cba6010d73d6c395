"""SERP extraction throughput at a bench-sized page store.

The proj_* catalog queries run on the fixed smoke corpus (correctness
surface); this tool measures the SAME extraction plan shape — canon
pre-pass -> block regexp_extract_all -> posexplode -> per-field
projection -> admission filter — on a much larger generated SERP
store, reporting pages/sec and MB/sec. The plan is map-only up to the
single rank-window shuffle, so this is the number that scales
linearly with executors at 10^10 pages.

Usage: python tools/bench_serp_extract.py [n_kw] [cpus] [--json]
(defaults 2000 16; --json emits one machine-readable line for
bench.py's serp_extract leg)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    n_kw = int(args[0]) if args else 2000
    cpus = int(args[1]) if len(args) > 1 else 16
    from dataclasses import replace

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from scrapeulous_spark.operators.catalog_serp import (
        _P_B_ORG,
        _P_B_TITLE,
        _P_G_ORG,
        _P_G_ST,
        _canon,
    )
    from scrapeulous_spark.sources.serp_corpus import SMOKE, ensure_serp_corpus

    big = replace(SMOKE, n_kw=n_kw, n_single=max(4, n_kw // 4))
    path = ensure_serp_corpus(big)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    store = spark.read.parquet(path)
    n_pages = store.count()
    fam_mb = {
        r["engine"]: r["b"] / 1e6
        for r in store.groupBy("engine")
        .agg(F.sum(F.length("body")).alias("b"))
        .collect()
    }
    total_mb = sum(fam_mb.values())

    def google_organic(df):
        b = (
            df.where(F.col("engine") == "google")
            .select("url", _canon(F.col("body")).alias("body"))
            .select(
                "url",
                F.posexplode(
                    F.regexp_extract_all(F.col("body"), F.lit(_P_G_ORG), 0)
                ).alias("pos0", "blk"),
            )
        )
        out = b.select(
            "url",
            (F.col("pos0") + 1).alias("position"),
            F.regexp_extract("blk", "<h3>([^<]*)</h3>", 1).alias("title"),
            F.regexp_extract("blk", '<a href="([^"]*)"><h3>', 1).alias("link"),
            F.trim(F.regexp_extract("blk", _P_G_ST, 2)).alias("snippet"),
        )
        return out.where(
            (F.col("title") != "") & (F.col("snippet") != "") & (F.col("link") != "")
        )

    def bing_organic(df):
        b = (
            df.where(F.col("engine") == "bing")
            .select("url", _canon(F.col("body")).alias("body"))
            .select(
                "url",
                F.posexplode(
                    F.regexp_extract_all(F.col("body"), F.lit(_P_B_ORG), 0)
                ).alias("pos0", "blk"),
            )
        )
        f = b.select(
            "url",
            "pos0",
            F.regexp_extract("blk", _P_B_TITLE, 1).alias("title"),
        ).where(F.col("title") != "")
        w = Window.partitionBy("url").orderBy("pos0")
        return f.withColumn("position", F.row_number().over(w))

    rec = {"n_pages": n_pages, "body_mb": round(total_mb, 1), "cpus": cpus}
    for name, fn in [("google_organic", google_organic), ("bing_organic", bing_organic)]:
        fam = name.split("_")[0]
        fn(store).count()  # warm (codegen + page cache)
        t0 = time.time()
        rows = fn(store).count()
        dt = time.time() - t0
        fam_pages = store.where(F.col("engine") == fam).count()
        rec[name] = {
            "rows": rows,
            "pages": fam_pages,
            "wall_sec": round(dt, 2),
            "pages_per_sec": round(fam_pages / dt, 1),
            "body_mb_per_sec": round(fam_mb.get(fam, 0.0) / dt, 1),
        }
        if not as_json:
            print(
                f"{name}: {rows} rows from {fam_pages} pages in {dt:.2f}s "
                f"-> {fam_pages / dt:,.0f} pages/s "
                f"({fam_mb.get(fam, 0.0) / dt:,.0f} MB/s of family body text)"
            )
    if as_json:
        print(json.dumps(rec))
    else:
        print(f"store: {n_pages} pages, {total_mb:.1f} MB of body text")


if __name__ == "__main__":
    main()
