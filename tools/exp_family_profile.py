"""Per-family wall profile of the CURRENT production extraction stage.

Runs the BENCH page store through extract_entities_raw restricted to
one family at a time (plus the full six-family plan), interleaved
min-of-k, local[N]. Usage: python tools/exp_family_profile.py [cpus] [k]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import scrapeulous_spark.operators.extract as X
from scrapeulous_spark.functions.entities import KIND_ORDER
from scrapeulous_spark.session import get_spark
from scrapeulous_spark.sources.corpus import BENCH, ensure_corpus


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    paths = ensure_corpus(BENCH)
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8), app_name="fam_profile")
    pages = (
        spark.read.parquet(paths["pages"])
        .select(F.lit(0).alias("seed_id"), F.lit(0).alias("page_order"), "body")
    )

    real_order = list(KIND_ORDER)
    cells = ["ALL"] + real_order
    walls = {c: [] for c in cells}
    for rep in range(k + 1):  # rep 0 = warmup, discarded
        for cell in cells:
            X.KIND_ORDER = real_order if cell == "ALL" else [cell]
            t0 = time.time()
            n = X.extract_entities_raw(pages).selectExpr("count(*) c").collect()[0].c
            if rep:
                walls[cell].append(time.time() - t0)
    X.KIND_ORDER = real_order
    spark.stop()
    for cell in cells:
        print(f"{cell:<12} min={min(walls[cell]):7.2f}s  all={[round(w, 2) for w in walls[cell]]}")


if __name__ == "__main__":
    main()
