"""Experiment: literal-contains guards in front of the entity regexes.

Each regex family's pattern requires a literal substring ("twitter.com",
"@", "+", ...). Guarding the regexp_extract_all with a cheap contains()
lets codegen skip the backtracking regex scan on bodies that can't
match. This script measures the extraction stage (BENCH page store ->
extract -> noop sink) for: baseline, guarded, and each family alone.

Usage: python tools/exp_extract_guard.py [cpus]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from scrapeulous_spark.functions.entities import FAMILIES, KIND_ORDER
from scrapeulous_spark.session import get_spark
from scrapeulous_spark.sources.corpus import BENCH, ensure_corpus

# per-pattern literal guards implied by the pattern itself (see entities.py);
# None = no cheap literal exists (generic phone: any 3 digits)
GUARDS: dict[str, list] = {
    "email": [lambda c: c.contains("@")],
    "phone": [lambda c: c.contains("+"), None],
    "facebook": [lambda c: c.contains("facebook.com") | c.contains("fb.com")],
    "twitter": [lambda c: c.contains("twitter.com")],
    "instagram": [lambda c: c.contains("instagram.com")],
    "github": [lambda c: c.contains("github.com")],
}

def EMPTY():
    return F.expr("cast(array() as array<string>)")


def build(pages, kinds, guarded: bool):
    def matches(kind: str):
        parts = []
        for p, g in zip(FAMILIES[kind], GUARDS[kind]):
            rx = F.regexp_extract_all(F.col("body"), F.lit(p), F.lit(0))
            if guarded and g is not None:
                rx = F.when(g(F.col("body")), rx).otherwise(EMPTY())
            parts.append(rx)
        arr = F.concat(*parts) if len(parts) > 1 else parts[0]
        return F.struct(F.lit(kind).alias("kind"), arr.alias("arr"))

    per_kind = pages.select(
        "seed_id",
        "page_order",
        F.explode(F.array(*[matches(k) for k in kinds])).alias("e"),
    )
    return per_kind.select(
        "seed_id",
        F.col("e.kind").alias("kind"),
        "page_order",
        F.posexplode("e.arr").alias("match_pos", "value"),
    )


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    paths = ensure_corpus(BENCH)
    spark = get_spark(cpus, app_name="exp-extract-guard")
    pages = (
        spark.read.parquet(paths["pages"])
        .select(
            F.xxhash64("url").alias("seed_id"),
            F.lit(0).alias("page_order"),
            "body",
        )
        .repartition(cpus * 4)
    )

    def timed(label, df, runs=2):
        walls = []
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        print(f"{label:28s} min={min(walls):7.2f}s  all={[round(w,2) for w in walls]}", flush=True)
        return min(walls)

    # correctness first: guarded == baseline, exactly (on a ~3% hash sample)
    sample = pages.filter(F.pmod(F.xxhash64("seed_id"), F.lit(32)) == 0).cache()
    base_s = build(sample, KIND_ORDER, guarded=False)
    guard_s = build(sample, KIND_ORDER, guarded=True)
    diff = base_s.exceptAll(guard_s).count() + guard_s.exceptAll(base_s).count()
    print(f"guarded-vs-baseline row diff (sample): {diff} (must be 0)", flush=True)
    sample.unpersist()

    base_df = build(pages, KIND_ORDER, guarded=False)
    guard_df = build(pages, KIND_ORDER, guarded=True)
    timed("warmup(baseline)", base_df, runs=1)
    b = timed("baseline all", base_df)
    g = timed("guarded all", guard_df)
    print(f"speedup {b / g:.2f}x", flush=True)
    for k in KIND_ORDER:
        timed(f"solo {k}", build(pages, [k], guarded=False), runs=1)
        timed(f"solo {k} guarded", build(pages, [k], guarded=True), runs=1)
    spark.stop()


if __name__ == "__main__":
    main()
