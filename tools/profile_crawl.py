"""Per-phase wall profile of a BENCH crawl leg.

Monkeypatches timers around CrawlEngine phase methods and per-table
SnapshotTable commits, runs warm-up (SMOKE) + one timed BENCH crawl at
local[N], and prints a sorted breakdown. Phases overlap (extraction runs
on the FAIR-pool thread), so per-phase walls can sum past the leg wall —
read them as "wall held open by this phase", not exclusive time.

Usage: python tools/profile_crawl.py [cpus] [runs]
"""

from __future__ import annotations

import functools
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

from scrapeulous_spark.plans.loop import CrawlEngine
from scrapeulous_spark.session import get_spark
from scrapeulous_spark.sources import tables
from scrapeulous_spark.sources.corpus import BENCH, SMOKE, ensure_corpus

ACC: dict[str, list[float]] = defaultdict(list)
ENABLED = False


def _wrap_method(cls, name, label=None):
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            if ENABLED:
                key = label(self, *a, **kw) if callable(label) else (label or name)
                ACC[key].append(time.time() - t0)

    setattr(cls, name, timed)


def install():
    for m in (
        "_superstep_seeds",
        "_finalize",
        "_checkpoint",
        "_write_frontier",
        "_update_seen",
        "_validate_payloads",
        "_hot_hosts",
    ):
        _wrap_method(CrawlEngine, m)
    _wrap_method(
        CrawlEngine, "_superstep_depth", lambda self, d, **kw: f"_superstep_depth[{d}]"
    )
    _wrap_method(
        CrawlEngine, "_sched_for_depth", lambda self, d, **kw: f"_sched_for_depth[{d}]"
    )
    for m in ("append", "overwrite"):
        _wrap_method(
            tables.SnapshotTable, m, lambda self, *a, _m=m, **kw: f"table.{_m}:{self.name}"
        )


def main():
    global ENABLED
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    install()
    paths = ensure_corpus(BENCH)
    warm = ensure_corpus(SMOKE)
    spark = get_spark(cpus=cpus, shuffle_partitions=max(cpus, 8), app_name=f"profile_{cpus}")
    walls = []
    for i, run_paths in enumerate((warm,) + (paths,) * runs):
        ENABLED = i > 0
        with tempfile.TemporaryDirectory() as wh:
            t0 = time.time()
            eng = CrawlEngine(spark, wh, run_paths)
            eng.run()
            n = eng.result_crawl_order().count()
            eng.result_seen().count()
            walls.append(time.time() - t0)
    spark.stop()
    total = sum(walls[1:])
    print(f"\ncpus={cpus} timed_runs={runs} urls={n} wall={total:.1f}s "
          f"(warmup {walls[0]:.1f}s)")
    print(f"{'phase':<34}{'calls':>6}{'total_s':>9}{'mean_s':>8}")
    for key, vals in sorted(ACC.items(), key=lambda kv: -sum(kv[1])):
        print(f"{key:<34}{len(vals):>6}{sum(vals):>9.2f}{sum(vals) / len(vals):>8.2f}")


if __name__ == "__main__":
    main()
