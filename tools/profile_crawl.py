"""Pinned-leg crawl profiler with Spark event-log attribution.

Runs ONE bench-shaped crawl leg (same `_idlest_cores` pinning, BENCH
corpus, warm-then-timed structure as a `bench.py` leg) with
`spark.eventLog` enabled, then parses the rolling zstd event log to
attribute the wall: per-job intervals (driver no-job gaps = true
driver-side serialization), per-job executor task time (parallelism),
and window totals (task run / JVM CPU / GC). This is the tool behind
BENCH.md's "event-log attribution of the 1->4 gap" table.

Usage: python tools/profile_crawl.py [N]        # default N=4

The zstd event log is decompressed via the `zstd` CLI (no python
zstandard module in the sandbox).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
_LOG_DIR = "/tmp/sparklogs"


def run_leg(cpus: int) -> tuple[float, str]:
    """Warm on SMOKE, run the timed BENCH crawl pinned to `cpus` cores;
    returns (timed-window start ms, applicationId)."""
    import bench

    try:
        os.sched_setaffinity(0, bench._idlest_cores(cpus))
    except OSError:
        pass
    from scrapeulous_spark.plans.loop import CrawlEngine
    from scrapeulous_spark.session import get_spark
    from scrapeulous_spark.sources.corpus import BENCH, SMOKE, ensure_corpus

    paths = ensure_corpus(BENCH)
    warm = ensure_corpus(SMOKE)
    os.makedirs(_LOG_DIR, exist_ok=True)
    spark = get_spark(
        cpus=cpus,
        shuffle_partitions=max(cpus, 8),
        app_name=f"profile_crawl_{cpus}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{_LOG_DIR}",
        },
    )
    with tempfile.TemporaryDirectory() as wh:
        t = time.time()
        e = CrawlEngine(spark, wh, warm)
        e.run()
        e.result_crawl_order().count()
        print(f"warm wall: {time.time() - t:.1f}s", flush=True)

    wh = tempfile.mkdtemp(prefix="prof_wh_")
    t0 = time.time()
    eng = CrawlEngine(spark, wh, paths)
    eng.run()
    n = eng.result_crawl_order().count()
    wall = time.time() - t0
    print(f"timed wall: {wall:.1f}s urls={n} urls/s={n / wall:.0f}", flush=True)
    print(eng.metrics.read(spark).toPandas().to_string(), flush=True)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    return t0 * 1000.0, app_id


def read_events(app_id: str):
    d = os.path.join(_LOG_DIR, f"eventlog_v2_{app_id}")
    parts = sorted(glob.glob(os.path.join(d, "events_*"))) or [d]
    for p in parts:
        if p.endswith(".zstd"):
            out = subprocess.run(["zstd", "-d", "-c", p], capture_output=True, text=True)
            lines = out.stdout.splitlines()
        else:
            lines = open(p)
        for line in lines:
            try:
                yield json.loads(line)
            except Exception:
                continue


def attribute_events(events, t0_ms: float, cpus: int) -> dict | None:
    """Pure attribution over an iterable of event dicts: job-interval
    union coverage (driver no-job gaps), timed-window task totals, and
    per-job durations/task-time. Unit-tested on synthetic events."""
    jobs: dict[int, dict] = {}
    stage_task_ms: dict[int, int] = {}
    tot_run = tot_gc = tot_cpu = 0.0
    for ev in events:
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jobs[ev["Job ID"]] = {
                "sub": ev["Submission Time"],
                "end": None,
                "pool": props.get("spark.scheduler.pool", "default"),
                "site": (props.get("callSite.short") or "")[:60],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            info = ev.get("Task Info") or {}
            sid = ev["Stage ID"]
            stage_task_ms[sid] = stage_task_ms.get(sid, 0) + m.get("Executor Run Time", 0)
            if (info.get("Launch Time") or 0) >= t0_ms:
                tot_run += m.get("Executor Run Time", 0)
                tot_gc += m.get("JVM GC Time", 0)
                tot_cpu += m.get("Executor CPU Time", 0) / 1e6

    timed = {j: d for j, d in jobs.items() if d["sub"] >= t0_ms and d["end"]}
    if not timed:
        return None
    ivs = sorted((d["sub"], d["end"]) for d in timed.values())
    cov, (cs, ce) = 0, ivs[0]
    for s, e2 in ivs[1:]:
        if s > ce:
            cov += ce - cs
            cs, ce = s, e2
        else:
            ce = max(ce, e2)
    cov += ce - cs
    w0 = min(d["sub"] for d in timed.values())
    w1 = max(d["end"] for d in timed.values())
    wall = (w1 - w0) / 1000.0
    rows = sorted(
        (
            {
                "dur_s": (d["end"] - d["sub"]) / 1000.0,
                "task_s": sum(stage_task_ms.get(s, 0) for s in d["stages"]) / 1000.0,
                "pool": d["pool"],
                "site": d["site"],
            }
            for d in timed.values()
        ),
        key=lambda r: -r["dur_s"],
    )
    return {
        "wall_s": wall,
        "covered_s": cov / 1000.0,
        "no_job_s": (w1 - w0 - cov) / 1000.0,
        "n_jobs": len(timed),
        "task_run_s": tot_run / 1000.0,
        "jvm_cpu_s": tot_cpu / 1000.0,
        "gc_s": tot_gc / 1000.0,
        "occupancy": (tot_run / 1000.0) / (cpus * wall) if wall > 0 else 0.0,
        "jobs": rows,
    }


def attribute(app_id: str, t0_ms: float, cpus: int) -> None:
    r = attribute_events(read_events(app_id), t0_ms, cpus)
    if r is None:
        print("no timed jobs found")
        return
    print(
        f"\nwindow {r['wall_s']:.1f}s  job-covered {r['covered_s']:.1f}s  "
        f"driver-only(no-job) {r['no_job_s']:.1f}s  n_jobs={r['n_jobs']}"
    )
    print(
        f"executor task run {r['task_run_s']:.1f}s  jvm cpu {r['jvm_cpu_s']:.1f}s  "
        f"gc {r['gc_s']:.1f}s  occupancy {r['occupancy']:.3f}"
    )
    print(f"{'dur_s':>7} {'task_s':>8} {'par':>5}  pool        site")
    for row in r["jobs"][:15]:
        par = row["task_s"] / row["dur_s"] if row["dur_s"] > 0 else 0.0
        print(f"{row['dur_s']:7.1f} {row['task_s']:8.1f} {par:5.2f}  {row['pool']:<10}  {row['site']}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t0_ms, app_id = run_leg(n)
    attribute(app_id, t0_ms, n)
