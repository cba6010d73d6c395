"""SparkSession builder tuned for the sandbox (local[N]) while keeping
every knob meaningful on a real multi-executor cluster."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_PKG_DIR)


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers no
    matter the driver's cwd/sys.path (the driver contract creates its
    own SparkSession from an arbitrary cwd): build the --py-files zip
    if stale and ``addPyFile`` it once per SparkContext. Closures in
    applyInPandas/mapInPandas stages are pickled BY REFERENCE to this
    package, so workers must be able to import it; on a real cluster
    this is the same artifact ``spark-submit --py-files`` ships
    (tools/spark_submit_bench.sh)."""
    sc = spark.sparkContext
    if getattr(sc, "_scrapeulous_pkg_shipped", False):
        return
    out = os.path.join(_REPO, "dist", "scrapeulous_spark.zip")
    newest = max(
        os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(_PKG_DIR)
        for f in fs
        if f.endswith(".py")
    )
    if not os.path.exists(out) or os.path.getmtime(out) < newest:
        import zipfile

        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = f"{out}.tmp.{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                if "__pycache__" in root:
                    continue
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _REPO))
        os.replace(tmp, out)
    try:
        sc.addPyFile(out)
    except Exception:
        pass  # already registered (e.g. spark-submit --py-files) — workers have it
    sc._scrapeulous_pkg_shipped = True


def get_spark(
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "scrapeulous_spark",
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """master=None -> local[cpus] (single shared JVM, threads-as-cores).
    Pass e.g. ``local-cluster[4,1,6144]`` to run against REAL separate
    executor JVMs (own heap/GC/python workers, shuffle over the
    loopback) — the in-sandbox stand-in for a multi-executor cluster
    that the N-vs-4N scaling legs use (bench.py)."""
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # throughput GC, not default G1: the regex-extraction stage
        # (dominant crawl cost) allocates heavily, and G1's concurrent
        # marking threads compete with the compute threads. Measured on
        # the BENCH extraction stage, best-of-3: 1->4-thread speedup
        # 3.61x (G1) -> 3.87x (ParallelGC) and ~5-11% faster absolute
        # walls at both levels. Same flag on executors for cluster mode.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # FAIR across pools so the crawl loop can overlap its CPU-dense
        # extraction job with the latency-bound small commits (frontier
        # write, seen MERGE) from a second driver thread — the small
        # jobs' tasks slip into slots the big job would otherwise hold
        # via FIFO head-of-line. Single-job workloads are unaffected.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
        # 16m, not the 128m default: the page-store payload scan must
        # split finer than "file size / 128m" or a single ~250MB parquet
        # caps every downstream body stage at 2 tasks regardless of
        # cluster size. At 100 TB the same rule holds relative to core
        # count; 16m keeps scan tasks ~1s each without drowning the
        # scheduler.
        .config("spark.sql.files.maxPartitionBytes", "16m")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
