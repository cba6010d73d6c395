#!/usr/bin/env bash
# North-rule launch evidence: the SAME job relaunched via
#   spark-submit --py-files dist/scrapeulous_spark.zip
# at two cluster sizes (local[1] and local[4] = N and 4N cores, in-sandbox stand-in
# for N and 4N executors). Prints both JSON lines + scaling efficiency.
set -euo pipefail
cd "$(dirname "$0")/.."
SUBMIT="${SPARK_SUBMIT:-spark-submit}"
export SPARK_GRAFT_CACHE="${SPARK_GRAFT_CACHE:-$PWD/.cache}"
python tools/make_dist.py >/dev/null
python -c "from scrapeulous_spark.sources.corpus import BENCH, ensure_corpus; ensure_corpus(BENCH)" >/dev/null

run () {
  # Pin the whole leg (JVM + python workers, which inherit affinity) to
  # exactly $1 of the idlest cores — same honesty rule as bench.py
  # run_crawl: unpinned, "local[1]" measurably free-rides to ~1.5
  # cores (GC/python workers overlap the task thread on spare
  # physical cores) and deflates the N->4N ratio, which a real pinned
  # executor (YARN/K8s cpu limit) does not get.
  CORES=$(python -c "import bench; print(','.join(map(str, sorted(bench._idlest_cores($1)))))")
  taskset -c "$CORES" "$SUBMIT" --master "local[$1]" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.shuffle.partitions="$1" \
    --conf spark.sql.adaptive.enabled=true \
    --conf spark.driver.extraJavaOptions=-XX:+UseParallelGC \
    --conf spark.executor.extraJavaOptions=-XX:+UseParallelGC \
    --conf spark.scheduler.mode=FAIR \
    --conf spark.sql.files.maxPartitionBytes=16m \
    --conf spark.sql.autoBroadcastJoinThreshold=64m \
    --py-files dist/scrapeulous_spark.zip \
    tools/submit_crawl.py --scale bench 2>/dev/null | tail -1
}

J1=$(run 1);  echo "$J1"
J4=$(run 4); echo "$J4"
python - "$J1" "$J4" <<'PY'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (b["urls_per_sec"] / a["urls_per_sec"]) / 4.0
print(json.dumps({"scaling_efficiency_1_to_4": round(eff, 3)}))
PY
