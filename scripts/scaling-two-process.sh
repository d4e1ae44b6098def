#!/usr/bin/env bash
# North-rule scaling evidence, two-PROCESS form: the same validation job
# at two cluster sizes (N and 4N cores), each level in its own JVM
# pinned (taskset) to exactly its core count — the honest local proxy
# for two spark-submit cluster sizes: an 8-core node does not get 24
# spare cores for GC/JIT the way `local[8]` on a 32-core box does.
#
#   SPARK_GRAFT_SCALE_JOB=invariant|full|minhash  (Job A | Job B | Job C)
#   SPARK_GRAFT_REPLICAS=4000             (20M docs at sf0.1, jobs A/B)
#   SPARK_GRAFT_MINHASH_REPLICAS=400      (~2.2M docs at sf0.1, job C —
#                                          MinHash near-dup end-to-end)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile >/dev/null 2>&1

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SYSPROPS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.optimizer.excludedRules=org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate -XX:ReservedCodeCacheSize=1g"

run_level() {  # cores heap
  # -Xms=-Xmx: heap growth mid-run caused one-off multi-second full-GC
  # stalls in the first timed rep of the allocation-heavy dedup job
  # (round-4 event logs: a single stage with 727 s of GC)
  taskset -c "0-$(( $1 - 1 ))" \
    java -Xms"$2" -Xmx"$2" $SYSPROPS $OPENS -cp "$CP" graft.ScalingOne "$1" \
    2>/dev/null | grep '"cpus"'
}

# memory scales with cluster size (N executors -> 1/4 the total RAM).
# The sandbox host shows multi-minute contention windows (a 32-core run
# of the identical job measured 6.1s / 8.7s / 23.6s across invocations),
# so each level runs REPS times alternating and the per-level MIN is
# used — external noise only ever slows a run down, so min is the honest
# estimate of what the configuration can do.
REPS="${REPS:-3}"
RESULTS=""
for i in $(seq "$REPS"); do
  LO=$(run_level 8 16g);  echo "$LO";  RESULTS="$RESULTS $LO"
  HI=$(run_level 32 64g); echo "$HI"; RESULTS="$RESULTS $HI"
done
python3 - $RESULTS <<'PY'
import json, sys, os
runs = [json.loads(a) for a in sys.argv[1:]]
best = {}
for r in runs:
    c = r["cpus"]
    if c not in best or r["sec"] < best[c]["sec"]:
        best[c] = r
lo, hi = best[8], best[32]
eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi["cpus"] / lo["cpus"])
print(json.dumps({"metric": "scaling efficiency 8->32 cores (two-process, pinned, min-of-reps)",
  "value": round(eff, 4), "docs": lo["docs"],
  "sec_n8": lo["sec"], "sec_n32": hi["sec"],
  "docs_per_sec_n8": lo["docs_per_sec"], "docs_per_sec_n32": hi["docs_per_sec"],
  "job": os.environ.get("SPARK_GRAFT_SCALE_JOB", "invariant")}))
PY
