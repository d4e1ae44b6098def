#!/usr/bin/env bash
# North-rule scaling evidence: the same validation job at two cluster
# sizes (N and 4N executors). On a real cluster the two runs are
# spark-submit invocations against YARN/K8s; in this sandbox graft.Scaling
# runs the identical job at local[8] vs local[32] (same machine, same
# input) — see BENCH.md for measured numbers.
set -euo pipefail
cd "$(dirname "$0")/.."

JAR=target/scala-2.13/yjschemavalidatorspark_2.13-0.1.0.jar
sbt -batch package

# Cluster form (N and 4N executors), for reference:
#   spark-submit --class graft.Scaling --master yarn \
#     --num-executors 8  --executor-cores 4 --executor-memory 16g $JAR
#   spark-submit --class graft.Scaling --master yarn \
#     --num-executors 32 --executor-cores 4 --executor-memory 16g $JAR

# Sandbox proxy (single machine, two parallelism levels in one run):
SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}" \
SPARK_GRAFT_REPLICAS="${SPARK_GRAFT_REPLICAS:-4000}" \
  sbt -batch "runMain graft.Scaling"
