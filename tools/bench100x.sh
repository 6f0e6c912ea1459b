#!/usr/bin/env bash
# 100x scale probe (round 13): min-of-N single-JVM timings for the
# most expensive board rows at 1x (/root/testdata/sf0.1), 10x
# (localdata/sf1) and 100x (localdata/sf10 — built by
#   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 localdata/sf10 100"
# ), plus the FineWeb curation chain via MixChainBench. Runs the
# compiled classes directly (java -cp), so it needs `sbt compile`
# first but never touches the sbt lock.
#
# Env overrides: QUERIES, ITERS_1X/ITERS_10X/ITERS_100X, CPUS, OUT.
set -euo pipefail
cd "$(dirname "$0")/.."

CPUS=${CPUS:-32}
ITERS_1X=${ITERS_1X:-3}
ITERS_10X=${ITERS_10X:-3}
ITERS_100X=${ITERS_100X:-2}
OUT=${OUT:-tools/bench100x_r13.json}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
MEM=${MEM:-16g}
JOPTS="-Xmx$MEM -XX:+UseG1GC --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
QUERIES=${QUERIES:-q_dedup_cc_star q_graph_lpa q_dedup_keep_best q_graph_clustering_capped q_sim_ivfpq q_dedup_cc q_dedup_jaccard q_dedup_cluster_split q_graph_triangles_capped q_dedup_length_routed}

declare -A DIRS=([1x]=/root/testdata/sf0.1 [10x]=localdata/sf1 [100x]=localdata/sf10)
declare -A ITERS=([1x]=$ITERS_1X [10x]=$ITERS_10X [100x]=$ITERS_100X)

echo "{" > "$OUT.tmp"
first=1
for scale in 1x 10x 100x; do
  dir=${DIRS[$scale]}
  [ -d "$dir" ] || { echo "[bench100x] missing fixture $dir" >&2; exit 1; }
  for q in $QUERIES; do
    echo "[bench100x] $q @ $scale (${ITERS[$scale]} iters, $dir)" >&2
    m=$(SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=$CPUS \
        java $JOPTS -cp "$CP" graft.tools.QueryBench "$q" "${ITERS[$scale]}" 2>/dev/null \
        | awk '/^min /{print $2}')
    [ $first -eq 1 ] || echo "," >> "$OUT.tmp"
    first=0
    printf '  "%s@%s": %s' "$q" "$scale" "$m" >> "$OUT.tmp"
    echo "[bench100x]   min ${m}s" >&2
  done
  echo "[bench100x] mixchain @ $scale" >&2
  rm -rf /tmp/mixchain100x
  line=$(SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_OUT=/tmp/mixchain100x \
      java $JOPTS -cp "$CP" graft.tools.MixChainBench 2>/dev/null | grep '"t_' | tail -1)
  echo "," >> "$OUT.tmp"
  printf '  "mixchain@%s": %s' "$scale" "$line" >> "$OUT.tmp"
done
echo "" >> "$OUT.tmp"
echo "}" >> "$OUT.tmp"
mv "$OUT.tmp" "$OUT"
echo "[bench100x] wrote $OUT" >&2
