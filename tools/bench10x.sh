#!/usr/bin/env bash
# Reproduce the 10x scale-up bench in one command: build the ScaleUp
# fixture if absent, QueryBench the heavy query set (min-of-N in one
# JVM — the contention-robust metric on this noisy box), write one
# JSON file with the minima. The sublinear-at-10x claim in PLANS.md is
# re-checkable by diffing a fresh run of this against tools/bench10x.json.
#
# Env overrides: SRC (source sf dir), FIX (fixture dir), REPS, ITERS,
# CPUS, OUT, QUERIES, SKEW (percent; >0 builds the hot-key variant).
set -euo pipefail
cd "$(dirname "$0")/.."

SRC=${SRC:-/root/testdata/sf0.1}
REPS=${REPS:-10}
SKEW=${SKEW:-0}
if [ "$SKEW" -gt 0 ]; then
  FIX=${FIX:-localdata/sf1skew}
else
  FIX=${FIX:-localdata/sf1}
fi
OUT=${OUT:-tools/bench10x.json}
ITERS=${ITERS:-3}
CPUS=${CPUS:-32}
QUERIES=${QUERIES:-q_dedup_exact q_dedup_minhash q_dedup_jaccard q_dedup_simhash_hamming q_dedup_editdist q_dedup_cc q_dedup_cc_star q_dedup_keep_best q_text_contamination q_text_tfidf q_text_boilerplate q_text_bigram_lm q_text_lm_rarity q_text_dup_ngram q_text_mixture q_join_range q_sim_ivf q_evt_funnel q_evt_attribution q_evt_wau q_graph_degree q_graph_triangles q_graph_triangles_capped q_graph_pagerank}

if [ ! -d "$FIX/lineitem.parquet" ]; then
  echo "[bench10x] building $FIX = ${REPS}x $SRC (skew ${SKEW}%)" >&2
  SPARK_GRAFT_CPUS=$CPUS sbt -batch \
    "runMain graft.tools.ScaleUp $SRC $FIX $REPS $SKEW" >&2
fi

{
  printf '{"fixture":"%s","reps":%s,"skew_pct":%s,"iters_min_of":%s,"unit":"sec","queries":{' \
    "$FIX" "$REPS" "$SKEW" "$ITERS"
  first=1
  for q in $QUERIES; do
    echo "[bench10x] $q" >&2
    min=$(SPARK_GRAFT_SF_DIR="$PWD/$FIX" SPARK_GRAFT_CPUS=$CPUS \
      sbt -batch "runMain graft.tools.QueryBench $q $ITERS" 2>/dev/null \
      | sed -n 's/.*min \([0-9.]*\).*median.*/\1/p' | head -1)
    if [ -z "$min" ]; then
      echo "[bench10x] $q produced no timing — aborting" >&2
      exit 1
    fi
    [ "$first" -eq 1 ] || printf ','
    first=0
    printf '"%s":%s' "$q" "$min"
  done
  printf '}}\n'
} > "$OUT"
cat "$OUT"
