#!/bin/bash
# Launch graft.ScaleGate with the build.sbt JVM options but WITHOUT sbt,
# so long gate runs don't hold the sbt build lock. Usage:
#   scripts/gate.sh <heap> <baseDir> <factor> [query ... | --fullstar]
#   scripts/gate.sh <heap> <baseDir> <factor> --per-query [--fullstar] q1 q2 ...
# e.g. scripts/gate.sh 90g /root/testdata/sf0.1 100 q_token_count ...
#
# --per-query (r14 verdict #1 + #2): ONE JVM PER QUERY — each query's
# recorded cold/warm rows are solo by construction (no storage-pool
# co-residency from other queries' snapshots, the interference that
# read q_ship_priority at 38.9x in-gate vs 2.3x solo), and scratch
# disk is reclaimed at EVERY process exit (the ENOSPC wall the 35x/50x
# rec sweeps hit when three bootstrap chains stacked in one JVM).
# Between processes the script purges stale bucketed ratings tables
# (spark-warehouse/graft_ratings_*, ~0.6 GB each at 35x) and checks
# free disk against the MEASURED per-family rule (PLANS.md round-15
# disk table: rec bootstrap ~1.5 GB x factor, sim family ~1.4, star
# joins/scans ~0.4, unknown families the conservative 1.8) — an
# under-provisioned query is SKIPPED with a message instead of
# ENOSPC-ing the sweep. SPARK_GRAFT_GATE_NEED_GB overrides the rule.
# Rows append to target/gate_perquery_f<factor>[_fullstar].jsonl.
#
# Env knobs:
#   SPARK_GRAFT_GATE_NEED_GB=N       override the disk rule outright
#   SPARK_GRAFT_GATE_KEEP_STORES=1   preserve durable index/store dirs
#     (target/rec_store*, target/dedup_index) instead of purging them
#     between processes — set this when another workflow's indexes
#     must survive the sweep (ADVICE r15; the purge is otherwise safe:
#     every gate process rebuilds its own store)
#   SPARK_GRAFT_GATE_ARTIFACT=FILE   also append each query's final
#     schema row ({"query",factor,base_sec,scaled_sec,ratio,per_row,
#     pool_gb,loadavg}) and its gate_launch stamp to $ROOT/FILE — the
#     per-round GATE_rN.jsonl artifact (r15 verdict #6)
set -euo pipefail
HEAP="$1"; shift
# Repo root from the script's own location (ADVICE r13: a hardcoded
# /root/repo classpath silently ran stale classes from the wrong
# checkout), and fail fast if the classes dir is older than the newest
# source file — a gate over stale classes measures the wrong engine.
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$ROOT/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "gate.sh: $CLASSES missing — run 'sbt compile'" >&2; exit 1; }
NEWEST_CLASS=$(find "$CLASSES" -name '*.class' -printf '%T@\n' | sort -rn | head -1)
NEWEST_SRC=$(find "$ROOT/src/main" -name '*.scala' -printf '%T@ %p\n' | sort -rn | head -1)
if [ -n "$NEWEST_SRC" ] && \
   awk -v s="${NEWEST_SRC%% *}" -v c="${NEWEST_CLASS:-0}" 'BEGIN{exit !(s>c)}'; then
  echo "gate.sh: STALE classes — ${NEWEST_SRC#* } is newer than every .class; run 'sbt compile' first" >&2
  exit 1
fi
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent \
         java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
         java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
run_gate() {
  java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx"$HEAP" -cp "$CLASSES:/opt/spark/jars/*" \
    graft.ScaleGate "$@"
}

# mode detection: a plain loop over "$@" (ADVICE r15: the old
# positional check tested $4 AFTER the shift, so it looked at the
# wrong argument and relied on a grep pipeline that pipefail could
# misread under SIGPIPE)
PERQ=0
for a in "$@"; do
  [ "$a" = "--per-query" ] && PERQ=1
done
if [ "$PERQ" -eq 0 ]; then
  run_gate "$@"
  exit $?
fi

# --- per-query mode -------------------------------------------------
BASE="$1"; FACTOR="$2"; shift 2
FULLSTAR=""
QUERIES=()
for a in "$@"; do
  case "$a" in
    --per-query) ;;
    --fullstar) FULLSTAR="--fullstar" ;;
    *) QUERIES+=("$a") ;;
  esac
done
[ "${#QUERIES[@]}" -gt 0 ] || { echo "gate.sh --per-query: no queries given" >&2; exit 1; }
SUFFIX=""; [ -n "$FULLSTAR" ] && SUFFIX="_fullstar"
OUT="$ROOT/target/gate_perquery_f${FACTOR}${SUFFIX}.jsonl"
ARTIFACT=""
[ -n "${SPARK_GRAFT_GATE_ARTIFACT:-}" ] && ARTIFACT="$ROOT/$SPARK_GRAFT_GATE_ARTIFACT"

# Measured per-family scratch peaks (PLANS.md round-15 disk table —
# r15 verdict #3: the 50x sweep's first launch skipped EVERYTHING on
# the generic rule and needed a mid-run env override; these are the
# measured truths, in GB-x10 per replica factor):
#   rec bootstrap chains   ~1.5 GB x factor (55–65 GB measured at 35x)
#   sim/ratings family     ~1.4 GB x factor (68 GB peak at 50x)
#   star joins/agg scans   <<   (chunk A's seven queries TOGETHER
#                                peaked ~70 GB in one 50x process)
#   unknown                 1.8 GB x factor (the conservative default)
# SPARK_GRAFT_GATE_NEED_GB overrides the rule outright.
need_gb_for() {
  local q="$1" per10
  case "$q" in
    q_rec_*) per10=15 ;;
    q_sim_*|q_vector_pipeline|q_movies_pipeline|q_topk_neighbors|\
    q_pairs_cooccurrence|q_user_postings) per10=14 ;;
    q_agg_*|q_ship_priority|q_join_broadcast_dims) per10=4 ;;
    *) per10=18 ;;
  esac
  local need=$(( FACTOR * per10 / 10 ))
  [ "$need" -lt 20 ] && need=20
  echo "$need"
}
FIRST=1
for q in "${QUERIES[@]}"; do
  # settle guard (round-15 postmortem: the preceding process's tens-
  # of-GB blockmgr churn inflated the NEXT query's timings — topk base
  # warm read 6.41 s mid-sweep vs 0.93 s settled): between processes,
  # wait for the 1-min load to drop below 4 (bounded at 5 min) so each
  # row is measured on a settled host, not in its neighbor's wake. A
  # timed-out settle is STAMPED into the recorded rows (r15 verdict
  # #1), never silent.
  SETTLE_WAIT=0; SETTLE_TIMED_OUT=0
  if [ "$FIRST" -eq 0 ]; then
    SETTLE_TIMED_OUT=1
    for _ in $(seq 1 30); do
      LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
      if [ "$LOAD" -lt 4 ]; then SETTLE_TIMED_OUT=0; break; fi
      sleep 10; SETTLE_WAIT=$((SETTLE_WAIT+10))
    done
  fi
  FIRST=0
  # reclaim the known cross-process leftovers BEFORE the disk check:
  # each gate session leaves one bucketed ratings table per dir, and
  # the rec/dedup persist queries leave their store dirs (6.5 GB at
  # 40x — the margin creep that ENOSPC'd the first topk re-measure);
  # every gate process rebuilds its own store, so purging is safe
  # WITHIN a sweep — set SPARK_GRAFT_GATE_KEEP_STORES=1 to preserve
  # durable indexes another workflow built (ADVICE r15)
  rm -rf "$ROOT"/spark-warehouse/graft_ratings_* 2>/dev/null || true
  if [ -z "${SPARK_GRAFT_GATE_KEEP_STORES:-}" ]; then
    rm -rf "$ROOT"/target/rec_store* "$ROOT"/target/dedup_index 2>/dev/null || true
  fi
  NEED_GB="${SPARK_GRAFT_GATE_NEED_GB:-$(need_gb_for "$q")}"
  AVAIL_GB=$(df -BG --output=avail "$ROOT/target" | tail -1 | tr -dc '0-9')
  if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
    echo "gate.sh: SKIP $q — ${AVAIL_GB} GB free < ${NEED_GB} GB needed at factor $FACTOR (per-family rule)" >&2
    echo "{\"gate_skip\":\"$q\",\"avail_gb\":$AVAIL_GB,\"need_gb\":$NEED_GB}" >> "$OUT"
    continue
  fi
  # launch stamp: the loadavg this process actually starts under —
  # a noisy row is visible in the artifact instead of needing a
  # hand re-measure (r15 verdict #1)
  LAUNCH_LOAD=$(cut -d' ' -f1 /proc/loadavg)
  STAMP="{\"gate_launch\":\"$q\",\"loadavg\":$LAUNCH_LOAD,\"settle_wait_s\":$SETTLE_WAIT,\"settle_timed_out\":$SETTLE_TIMED_OUT,\"avail_gb\":$AVAIL_GB,\"need_gb\":$NEED_GB}"
  echo "$STAMP" >> "$OUT"
  [ -n "$ARTIFACT" ] && echo "$STAMP" >> "$ARTIFACT"
  echo "gate.sh: per-query $q (factor $FACTOR$SUFFIX, ${AVAIL_GB} GB free, load $LAUNCH_LOAD)" >&2
  # one query's failure (ENOSPC, OOM) must not kill the sweep — record
  # it and move on; the next iteration's purge + disk check re-guard
  TMP=$(mktemp)
  if run_gate "$BASE" "$FACTOR" $FULLSTAR "$q" > "$TMP"; then
    cat "$TMP" >> "$OUT"; cat "$TMP"
    # the final schema row ({"query",factor,base_sec,scaled_sec,...})
    # also lands in the per-round artifact when one is named
    [ -n "$ARTIFACT" ] && { grep '"query":' "$TMP" >> "$ARTIFACT" || true; }
  else
    cat "$TMP" >> "$OUT"; cat "$TMP"
    echo "gate.sh: FAIL $q (see above) — continuing sweep" >&2
    echo "{\"gate_fail\":\"$q\"}" >> "$OUT"
    [ -n "$ARTIFACT" ] && echo "{\"gate_fail\":\"$q\"}" >> "$ARTIFACT"
  fi
  rm -f "$TMP"
done
echo "gate.sh: per-query sweep done — rows in $OUT${ARTIFACT:+, artifact $ARTIFACT}" >&2
