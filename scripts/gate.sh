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
# free disk against the measured rule (per-query peak ~1.8 GB x
# factor; PLANS.md round-14 disk postmortem) — an under-provisioned
# query is SKIPPED with a message instead of ENOSPC-ing the sweep.
# Rows append to target/gate_perquery_f<factor>[_fullstar].jsonl.
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

if [ "${4:-}" != "--per-query" ] && ! printf '%s\n' "$@" | grep -qx -- '--per-query'; then
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
# measured per-query scratch peak (PLANS.md r14 disk postmortem):
# ~1.8 GB x factor, floor 20 GB — that constant is the REC-family
# bootstrap (the heaviest chain measured: 55–65 GB per query at 35x);
# lighter families (scan/star-join/sim: chunk A's ONE-process 50x run
# peaked ~70 GB for all seven queries together) can set
# SPARK_GRAFT_GATE_NEED_GB to their measured peak instead of
# over-skipping.
NEED_GB="${SPARK_GRAFT_GATE_NEED_GB:-$(( FACTOR * 18 / 10 ))}"
[ "$NEED_GB" -lt 20 ] && NEED_GB=20
FIRST=1
for q in "${QUERIES[@]}"; do
  # settle guard (round-15 postmortem: the preceding process's tens-
  # of-GB blockmgr churn inflated the NEXT query's timings — topk base
  # warm read 6.41 s mid-sweep vs 0.93 s settled): between processes,
  # wait for the 1-min load to drop below 4 (bounded at 5 min) so each
  # row is measured on a settled host, not in its neighbor's wake.
  if [ "$FIRST" -eq 0 ]; then
    for _ in $(seq 1 30); do
      LOAD=$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)
      [ "$LOAD" -lt 4 ] && break
      sleep 10
    done
  fi
  FIRST=0
  # reclaim the known cross-process leftovers BEFORE the disk check:
  # each gate session leaves one bucketed ratings table per dir, and
  # the rec/dedup persist queries leave their store dirs (6.5 GB at
  # 40x — the margin creep that ENOSPC'd the first topk re-measure);
  # every process rebuilds its own store, so purging is always safe
  rm -rf "$ROOT"/spark-warehouse/graft_ratings_* \
         "$ROOT"/target/rec_store* "$ROOT"/target/dedup_index 2>/dev/null || true
  AVAIL_GB=$(df -BG --output=avail "$ROOT/target" | tail -1 | tr -dc '0-9')
  if [ "$AVAIL_GB" -lt "$NEED_GB" ]; then
    echo "gate.sh: SKIP $q — ${AVAIL_GB} GB free < ${NEED_GB} GB needed at factor $FACTOR (rule: 1.8 GB x factor)" >&2
    echo "{\"gate_skip\":\"$q\",\"avail_gb\":$AVAIL_GB,\"need_gb\":$NEED_GB}" >> "$OUT"
    continue
  fi
  echo "gate.sh: per-query $q (factor $FACTOR$SUFFIX, ${AVAIL_GB} GB free)" >&2
  # one query's failure (ENOSPC, OOM) must not kill the sweep — record
  # it and move on; the next iteration's purge + disk check re-guard
  if ! run_gate "$BASE" "$FACTOR" $FULLSTAR "$q" | tee -a "$OUT"; then
    echo "gate.sh: FAIL $q (see above) — continuing sweep" >&2
    echo "{\"gate_fail\":\"$q\"}" >> "$OUT"
  fi
done
echo "gate.sh: per-query sweep done — rows in $OUT" >&2
