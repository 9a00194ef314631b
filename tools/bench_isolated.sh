#!/usr/bin/env bash
# Isolated per-query bench — THE round-over-round perf arbiter (round
# convention since r15; r14 measured the in-JVM battery's same-HEAD
# variance at ~11% warm, above typical round deltas): ONE FRESH JVM
# PER REP, 3 reps per query, MEDIAN of the per-rep warm seconds (each
# rep's warm is graft.Bench's min-of-3 in-JVM passes). The in-JVM
# battery (BENCH_FULL.json) remains the TOTALS artifact; per-query
# comparisons use this one. (Round-6 origin: the driver's in-suite run
# reported q86 at 7.28 s where a clean JVM measures ~1.6 s.)
#
# Usage: tools/bench_isolated.sh [sfDir] [query ...]
#   sfDir defaults to /root/testdata/sf0.1 (the driver's bench scale);
#   with no query list, audits the TOP-20 most expensive queries by
#   warm seconds in BENCH_FULL.json (fails if that artifact is absent
#   — regenerate it first with `runMain graft.Bench`).
#   REPS=<n> overrides the rep count (default 3).
#
# Runs graft.Bench via plain `java` against the compiled classes —
# `sbt Test/compile` (or `compile`) must have run first; this keeps a
# fresh-JVM rep at ~15 s instead of ~40 s of sbt launch overhead.
#
# Writes BENCH_ISOLATED.json: {query: median_isolated_warm_seconds}.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
shift || true
QUERIES=("$@")
REPS=${REPS:-3}
if [ ${#QUERIES[@]} -eq 0 ]; then
  # explicit guard: a python failure inside process substitution is
  # invisible to set -e, and an empty QUERIES would silently overwrite
  # BENCH_ISOLATED.json with an empty artifact
  if [ ! -f BENCH_FULL.json ]; then
    echo "[bench-isolated] BENCH_FULL.json missing - run 'runMain graft.Bench' first" >&2
    exit 2
  fi
  mapfile -t QUERIES < <(python3 - <<'EOF'
import json
d = json.load(open("BENCH_FULL.json"))
warm = d["queries_warm"]
for q in sorted(warm, key=lambda q: -warm[q])[:20]:
    print(q)
EOF
)
  if [ ${#QUERIES[@]} -eq 0 ]; then
    echo "[bench-isolated] no queries derived from BENCH_FULL.json" >&2
    exit 2
  fi
fi

if [ ! -f target/scala-2.13/classes/graft/Bench.class ]; then
  echo "[bench-isolated] compiled classes missing — run 'sbt compile' first" >&2
  exit 2
fi

JAVA_FLAGS=(--add-exports java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED)

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
for q in "${QUERIES[@]}"; do
  for rep in $(seq 1 "$REPS"); do
    echo "[bench-isolated] $q rep $rep/$REPS" >&2
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      SPARK_GRAFT_BENCH_OUT="$TMP/$q.rep$rep.json" \
      java "${JAVA_FLAGS[@]}" -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench "$q" >/dev/null 2>&1 || \
      echo "[bench-isolated] $q rep $rep FAILED" >&2
  done
done

python3 - "$TMP" "$SF" "$REPS" <<'EOF'
import json, os, statistics, sys
tmp, sf, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
per = {}
for f in sorted(os.listdir(tmp)):
    with open(os.path.join(tmp, f)) as fh:
        d = json.load(fh)
    for q, v in d.get("queries_warm", {}).items():
        per.setdefault(q, []).append(v)
out = {q: round(statistics.median(vs), 4) for q, vs in per.items()}
spread = {q: round(max(vs) - min(vs), 4) for q, vs in per.items()}
short = {q: len(vs) for q, vs in per.items() if len(vs) < reps}
artifact = {"metric": "isolated_warm_median", "unit": "sec", "sf": sf,
            "reps": reps, "queries_warm": out, "rep_spread": spread}
if short:
    artifact["incomplete"] = short
with open("BENCH_ISOLATED.json", "w") as fh:
    json.dump(artifact, fh, indent=1, sort_keys=True)
print(json.dumps(out, indent=1, sort_keys=True))
EOF
echo "[bench-isolated] wrote BENCH_ISOLATED.json" >&2
