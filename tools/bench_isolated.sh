#!/usr/bin/env bash
# Isolated per-query bench: ONE FRESH JVM PER QUERY — the
# contention-free reference the in-suite BENCH numbers are audited
# against (round-6 verdict: the driver's in-suite run reported q86 at
# 7.28 s where a clean JVM measures ~1.6 s; min-of-3 inside one long
# suite run does not defend against sustained box load or cross-query
# JVM state).
#
# Usage: tools/bench_isolated.sh [sfDir] [query ...]
#   sfDir defaults to /root/testdata/sf0.1 (the driver's bench scale);
#   with no query list, audits the suite's historically noisiest
#   queries plus the most expensive plans.
#
# Writes BENCH_ISOLATED.json: {query: isolated_warm_seconds} (min of 3
# passes inside the fresh JVM, same discipline as graft.Bench).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.1}
shift || true
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(
    q86_substring_dup_coverage q62_winnowing_fingerprint
    q67_decontaminate q66_minhash_udaf q78_tfidf
    q94_ngram_novelty q88_lm_doc_score q85_dedup_apply
    q38_simhash_pairs q22_ngram_blocked_jaccard
    q100_curation_pipeline q82_bigram_lm q96_textrank
  )
fi

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
for q in "${QUERIES[@]}"; do
  echo "[bench-isolated] $q" >&2
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    SPARK_GRAFT_BENCH_OUT="$TMP/$q.json" \
    sbt -batch "runMain graft.Bench $q" >/dev/null 2>&1 || \
    echo "[bench-isolated] $q FAILED" >&2
done

python3 - "$TMP" "$SF" <<'EOF'
import json, os, sys
tmp, sf = sys.argv[1], sys.argv[2]
out = {}
for f in sorted(os.listdir(tmp)):
    with open(os.path.join(tmp, f)) as fh:
        d = json.load(fh)
    out.update(d.get("queries_warm", {}))
artifact = {"metric": "isolated_warm", "unit": "sec", "sf": sf,
            "queries_warm": out}
with open("BENCH_ISOLATED.json", "w") as fh:
    json.dump(artifact, fh, indent=1, sort_keys=True)
print(json.dumps(artifact["queries_warm"], indent=1, sort_keys=True))
EOF
echo "[bench-isolated] wrote BENCH_ISOLATED.json" >&2
