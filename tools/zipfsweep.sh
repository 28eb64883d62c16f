#!/bin/bash
# Realistic-vocabulary (Zipf, 2^18-word vocab) scale sweep for the ngram
# dedup family — the round-9 verdict's evidence gap: the dense synthetic
# ScaleData corpus (31 distinct words at sf0.1) is the worst case for
# prefix filtering, so slopes measured there say nothing about the banded
# tier's design regime. graft.ZipfCorpus generates the corpora; this
# script runs each ngram query in a FRESH JVM per (corpus, query) with
# the fast protocol + the r10 JIT-settling gate, and folds the per-run
# records into one artifact with per-corpus doc counts so slope reads
# directly.
#
# Usage: tools/zipfsweep.sh <outJson> <mem> <dir:docs> [dir:docs ...]
set -euo pipefail
OUT="$1"; MEM="$2"; shift 2
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
cd "$TMP"
QUERIES="ngram_jaccard_banded ngram_containment_banded ngram_containment_shingles"
: > "$TMP/parts.jsonl"
for spec in "$@"; do
  dir="${spec%%:*}"; docs="${spec##*:}"
  for q in $QUERIES; do
    rm -f BENCH_local.json
    if SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_JITGATE=1 \
       SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$MEM" \
       /root/repo/tools/runmain.sh graft.Bench "$q" \
         > "$TMP/out_${docs}_$q" 2>&1 && [ -s BENCH_local.json ]; then
      python3 -c "
import json,sys
d=json.load(open('BENCH_local.json')); d['docs']=int('$docs'); d['corpus']='$dir'
print(json.dumps(d))" >> "$TMP/parts.jsonl"
      echo "[zipfsweep] $docs $q done" >&2
    else
      echo "{\"docs\": $docs, \"corpus\": \"$dir\", \"queries\": {\"$q\": -1}}" >> "$TMP/parts.jsonl"
      echo "[zipfsweep] $docs $q FAILED (see $TMP/out_${docs}_$q)" >&2
      tail -3 "$TMP/out_${docs}_$q" >&2 || true
    fi
  done
done
python3 - "$TMP/parts.jsonl" "$OUT" "$MEM" <<'EOF'
import json, sys
rows = {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    r = rows.setdefault(d["docs"], {"docs": d["docs"], "corpus": d.get("corpus"),
                                    "queries": {}, "variance": {}})
    r["queries"].update(d.get("queries", {}))
    r["variance"].update(d.get("variance", {}))
out = {"metric": "zipf_ngram_sweep", "unit": "sec", "driver_mem": sys.argv[3],
       "corpus": "graft.ZipfCorpus vocab=2^18 zipf_s=1.05 seed=42",
       "protocol": "fresh-jvm per (corpus,query); fast mode + jit gate "
                   "(warmups until compile delta < 3s, max 4) + 1 cold-cache timed run",
       "rows": [rows[k] for k in sorted(rows)]}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2])
EOF
