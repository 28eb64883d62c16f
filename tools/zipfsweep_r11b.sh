#!/bin/bash
# Round-11 Zipf-corpus sweep — tools/zipfsweep.sh generalized to take the
# query list from $ZIPF_QUERIES (space-separated). Two r11 uses:
#  1. ngram_jaccard_banded at 50k docs: before/after wall for the PPJoin+
#     match-count filter (r10 recorded 44.4 s median with the old
#     distinct()+verify-every-candidate composition);
#  2. ngram_containment_shingles at 1.35M docs: extend the measured-linear
#     claim from one decade (50k->450k) to 27x — the probe curve puts its
#     candidate mass at ~5e7 rows there, trivially feasible where the
#     char-gram tiers DNF.
# Protocol identical to r10's artifact: fresh JVM per (corpus, query),
# fast mode + JIT-settling gate + 1 cold-cache timed run, frozen classes,
# idle box. Partials append OUTSIDE the mktemp dir.
#
# Usage: ZIPF_QUERIES="q1 q2" tools/zipfsweep_r11.sh <outJson> <mem> <dir:docs> [dir:docs ...]
set -euo pipefail
OUT="$1"; MEM="$2"; shift 2
QUERIES="${ZIPF_QUERIES:?set ZIPF_QUERIES}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
SNAP="$TMP/classes"
cp -r /root/repo/target/scala-2.13/classes "$SNAP"
export GRAFT_CLASSES="$SNAP"
cd "$TMP"
PARTS="${OUT}.parts.jsonl"
: > "$PARTS"
for spec in "$@"; do
  dir="${spec%%:*}"; docs="${spec##*:}"
  for q in $QUERIES; do
    rm -f BENCH_local.json
    if SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_JITGATE="${ZIPF_JITGATE:-1}" \
       SPARK_GRAFT_SF_DIR="$dir" SPARK_DRIVER_MEM="$MEM" \
       /root/repo/tools/runmain.sh graft.Bench "$q" \
         > "$TMP/out_${docs}_$q" 2>&1 && [ -s BENCH_local.json ]; then
      python3 -c "
import json
d=json.load(open('BENCH_local.json')); d['docs']=int('$docs'); d['corpus']='$dir'
print(json.dumps(d))" >> "$PARTS"
      echo "[zipfsweep_r11] $docs $q done" >&2
    else
      echo "{\"docs\": $docs, \"corpus\": \"$dir\", \"queries\": {\"$q\": -1}}" >> "$PARTS"
      echo "[zipfsweep_r11] $docs $q FAILED (see $TMP/out_${docs}_$q)" >&2
      tail -3 "$TMP/out_${docs}_$q" >&2 || true
    fi
  done
done
export ZIPF_JITGATE="${ZIPF_JITGATE:-1}"
python3 - "$PARTS" "$OUT" "$MEM" <<'EOF'
import json, os, sys
rows = {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    r = rows.setdefault(d["docs"], {"docs": d["docs"], "corpus": d.get("corpus"),
                                    "queries": {}, "variance": {}})
    r["queries"].update(d.get("queries", {}))
    r["variance"].update(d.get("variance", {}))
out = {"metric": "zipf_ngram_sweep", "unit": "sec", "driver_mem": sys.argv[3],
       "corpus": "graft.ZipfCorpus vocab=2^18 zipf_s=1.05 seed=42",
       "protocol": "fresh-jvm per (corpus,query); fast mode + "
                   + ("jit gate (warmups until compile delta < 3s, max 4)"
                      if os.environ.get("ZIPF_JITGATE", "1") == "1"
                      else "1 plain warmup (no jit gate: on 10min-class runs "
                           "the warmup run itself settles the JIT and the "
                           "gate would quintuple the sweep's wall)")
                   + " + 1 cold-cache timed run; idle box, frozen classes",
       "rows": [rows[k] for k in sorted(rows)]}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2])
EOF
rm -f "$PARTS"
