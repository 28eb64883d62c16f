#!/bin/bash
# Round-10 attribution of the r9 ambient drift (VERDICT r9 "What's wrong"
# #3): doc_ccnet_buckets (1.90 -> 2.73 s) and corpus_prepared
# (0.97 -> 1.69 s) moved r8 -> r9 with ZERO source changes and tight
# variance — the same contamination class as r8's false doc_split_safe
# flag. Re-measure exactly those rows plus two stable same-family
# controls (corpus_stats, doc_gopher_filter) and corpus_prepared_best,
# on an idle box, full stability protocol (the protocol the committed
# artifacts used), TWO fresh JVMs to see run-to-run placement.
#
# Usage: tools/driftcheck_r10.sh <outJson>
set -euo pipefail
OUT="$1"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
cp -r /root/repo/target/scala-2.13/classes "$TMP/classes"
export GRAFT_CLASSES="$TMP/classes"
cd "$TMP"
QS="doc_ccnet_buckets corpus_prepared corpus_prepared_best corpus_stats doc_gopher_filter"
: > "$TMP/parts.jsonl"
for s in 1 2; do
  rm -f BENCH_local.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=8g \
    /root/repo/tools/runmain.sh graft.Bench $QS > "$TMP/out_$s" 2>&1
  python3 -c "
import json
d=json.load(open('BENCH_local.json')); d['jvm']=$s
print(json.dumps(d))" >> "$TMP/parts.jsonl"
  echo "[driftcheck] jvm $s done" >&2
done
python3 - "$TMP/parts.jsonl" "$OUT" <<'EOF'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1])]
r8 = {"doc_ccnet_buckets": 1.90, "corpus_prepared": 0.97}
r9 = {"doc_ccnet_buckets": 2.73, "corpus_prepared": 1.69,
      "corpus_prepared_best": 0.86, "corpus_stats": 0.40,
      "doc_gopher_filter": None}
out = {"metric": "drift_attribution", "unit": "sec",
       "sf": "/root/testdata/sf0.1",
       "protocol": "v3 single-jvm explicit-list; stability-gated warmup, "
                   "median-of-3 (best-3-of-6 on spread); idle box; 2 fresh JVMs",
       "committed_r8": r8, "committed_r9": r9,
       "jvms": [{"jvm": r["jvm"], "queries": r["queries"],
                 "variance": r.get("variance", {})} for r in runs]}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2])
for r in runs:
    print("jvm", r["jvm"], {q: r["queries"].get(q) for q in
          ["doc_ccnet_buckets", "corpus_prepared", "corpus_prepared_best",
           "corpus_stats", "doc_gopher_filter"]})
EOF
