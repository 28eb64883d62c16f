#!/bin/bash
# Round-11 sf10 true-up (r10 verdict #1): the two rows whose spread/median
# were left open in r10, re-measured with MORE fresh JVMs under the same
# JIT-settling protocol of record (tools/sf10sweep_r10.sh):
#  - dedup_corpus_best: r9 median 30.7 s vs r10 49.0 s with a 2.01x
#    spread — 5 JVMs to settle which class the median belongs to;
#  - minhash_lsh_pairs: 2.61x spread in r10 (one residual compile burst)
#    — 5 JVMs toward the <= 2x target;
#  - emb_ivf_query: 3 JVMs to confirm the round-11 manifest verification
#    (one FS read + two tiny parquet counts per query) did not move the
#    amortized path's median/spread.
#
# Usage: tools/sf10sweep_r11.sh <sfDir> <outJson> [mem]
set -euo pipefail
SF="$1"; OUT="$2"; MEM="${3:-96g}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
cp -r /root/repo/target/scala-2.13/classes "$TMP/classes"
export GRAFT_CLASSES="$TMP/classes"
cd "$TMP"
PARTS="${SF%/}.sf10sweep_r11.parts.jsonl"   # outside the trap-wiped tmp dir
: > "$PARTS"
run_q() { # $1 = query, $2 = sample tag
  rm -f BENCH_local.json
  if SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_JITGATE=1 \
     SPARK_GRAFT_SF_DIR="$SF" SPARK_DRIVER_MEM="$MEM" \
     /root/repo/tools/runmain.sh graft.Bench "$1" \
       > "$TMP/out_$1_$2" 2>&1 && [ -s BENCH_local.json ]; then
    python3 -c "
import json
d=json.load(open('BENCH_local.json')); d['sample']='$2'; d['q']='$1'
print(json.dumps(d))" >> "$PARTS"
    echo "[sf10sweep_r11] $1 sample $2 done" >&2
  else
    echo "{\"q\": \"$1\", \"sample\": \"$2\", \"queries\": {\"$1\": -1}}" >> "$PARTS"
    echo "[sf10sweep_r11] $1 sample $2 FAILED" >&2; tail -3 "$TMP/out_$1_$2" >&2 || true
  fi
}
for q in dedup_corpus_best minhash_lsh_pairs; do
  for s in 1 2 3 4 5; do run_q "$q" "$s"; done
done
for s in 1 2 3; do run_q emb_ivf_query "$s"; done
python3 - "$PARTS" "$OUT" "$SF" "$MEM" <<'EOF'
import json, sys
samples, meta = {}, {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    q = d["q"]
    samples.setdefault(q, []).append(d["queries"].get(q, -1))
    if "variance" in d and q in d.get("variance", {}):
        meta.setdefault(q, []).append(d["variance"][q])
rows, spread = {}, {}
for q, ss in samples.items():
    ok = sorted(x for x in ss if x >= 0)
    rows[q] = ok[len(ok)//2] if ok else -1
    if len(ok) >= 2 and ok[0] > 0:
        spread[q] = round(ok[-1] / ok[0], 2)
out = {"metric": "total", "value": round(sum(v for v in rows.values() if v >= 0), 3),
       "unit": "sec", "sf": sys.argv[3], "driver_mem": sys.argv[4],
       "protocol": "v3 fresh-jvm-per-query, fast mode + JIT-settling gate "
                   "(warmups until compile delta < 3s, max 4), 32 shuffle partitions, frozen classes",
       "samples_per_query": samples,
       "spread_max_over_min": spread,
       "per_run_diagnostics": meta,
       "queries": rows}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2], rows, "spread:", spread)
EOF
rm -f "$PARTS"
