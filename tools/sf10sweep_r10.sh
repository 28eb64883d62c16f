#!/bin/bash
# Round-10 sf10 stabilization + new-row sweep (r9 verdict #2/#4/#6):
#  - the 4 minhash/CC rows that carried 4-6x fresh-JVM spread under the
#    1-warmup fast protocol re-measured with SPARK_GRAFT_BENCH_JITGATE=1
#    (warmups repeat until the JIT compile-time delta settles < 3s, max
#    4), 3 fresh JVMs each -> the artifact records all samples and the
#    spread, target <= 2x;
#  - the round-10 rows at sf10: emb_ivf_build (one-time index cost,
#    1 JVM), emb_ivf_query (amortized query path, 3 JVMs — the first
#    JVM's warmup builds the index, every later run/JVM REUSES it from
#    disk), q15_exact_scalable (the ~linear exact-percentile path,
#    1 JVM — its contrast row q15_dist measured 108.6s in r9).
#
# Usage: tools/sf10sweep_r10.sh <sfDir> <outJson> [mem]
set -euo pipefail
SF="$1"; OUT="$2"; MEM="${3:-96g}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
# freeze classes so a recompile can't hand a half-written class file to
# a later per-query JVM (see tools/runmain.sh)
cp -r /root/repo/target/scala-2.13/classes "$TMP/classes"
export GRAFT_CLASSES="$TMP/classes"
cd "$TMP"
run_q() { # $1 = query, $2 = sample tag
  rm -f BENCH_local.json
  if SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_JITGATE=1 \
     SPARK_GRAFT_SF_DIR="$SF" SPARK_DRIVER_MEM="$MEM" \
     /root/repo/tools/runmain.sh graft.Bench "$1" \
       > "$TMP/out_$1_$2" 2>&1 && [ -s BENCH_local.json ]; then
    python3 -c "
import json
d=json.load(open('BENCH_local.json')); d['sample']='$2'; d['q']='$1'
print(json.dumps(d))" >> "$TMP/parts.jsonl"
    echo "[sf10sweep] $1 sample $2 done" >&2
  else
    echo "{\"q\": \"$1\", \"sample\": \"$2\", \"queries\": {\"$1\": -1}}" >> "$TMP/parts.jsonl"
    echo "[sf10sweep] $1 sample $2 FAILED" >&2; tail -3 "$TMP/out_$1_$2" >&2 || true
  fi
}
: > "$TMP/parts.jsonl"
for q in doc_split_safe dedup_corpus_best dedup_clusters minhash_lsh_pairs emb_ivf_query; do
  for s in 1 2 3; do run_q "$q" "$s"; done
done
for q in emb_ivf_build q15_exact_scalable; do run_q "$q" 1; done
python3 - "$TMP/parts.jsonl" "$OUT" "$SF" "$MEM" <<'EOF'
import json, sys
samples, meta = {}, {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    q = d["q"]
    samples.setdefault(q, []).append(d["queries"].get(q, -1))
    if "variance" in d and q in d.get("variance", {}):
        meta.setdefault(q, []).append(d["variance"][q])
rows = {}
spread = {}
for q, ss in samples.items():
    ok = sorted(x for x in ss if x >= 0)
    rows[q] = ok[len(ok)//2] if ok else -1
    if len(ok) >= 2 and ok[0] > 0:
        spread[q] = round(ok[-1] / ok[0], 2)
out = {"metric": "total", "value": round(sum(v for v in rows.values() if v >= 0), 3),
       "unit": "sec", "sf": sys.argv[3], "driver_mem": sys.argv[4],
       "protocol": "v3 fresh-jvm-per-query, fast mode + JIT-settling gate "
                   "(warmups until compile delta < 3s, max 4), 32 shuffle partitions, frozen classes",
       "samples_per_query": {q: ss for q, ss in samples.items()},
       "spread_max_over_min": spread,
       "per_run_diagnostics": meta,
       "queries": rows}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2], {q: rows[q] for q in rows}, "spread:", spread)
EOF
