#!/bin/bash
# Per-query fresh-JVM scale sweep: runs graft.Bench once PER QUERY so each
# measurement starts from a clean heap/code-cache/cache-manager — the
# one-JVM 130-query sweep measures JVM wear as much as the operator at
# 10x data (measured: ngram_containment_banded 154.8 s mid-sweep vs
# 40-54 s in a fresh JVM on the same data). Fast mode (1 warm + 1 timed)
# per query; quadratic oracle twins skipped via the scale tier flag.
#
# The artifact records WHICH queries the scale tier excluded: the skip
# list is full-inventory minus scale-inventory, computed HERE — the
# per-query Bench runs never see the excluded names, so their own
# `skipped` fields are empty and a union of them under-reports (the
# round-6 artifacts' silent-cap bug).
#
# Usage: tools/sweep.sh <sfDir> <outJson> [driverMem]
set -euo pipefail
SF="$1"; OUT="$2"; MEM="${3:-8g}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
cd "$TMP"
list() { # $1 = tier ("" or "scale")
  SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_TIER="$1" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_DRIVER_MEM=2g \
    /root/repo/tools/runmain.sh graft.Bench --list 2>/dev/null | tr ',' '\n'
}
list ""      | sort > "$TMP/full.txt"
list "scale" | sort > "$TMP/scale.txt"
comm -23 "$TMP/full.txt" "$TMP/scale.txt" > "$TMP/skipped.txt"
: > "$TMP/parts.jsonl"
while read -r q; do
  # a leftover record from the previous query must not be re-counted when
  # this run's best-effort write fails (the write is try/catch-swallowed,
  # so exit 0 does not imply the file is fresh)
  rm -f BENCH_local.json
  if SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_TIER=scale \
     SPARK_GRAFT_SF_DIR="$SF" SPARK_DRIVER_MEM="$MEM" \
     /root/repo/tools/runmain.sh graft.Bench "$q" >/dev/null 2>"$TMP/err_$q" \
     && [ -s BENCH_local.json ]; then
    cat BENCH_local.json >> "$TMP/parts.jsonl"
  else
    echo "[sweep] $q FAILED" >&2
  fi
done < "$TMP/scale.txt"
python3 - "$TMP/parts.jsonl" "$OUT" "$SF" "$MEM" "$TMP/skipped.txt" <<'EOF'
import json, sys
qs, vari = {}, {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    qs.update(d["queries"]); vari.update(d.get("variance", {}))
skipped = sorted(q.strip() for q in open(sys.argv[5]) if q.strip())
total = sum(v for v in qs.values() if v >= 0)
out = {"metric": "total", "value": round(total, 3), "unit": "sec",
       "sf": sys.argv[3], "driver_mem": sys.argv[4],
       "protocol": "fresh-jvm-per-query, fast mode",
       "skipped": skipped, "variance": vari, "queries": qs}
json.dump(out, open(sys.argv[2], "w"), indent=1)
print("wrote", sys.argv[2], len(qs), "queries, total %.1fs," % total,
      "skipped:", ",".join(skipped) or "none")
EOF
