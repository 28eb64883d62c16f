#!/bin/bash
# Round-11 PPJoin+ A/B for ngram_jaccard_banded at 50k Zipf docs — the
# wall-clock half of the verdict-#3 before/after evidence, measured
# same-box/same-session (r10's 44.4 s was a different box AND included
# the then-always-on in-op mass probe, so the committed r10 number is
# not a fair "before"). "Before" = the r10 composition (slack-2 prefix,
# per-row positional join predicate, distinct() + verify-every-pair),
# built from commit c6e47b7 in a worktree; "after" = HEAD. N fresh-JVM
# samples each, fast mode + JIT-settling gate, alternating so ambient
# drift hits both arms equally. The deterministic half (verify-input
# pair counts) comes from `graft.NgramProbe <dir> collapse`.
#
# Usage: tools/ab_jaccb_r11.sh <beforeClasses> <afterClasses> <corpusDir> <outJsonl> [n]
set -euo pipefail
BEFORE="$1"; AFTER="$2"; DIR="$3"; N="${5:-3}"
# resolve OUT before the cd below — a relative path would land inside
# the mktemp dir and be deleted by the EXIT trap (r11 ADVICE)
OUT=$(realpath -m "$4")
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
cd "$TMP"
: > "$OUT"
for i in $(seq 1 "$N"); do
  for arm in before after; do
    cls="$BEFORE"; [ "$arm" = after ] && cls="$AFTER"
    rm -f BENCH_local.json
    if GRAFT_CLASSES="$cls" SPARK_GRAFT_BENCH_FAST=1 SPARK_GRAFT_BENCH_JITGATE=1 \
       SPARK_GRAFT_SF_DIR="$DIR" SPARK_DRIVER_MEM=48g \
       /root/repo/tools/runmain.sh graft.Bench ngram_jaccard_banded \
         > "$TMP/out_${arm}_$i" 2>&1 && [ -s BENCH_local.json ]; then
      python3 -c "
import json
d=json.load(open('BENCH_local.json')); d['arm']='$arm'; d['sample']=$i
print(json.dumps(d))" >> "$OUT"
      echo "[ab_jaccb] $arm sample $i done" >&2
    else
      echo "[ab_jaccb] $arm sample $i FAILED" >&2
      tail -3 "$TMP/out_${arm}_$i" >&2 || true
    fi
  done
done
python3 - "$OUT" <<'EOF'
import json, statistics, sys
arms = {}
for line in open(sys.argv[1]):
    d = json.loads(line)
    arms.setdefault(d["arm"], []).append(d["queries"]["ngram_jaccard_banded"])
missing = [a for a in ("before", "after") if not arms.get(a)]
assert not missing, f"arm(s) with zero successful samples: {missing}"
for arm, ss in sorted(arms.items()):
    ss = sorted(ss)
    print(f"[ab_jaccb] {arm}: samples={[round(s,1) for s in ss]} "
          f"median={statistics.median(ss):.1f}")
EOF
