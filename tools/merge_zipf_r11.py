#!/usr/bin/env python3
"""Merge the round-11 Zipf sweep partials + the NgramProbe log into the
round's single artifact, BENCH_zipf_ngram_r11.json — same shape as
BENCH_zipf_ngram_r10.json so cross-round reads line up.

Usage: python3 tools/merge_zipf_r11.py <probeLog> <outJson> <partJson...>
"""
import json
import sys

probe_log, out_path = sys.argv[1], sys.argv[2]
parts = sys.argv[3:]

rows = {}


def fold(r):
    m = rows.setdefault(r["docs"], {"docs": r["docs"], "queries": {},
                                    "variance": {}})
    m["queries"].update(r.get("queries", {}))
    m["variance"].update(r.get("variance", {}))


for p in parts:
    with open(p) as f:
        if p.endswith(".jsonl"):  # a killed invocation's partials
            for line in f:
                fold(json.loads(line))
        else:
            for r in json.load(f)["rows"]:
                fold(r)

probes = {}
for line in open(probe_log):
    if not line.startswith("[ngramprobe]"):
        continue
    _, corpus, name, rest = line.split(" ", 3)
    tier = corpus.rstrip("/").rsplit("/", 1)[-1]
    probes.setdefault(tier, {})[name] = rest.strip()

out = {
    "metric": "zipf_ngram_sweep",
    "unit": "sec",
    "driver_mem": "48-64g",
    "corpus": "graft.ZipfCorpus vocab=2^18 zipf_s=1.05 seed=42 "
              "(50k/150k/450k/1350k docs)",
    "protocol": "fresh-jvm per (corpus,query); fast mode + jit gate "
                "(warmups until compile delta < 3s, max 4) + 1 cold-cache "
                "timed run; idle box, frozen classes",
    "notes": {},  # filled by hand after reading the runs
    "probes_exact_candidate_pre_counts": probes,
    "rows": [rows[k] for k in sorted(rows)],
}
json.dump(out, open(out_path, "w"), indent=1)
print("wrote", out_path, "docs tiers:", sorted(rows),
      "probe tiers:", sorted(probes))
