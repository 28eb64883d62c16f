#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [outJson]

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the same
parquet tables, sorts columns by name and rows by value, and compares.
With [outJson], also writes a driver-shaped per-query record
({rows_match, schema_match, hash_match, spark_rows, oracle_rows, err}) —
used for the committed above-sf0.01 gate artifacts (CORRECTNESS_sf01_r*).
Driver-side python only (duckdb/pyarrow/pandas) — never imported by the
Scala library.
"""
import glob
import json
import math
import os
import sys
import threading
import time
import zlib

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def oracle_doc_compress(con):
    """Python-side oracle for the one query DuckDB can't express: the
    deflate compression-ratio quality signal. Java's Deflater(BEST_SPEED)
    and CPython's zlib.compress(raw, 1) emit byte-identical streams (both
    are zlib, level 1, wbits 15, memLevel 8 — verified 500/500 docs at
    sf0.01), so the compressed LENGTH is an exact oracle. The only twin
    subtlety is rounding: Java Math.round is half-UP, Python round() is
    banker's — use floor(x+0.5) to mirror Java.
    """
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    out = []
    for did, text in rows:
        raw = text.encode("utf-8")
        n = len(zlib.compress(raw, 1))
        ratio = math.floor(n / max(len(raw), 1) * 10000 + 0.5) / 10000.0
        out.append({"doc_id": did, "n_bytes": len(raw), "deflate_ratio": ratio})
    return out


def _bpe_learn(con, merges=8):
    """Shared BPE reference (Sennrich 2016): word counts over normText
    tokens, then per round count adjacent symbol pairs (overlapping
    positions, weighted by word frequency), take the (count desc, left
    asc, right asc) arg-max, and rewrite every word by the greedy
    leftmost non-overlapping fold — the exact algorithm
    TextOps.docBpeTrain distributes. Returns (merge rows, word → final
    symbol sequence dict).
    """
    import re
    from collections import Counter

    wc = Counter()
    for (text,) in con.execute("SELECT text FROM documents").fetchall():
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        for w in norm.split(" "):
            if w:
                wc[w] += 1
    vocab = {w: list(w) for w in wc}
    out = []
    for rank in range(1, merges + 1):
        pc = Counter()
        for w, seq in vocab.items():
            c = wc[w]
            for i in range(len(seq) - 1):
                pc[(seq[i], seq[i + 1])] += c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append({"rank": rank, "left": l, "right": r,
                    "merged": l + r, "pair_count": cnt})

        def apply(seq):
            acc = []
            for x in seq:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = l + r
                else:
                    acc.append(x)
            return acc

        vocab = {w: apply(s) for w, s in vocab.items()}
    return out, vocab


def oracle_doc_bpe_train(con, merges=8):
    return _bpe_learn(con, merges)[0]


def oracle_doc_bpe_apply(con, merges=8):
    """Apply the learned merges back to every document (the word → final
    symbol sequence map IS the chained application) and count words,
    post-BPE symbols, and alphabetic chars per doc — the exact integers
    TextOps.docBpeApply emits.
    """
    import re

    _, vocab = _bpe_learn(con, merges)
    out = []
    for did, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        words = [w for w in norm.split(" ") if w]
        out.append({"doc_id": did, "n_tok": len(words),
                    "n_sym": sum(len(vocab[w]) for w in words),
                    "n_alpha": sum(len(w) for w in words)})
    return out


def oracle_doc_pack_ffd(con, cap=2048, shards=32):
    """From-scratch Python reference for first-fit-decreasing sequence
    packing — the exact algorithm SampleOps.docPackFfd distributes: shard
    by md5('ffd|'+doc_id) % shards, sort each shard (n_tok desc, doc_id
    asc), first-fit into cap-token bins (oversize docs open a bin of
    their own and nothing else joins them).
    """
    import hashlib
    import re

    per_shard = {}
    for did, text in con.execute("SELECT doc_id, text FROM documents").fetchall():
        norm = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
        n_tok = len(norm.split(" "))
        h = int(hashlib.md5(f"ffd|{did}".encode()).hexdigest()[:8], 16)
        per_shard.setdefault(h % shards, []).append((did, n_tok))
    out = []
    for shard, items in per_shard.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        fills = []
        for did, n in items:
            for i, f in enumerate(fills):
                if f + n <= cap:
                    fills[i] += n
                    bin_id = i
                    break
            else:
                fills.append(n)
                bin_id = len(fills) - 1
            out.append({"doc_id": did, "shard": shard, "bin": bin_id,
                        "n_tok": n})
    return out


# Set by main() to the run's oracle_sql.json map — composite Python
# oracles reuse the committed SQL of their component stages instead of
# duplicating it here.
ORACLE_SQL = {}


def oracle_corpus_release(con, cap=2048, shards=32):
    """Composite reference for the full release pipeline: the survivor set
    and the leakage-safe split are the EXISTING DuckDB oracles
    (corpus_prepared_best, doc_split_safe) run verbatim; the per-
    (split, shard) FFD packing is the same pure algorithm as
    oracle_doc_pack_ffd with the 'rel|' shard salt. Requires both
    component SQL entries in the run's oracle_sql.json (subset verify
    runs must include them).
    """
    import hashlib

    for dep in ("corpus_prepared_best", "doc_split_safe"):
        if dep not in ORACLE_SQL:
            raise RuntimeError(f"corpus_release oracle needs {dep} SQL in this run")
    surv = con.execute(ORACLE_SQL["corpus_prepared_best"]).fetch_df()
    split = con.execute(ORACLE_SQL["doc_split_safe"]).fetch_df()
    split_of = dict(zip(split["doc_id"], split["split"]))
    groups = {}
    for did, n_tok in zip(surv["doc_id"], surv["n_tok"]):
        h = int(hashlib.md5(f"rel|{did}".encode()).hexdigest()[:8], 16)
        groups.setdefault((split_of[did], h % shards), []).append((int(did), int(n_tok)))
    out = []
    for (sp, shard), items in groups.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        fills = []
        for did, n in items:
            for i, f in enumerate(fills):
                if f + n <= cap:
                    fills[i] += n
                    bin_id = i
                    break
            else:
                fills.append(n)
                bin_id = len(fills) - 1
            out.append({"doc_id": did, "split": sp, "shard": shard,
                        "bin": bin_id, "n_tok": n})
    return out


def oracle_ev_attribution_markov(con):
    """From-scratch reference for Markov removal-effect attribution,
    mirroring EventOps.evAttributionMarkov op for op: per-user journeys
    ordered by (ts, event_id) truncated at the first purchase (CONV) or
    terminated with NULL, first-order transition counts, absorption
    probability via Gaussian elimination in the SAME fixed order, removal
    effect 1 - a_c/a, attribution normalized to observed conversions.
    """
    from collections import defaultdict
    from decimal import Decimal, ROUND_HALF_UP

    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type FROM events "
        "ORDER BY user_id, epoch_us(ts), event_id").fetchall()
    counts = defaultdict(int)
    journeys = defaultdict(list)
    for uid, _, _, et in rows:
        journeys[uid].append("CONV" if et == "purchase" else et)
    for seq in journeys.values():
        kept = []
        for s in seq:
            kept.append(s)
            if s == "CONV":
                break
        prev = "START"
        for s in kept:
            counts[(prev, s)] += 1
            prev = s
        if kept[-1] != "CONV":
            counts[(kept[-1], "NULL")] += 1

    channels = sorted({x for k in counts for x in k
                       if x not in ("START", "CONV", "NULL")})
    conv_total = sum(n for (s, d), n in counts.items() if d == "CONV")
    out_total = defaultdict(int)
    for (s, _), n in counts.items():
        out_total[s] += n

    def p(s, d):
        t = out_total.get(s, 0)
        return counts.get((s, d), 0) / t if t else 0.0

    def absorb(states):
        n = len(states)
        a = [[(1.0 if i == j else 0.0) - p(states[i], states[j])
              for j in range(n)] + [p(states[i], "CONV")] for i in range(n)]
        for k in range(n):
            piv = a[k][k]
            for i in range(k + 1, n):
                f = a[i][k] / piv
                for j in range(k, n + 1):
                    a[i][j] = a[i][j] - f * a[k][j]
        x = [0.0] * n
        for i in range(n - 1, -1, -1):
            s = a[i][n]
            for j in range(i + 1, n):
                s = s - a[i][j] * x[j]
            x[i] = s / a[i][i]
        return x[0]

    def r(x, places):
        return float(Decimal(repr(x)).quantize(Decimal(places), ROUND_HALF_UP))

    # mirrored zero guards: no conversions / zero base absorption / zero
    # total removal effect all yield an EMPTY result, not NaN rows
    if conv_total == 0 or not channels:
        return []
    base = absorb(["START"] + channels)
    if not base > 0.0:
        return []
    re = [(c, 1.0 - absorb(["START"] + [d for d in channels if d != c]) / base)
          for c in channels]
    re_sum = sum(v for _, v in re)
    if re_sum == 0.0:
        return []
    return [{"channel": c, "removal_effect": r(v, "0.000001"),
             "attribution": r(conv_total * v / re_sum, "0.0001")}
            for c, v in re]


def oracle_ev_pagerank(con):
    """From-scratch reference for PageRank over the event-type transition
    graph, mirroring EventOps.evPagerank op for op: consecutive-event
    (src, dst) counts per user ordered by (ts, event_id), 30 power
    iterations at damping 0.85 with uniform dangling redistribution, the
    scatter loop in the SAME sorted-node fixed order.
    """
    from collections import defaultdict
    from decimal import Decimal, ROUND_HALF_UP

    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_id, event_type FROM events "
        "ORDER BY user_id, epoch_us(ts), event_id").fetchall()
    counts = defaultdict(int)
    prev_uid, prev_et = None, None
    for uid, _, _, et in rows:
        if uid == prev_uid:
            counts[(prev_et, et)] += 1
        prev_uid, prev_et = uid, et

    nodes = sorted({x for k in counts for x in k})
    n = len(nodes)
    out_total = defaultdict(int)
    in_total = defaultdict(int)
    for (s, d), c in counts.items():
        out_total[s] += c
        in_total[d] += c

    damp = 0.85
    pr = [1.0 / n] * n
    for _ in range(30):
        nxt = [0.0] * n
        for i in range(n):
            t = out_total.get(nodes[i], 0)
            if t == 0:
                for j in range(n):
                    nxt[j] += pr[i] / n
            else:
                for j in range(n):
                    c = counts.get((nodes[i], nodes[j]), 0)
                    if c != 0:
                        nxt[j] += pr[i] * (c / t)
        pr = [(1.0 - damp) / n + damp * nxt[j] for j in range(n)]

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                                ROUND_HALF_UP))

    return [{"state": s, "pagerank": r6(pr[i]),
             "in_n": in_total.get(s, 0), "out_n": out_total.get(s, 0)}
            for i, s in enumerate(nodes)]


def _round_half_up_int(x):
    """Mirror of Spark's round(double) for scale 0: BigDecimal.valueOf
    (Double.toString, = Python repr — both shortest round-trip) then
    HALF_UP. Banker's-rounding Python round() diverges on .5 ties."""
    from decimal import Decimal, ROUND_HALF_UP
    return int(Decimal(repr(x)).quantize(Decimal(1), ROUND_HALF_UP))


def _jacobi_eigen(m):
    """Op-for-op mirror of VectorOps.jacobiEigen (cyclic Jacobi, fixed
    sweep order, 1e-18 threshold, eigenvalue-desc order with index
    tie-break, largest-|component|-positive sign canon). Only +,-,*,/ and
    sqrt — every operation is correctly-rounded IEEE double in both
    runtimes, so the eigendecomposition is BIT-identical, not just close.
    """
    d = len(m)
    a = [row[:] for row in m]
    v = [[1.0 if r == c else 0.0 for c in range(d)] for r in range(d)]
    sweep, off = 0, float("inf")
    while sweep < 100 and off > 1e-18:
        off = 0.0
        for p in range(d):
            for qi in range(p + 1, d):
                off = max(off, abs(a[p][qi]))
                if abs(a[p][qi]) > 1e-18:
                    theta = (a[qi][qi] - a[p][p]) / (2.0 * a[p][qi])
                    if theta == 0.0:
                        t = 1.0
                    else:
                        s_ = 1.0 if theta > 0 else -1.0
                        t = s_ / (abs(theta) + math.sqrt(theta * theta + 1.0))
                    c = 1.0 / math.sqrt(t * t + 1.0)
                    s = t * c
                    for k in range(d):
                        akp, akq = a[k][p], a[k][qi]
                        a[k][p] = c * akp - s * akq
                        a[k][qi] = s * akp + c * akq
                    for k in range(d):
                        apk, aqk = a[p][k], a[qi][k]
                        a[p][k] = c * apk - s * aqk
                        a[qi][k] = s * apk + c * aqk
                    for k in range(d):
                        vkp, vkq = v[k][p], v[k][qi]
                        v[k][p] = c * vkp - s * vkq
                        v[k][qi] = s * vkp + c * vkq
        sweep += 1
    order = sorted(range(d), key=lambda i: (-a[i][i], i))
    vals = [a[i][i] for i in order]
    vecs = []
    for i in order:
        w = [v[r][i] for r in range(d)]
        mx = max(range(d), key=lambda k: (abs(w[k]), -k))
        vecs.append([-x for x in w] if w[mx] < 0 else w)
    return vals, vecs


def _pca_fit(con, dims=64):
    """Mirror of VectorOps.pcaFitOf: exact BIGINT milli-grid moments
    (computed in DuckDB — the oracle-green emb_cov quantization), then
    the Scala finalization IEEE sequence, then the Jacobi mirror."""
    mom = con.execute(
        "WITH q AS (SELECT list_transform(embedding, "
        "  x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS vq FROM embeddings) "
        "SELECT i, j, CAST(sum(vq[i + 1] * vq[j + 1]) AS BIGINT) "
        f"FROM q, generate_series(0, {dims - 1}) g1(i), "
        f"     generate_series(0, {dims - 1}) g2(j) "
        "WHERE i <= j GROUP BY i, j").fetchall()
    sums = con.execute(
        "WITH q AS (SELECT list_transform(embedding, "
        "  x -> CAST(round(x::DOUBLE * 1000) AS BIGINT)) AS vq FROM embeddings) "
        "SELECT i, CAST(sum(vq[i + 1]) AS BIGINT) "
        f"FROM q, generate_series(0, {dims - 1}) g(i) GROUP BY i").fetchall()
    n = float(con.execute("SELECT count(*) FROM embeddings").fetchone()[0])
    s = [0] * dims
    for i, si in sums:
        s[i] = si
    m = [[0.0] * dims for _ in range(dims)]
    for i, j, sij in mom:
        c = (float(sij) - float(s[i]) * float(s[j]) / n) / n / 1000000.0
        m[i][j] = c
        m[j][i] = c
    means = [float(s[i]) / n / 1000.0 for i in range(dims)]
    vals, vecs = _jacobi_eigen(m)
    return means, vals, vecs


def _pca_apply(con, whiten, k=8, dims=64):
    """Mirror of VectorOps.pcaApply: the same left fold
    acc += (double(x_i) - mean_i) * (vec_i * scale) in index order —
    float32→double widening is exact, the Scala literals round-trip via
    Double.toString (= repr), so every p value is bit-identical."""
    means, vals, vecs = _pca_fit(con, dims)
    weights = []
    for c in range(k):
        if not whiten:
            scale = 1.0
        elif vals[c] > 0:
            scale = 1.0 / math.sqrt(vals[c])
        else:
            scale = 0.0
        weights.append([w * scale for w in vecs[c]])
    out = []
    for vec_id, emb in con.execute(
            "SELECT vec_id, embedding FROM embeddings").fetchall():
        row = {"vec_id": vec_id}
        for c in range(k):
            wc = weights[c]
            acc = 0.0
            for i in range(dims):
                acc = acc + (float(emb[i]) - means[i]) * wc[i]
            row[f"p{c}"] = acc
        out.append(row)
    return out


def _opq_allocate(vals, m, sd):
    """Mirror of VectorOps.opqAllocate (Ge et al. eigenvalue allocation):
    deal eigendirections (λ desc) into m buckets of sd slots, each to the
    open bucket with the smallest shifted log-λ product, first-min ties.
    """
    logs = [math.log(max(v, 1e-12)) for v in vals]
    base = min(logs)
    bucket_log = [0.0] * m
    buckets = [[] for _ in range(m)]
    for i in range(len(vals)):
        open_ = [b for b in range(m) if len(buckets[b]) < sd]
        b = min(open_, key=lambda b: (bucket_log[b], b))
        buckets[b].append(i)
        bucket_log[b] += logs[i] - base
    return [i for b in buckets for i in b]


def oracle_emb_opq(con, m=16, sd=4, dims=64):
    """Composite reference for OPQ ANN: the rotation is the _pca_fit /
    _jacobi_eigen mirror (bit-identical, verified through
    emb_pca/emb_whiten) + the opqAllocate permutation + the same per-row
    left fold as the Scala literals rounded to the 6-decimal codebook
    grid; the PQ chain then runs as the COMMITTED emb_pq SQL verbatim
    against the rotated corpus in a fresh DuckDB connection.

    History note (why the PQ chain is integer-grid): the first version of
    this oracle, against the round(avg/l2, 6) PQ chain, reproduced every
    RANKING but differed on 3–4 of 50 adist values by exactly 1e-6 — the
    rotated corpus is grid-aligned, so round(·, 6) hit .5 ties
    systematically, where Spark (HALF_UP on shortest-repr) and DuckDB
    (binary rounding) legitimately disagree. The fix was in the OPERATOR,
    not the mirror: the PQ chain now quantizes sub-vectors to exact
    micro-integers, making every centroid mean (half-integer ties are
    binary-exact, where both engines round away from zero) and every
    distance an exact integer — no round() left to diverge.
    """
    from decimal import Decimal, ROUND_HALF_UP

    if "emb_pq" not in ORACLE_SQL:
        raise RuntimeError("emb_opq oracle needs emb_pq SQL in this run")
    means, vals, vecs0 = _pca_fit(con, dims)
    order = _opq_allocate(vals, m, sd)
    vecs = [vecs0[i] for i in order]

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                                ROUND_HALF_UP))

    rows = []
    for vec_id, emb in con.execute(
            "SELECT vec_id, embedding FROM embeddings").fetchall():
        xs = [float(x) for x in emb]
        v = []
        for c in range(dims):
            wc = vecs[c]
            acc = 0.0
            for i in range(dims):
                acc = acc + (xs[i] - means[i]) * wc[i]
            v.append(r6(acc))
        rows.append((vec_id, v))
    con2 = duckdb.connect()
    con2.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[])")
    con2.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    df = con2.execute(ORACLE_SQL["emb_pq"]).fetch_df()
    return df.to_dict("records")


def oracle_emb_pca(con):
    return _pca_apply(con, whiten=False)


def oracle_emb_whiten(con):
    return _pca_apply(con, whiten=True)


def oracle_doc_quality_train(con):
    """Op-for-op mirror of TextOps.docQualityTrainFit: features from the
    committed doc_gopher_filter SQL (all ratio features live on round-4
    grids, so both engines hold identical doubles), then 15 full-batch GD
    iterations where each gradient is a fold-order-free sum of
    round(1e6·e·x_j) BIGINTs (HALF_UP mirror) and the weight update
    repeats the Scala IEEE sequence lr·(g/1e6)/n. The only transcendental
    is exp(-z) per row; a libm-vs-JVM ulp difference only matters if some
    1e6·e·x_j lands within ~1e-10 of a .5 tie — absent that, the final
    weights are bit-identical."""
    if "doc_gopher_filter" not in ORACLE_SQL:
        raise RuntimeError("doc_quality_train oracle needs doc_gopher_filter SQL")
    feats = []
    df = con.execute(ORACLE_SQL["doc_gopher_filter"]).fetch_df()
    for r in df.itertuples(index=False):
        feats.append((
            1.0,
            float(min(int(r.n_tokens), 200)) / 200.0,
            min(float(r.avg_token_len), 10.0) / 10.0,
            float(min(int(r.n_stop), 20)) / 20.0,
            float(r.uniq_ratio),
            float(r.rep_ratio),
            1.0 if r.admit else 0.0))
    n = float(len(feats))
    names = ["bias", "len", "wordlen", "stop", "uniq", "rep"]
    w = [0.0] * 6
    for _ in range(15):
        g = [0] * 6
        for x0, x1, x2, x3, x4, x5, y in feats:
            xs = (x0, x1, x2, x3, x4, x5)
            z = (w[0]) * x0 + (w[1]) * x1 + (w[2]) * x2 \
                + (w[3]) * x3 + (w[4]) * x4 + (w[5]) * x5
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - y
            for j in range(6):
                g[j] += _round_half_up_int(1e6 * e * xs[j])
        for j in range(6):
            w[j] = w[j] - 2.0 * (float(g[j]) / 1e6) / n
    return [{"feature": names[j], "weight": w[j]} for j in range(6)]


# Oracles computed in Python instead of DuckDB SQL (driver's gate records
# these as rows-only; this replica closes the hash check locally).
PY_ORACLES = {"doc_compress": oracle_doc_compress,
              "doc_bpe_train": oracle_doc_bpe_train,
              "doc_bpe_apply": oracle_doc_bpe_apply,
              "doc_pack_ffd": oracle_doc_pack_ffd,
              "ev_attribution_markov": oracle_ev_attribution_markov,
              # ev_pagerank graduated to a full DuckDB oracle in r8 (the
              # 30-round iteration unrolls into chained CTEs), so the gate
              # takes the SQL path; oracle_ev_pagerank above is retained
              # as the independent from-scratch reference of record
              "corpus_release": oracle_corpus_release,
              "emb_pca": oracle_emb_pca,
              "emb_whiten": oracle_emb_whiten,
              "emb_opq": oracle_emb_opq,
              "doc_quality_train": oracle_doc_quality_train}

# Queries whose finalization rounds a libm ln/exp chain (HLL linear
# counting, Kaplan-Meier's exp(sum(ln)), pagerank's 30-round float sums):
# a value within ~1 ulp of a rounding tie can flip the last unit on other
# data. On a hash FAIL for these, the gate checks whether every diff is
# exactly one least-significant unit and says so (diagnosable, not red).
LN_TIE_RISK = {"q18_approx_distinct", "q18_approx_prod", "q21_approx",
               "q21_approx_prod", "ev_survival", "ev_pagerank"}


def canon(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    record = {}

    def rec(name, rows=None, schema=None, hsh=None, s_rows=None, d_rows=None,
            err=None):
        record[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": hsh, "spark_rows": s_rows,
                        "oracle_rows": d_rows, "err": err}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    global ORACLE_SQL
    ORACLE_SQL = oracle
    n_pass = n_fail = 0

    # Above-sf0.01 gate runs: some oracle twins are deliberately quadratic
    # (they exist to oracle a banded operator, SCALE.md) and DuckDB grinds
    # them for hours at 10x data. Rather than hang — or silently drop them —
    # a watchdog interrupts any single oracle after ORACLE_TIMEOUT_S and the
    # row is RECORDED as oracle_timeout (a named skip, never a silent one).
    timeout_s = float(os.environ.get("ORACLE_TIMEOUT_S", "0") or 0)

    def timed_execute(sql):
        if not timeout_s:
            return con.execute(sql).fetch_df()
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetch_df()
        finally:
            timer.cancel()

    for name, sql in sorted(list(oracle.items()) + [(n, None) for n in PY_ORACLES]):
        t0 = time.time()
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            if sql is None and name not in oracle:
                continue  # python-oracle query not part of this subset run
            print(f"FAIL {name}: no spark output")
            rec(name, err="no_spark_output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0]).to_pandas()
        spark_cols = sorted(spark_tbl.columns)
        spark_rows = canon(spark_tbl[spark_cols].itertuples(index=False, name=None))
        if sql is None:  # python-computed oracle
            recs = PY_ORACLES[name](con)
            duck_cols = sorted(recs[0].keys()) if recs else spark_cols
            if duck_cols != spark_cols:
                print(f"FAIL {name}: columns spark={spark_cols} py={duck_cols}")
                rec(name, schema=False, s_rows=len(spark_rows), d_rows=len(recs))
                n_fail += 1
                continue
            duck_rows = canon(tuple(r[c] for c in duck_cols) for r in recs)
            ok = spark_rows == duck_rows
            rec(name, rows=len(spark_rows) == len(duck_rows), schema=True,
                hsh=ok, s_rows=len(spark_rows), d_rows=len(duck_rows))
            if ok:
                print(f"PASS {name} ({len(spark_rows)} rows, python oracle)")
                n_pass += 1
            else:
                print(f"FAIL {name}: {len(spark_rows)} spark vs {len(duck_rows)} python rows")
                n_fail += 1
            continue
        try:
            duck = timed_execute(sql)
        except Exception as e:
            if "INTERRUPT" in str(e).upper() or "interrupt" in type(e).__name__.lower():
                print(f"SKIP {name}: oracle exceeded {timeout_s:.0f}s "
                      f"(recorded as oracle_timeout)", flush=True)
                rec(name, s_rows=len(spark_rows), err="oracle_timeout")
            else:
                print(f"FAIL {name}: duckdb error: {e}")
                rec(name, s_rows=len(spark_rows), err=f"duckdb: {e}")
                n_fail += 1
            continue
        duck_cols = sorted(duck.columns)
        if duck_cols != spark_cols:
            print(f"FAIL {name}: columns spark={spark_cols} duck={duck_cols}")
            rec(name, schema=False, s_rows=len(spark_rows), d_rows=len(duck))
            n_fail += 1
            continue
        duck_rows = canon(duck[duck_cols].itertuples(index=False, name=None))
        ok = spark_rows == duck_rows
        rec(name, rows=len(spark_rows) == len(duck_rows), schema=True,
            hsh=ok, s_rows=len(spark_rows), d_rows=len(duck_rows))
        if ok:
            print(f"PASS {name} ({len(spark_rows)} rows, {time.time() - t0:.1f}s)",
                  flush=True)
            n_pass += 1
        else:
            print(f"FAIL {name}: {len(spark_rows)} spark rows vs {len(duck_rows)} duck rows")
            only_s = [r for r in spark_rows if r not in set(duck_rows)][:3]
            only_d = [r for r in duck_rows if r not in set(spark_rows)][:3]
            if only_s:
                print(f"  spark-only: {only_s}")
            if only_d:
                print(f"  duck-only:  {only_d}")
            # Documented residual risk (round-8 advice): queries whose
            # finalization rounds an ln/exp chain (libm results are not
            # guaranteed correctly rounded) can land within 1 ulp of a
            # rounding tie and flip the last integer/decimal by 1 on
            # OTHER data even though both engines are individually
            # deterministic. If every differing cell is off by exactly
            # one least-significant unit, say so — a tie flip is a known
            # 1-ulp event to re-derive, not a logic bug to hunt.
            #
            # Round-9 advice hardening: canon() stringifies every cell, so
            # the old isinstance-based check was vacuous. Parse the
            # canonical strings back to numbers, pair rows by their
            # NON-numeric (key) cells instead of sort order, scale the
            # tolerance to each cell's actual last rendered unit (1 for
            # integer-rendered, 10^-d for d rendered decimals), and only
            # print the NOTE when at least one genuine 1-unit flip is
            # observed.
            if name in LN_TIE_RISK and only_s and only_d and \
                    len(only_s) == len(only_d):
                def _parse(x):
                    try:
                        return float(x)
                    except (TypeError, ValueError):
                        return None

                def _unit(x):
                    # last rendered unit of a canonical %.9g cell
                    s = str(x)
                    if "e" in s or "E" in s or "n" in s:  # sci-notation/NaN
                        return None
                    if "." in s:
                        return 10.0 ** -len(s.split(".")[1])
                    return 1.0

                def _key(r):
                    return tuple(x for x in r if _parse(x) is None)

                def _nums(r):
                    return [x for x in r if _parse(x) is not None]

                s_by_key = {_key(r): r for r in only_s}
                d_by_key = {_key(r): r for r in only_d}
                tie = (len(s_by_key) == len(only_s)
                       and set(s_by_key) == set(d_by_key))
                saw_flip = False
                if tie:
                    for k in s_by_key:
                        na, nb = _nums(s_by_key[k]), _nums(d_by_key[k])
                        if len(na) != len(nb) or not na:
                            tie = False
                            break
                        for xa, xb in zip(na, nb):
                            ua, ub = _unit(xa), _unit(xb)
                            x, y = _parse(xa), _parse(xb)
                            if math.isnan(x) or math.isnan(y):
                                tie = False
                                break
                            if ua is None or ub is None:
                                # sci-notation cells: fall back to rel tol
                                if abs(x - y) > 1e-6 * max(abs(x), abs(y)):
                                    tie = False
                                break
                            u = max(ua, ub)
                            if abs(x - y) > u * (1 + 1e-9):
                                tie = False
                                break
                            if x != y:
                                saw_flip = True
                        if not tie:
                            break
                if tie and saw_flip:
                    print(f"  NOTE {name}: rows pair on key cells and every "
                          f"numeric diff is within one last-rendered unit — "
                          f"consistent with a documented ln-rounding tie flip, "
                          f"not an algorithm divergence")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if out_json:
        json.dump(record, open(out_json, "w"), indent=1)
        print(f"wrote {out_json} ({len(record)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
