"""Independent reference implementations for the round-11 operators —
the r3-IRLS lesson (verify recipe): an oracle that mirrors the SAME
algebra proves cross-engine equality, not correctness of the algebra.
These tests recompute each result from first principles in pure
Python/hashlib/math (no engine expressions, no DuckDB) and compare.

Float boundaries: ln/exp go through different libm entry points
(JVM vs CPython), so micro-rounded logs are asserted within ±1 micro;
every integer quantity (counts, labels, margins' signs) is exact."""

from __future__ import annotations

import hashlib
import math

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
QUERIES = entrymod.queries()


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "lang", "n_chars"])
    return t.to_pylist()


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 100


def _okey(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[4:16], 16)


# ---------------------------------------------------------------------------
# AdaBoost: float reference (no micro quantization) — stump identity
# must match exactly, α within 1 micro, error trajectory exact
# ---------------------------------------------------------------------------
def test_adaboost_matches_float_reference(spark):
    from big_data_science_project_spark.operators.linear import (
        BOOST_CANDS, BOOST_MAJ_CHARS, BOOST_NOISE_PCT, BOOST_ROUNDS)

    feats = []
    for d in _docs():
        x = {1: d["n_chars"],
             2: len(d["text"].split(" ")),
             3: d["doc_id"] % 8,
             4: _bucket(f"f4#{d['doc_id']}")}
        maj = ((x[1] >= BOOST_MAJ_CHARS) + (x[3] <= 3) + (x[4] < 50)) >= 2
        noisy = _bucket(f"noise#{d['doc_id']}") < BOOST_NOISE_PCT
        y = 1 if maj != noisy else -1
        feats.append((x, y))

    cands = [(j, t, p) for (j, t) in BOOST_CANDS for p in (1, -1)]
    w = [1.0] * len(feats)
    ref = []
    margins = [0.0] * len(feats)
    for k in range(1, BOOST_ROUNDS + 1):
        best = None
        for (j, t, p) in cands:
            werr = sum(wi for wi, (x, y) in zip(w, feats)
                       if (p if x[j] >= t else -p) != y)
            key = (werr, j, t, p)
            if best is None or key < best[0]:
                best = (key, j, t, p, werr)
        _, j, t, p, werr = best
        wtot = sum(w)
        alpha = 0.5 * math.log((wtot - werr) / werr)
        preds = [(p if x[j] >= t else -p) for (x, y) in feats]
        w = [wi * math.exp(alpha if pr != y else -alpha)
             for wi, pr, (x, y) in zip(w, preds, feats)]
        margins = [m + alpha * pr for m, pr in zip(margins, preds)]
        ens_miss = sum(1 for m, (x, y) in zip(margins, feats)
                       if (1 if m >= 0 else -1) != y)
        ref.append((k, j, t, p, werr / wtot, alpha,
                    ens_miss * 1_000_000 // len(feats)))

    got = {r["round"]: r
           for r in QUERIES["ml_adaboost_stumps"](spark, SF).collect()}
    for (k, j, t, p, eps, alpha, ens_ppm) in ref:
        g = got[k]
        assert (g["feature"], g["threshold"], g["polarity"]) == (j, t, p), \
            (k, dict(g.asDict()), (j, t, p))
        assert abs(g["alpha_micro"] - round(alpha * 1e6)) <= 1, (k, alpha)
        # engine weights are micro-quantized; ppm-rounded weighted error
        # still agrees to 1 ppm on this fixture
        assert abs(g["werr_ppm"] - int(eps * 1_000_000)) <= 1, (k, eps)
        assert g["ens_err_ppm"] == ens_ppm, (k, ens_ppm)


# ---------------------------------------------------------------------------
# Label propagation: dict-based reference, exact equality
# ---------------------------------------------------------------------------
def test_label_propagation_matches_python_reference(spark):
    from big_data_science_project_spark.operators.graph import (
        CC_BLOCK, CC_GROUP, LP_ITERS, LP_SEED_MOD)

    docs = _docs()
    lang = {d["doc_id"]: d["lang"] for d in docs}
    ids = set(lang)
    # setdefault mirrors the engine's join semantics: a derived hub id
    # absent from the corpus still participates as an edge endpoint
    nbrs: dict = {i: [] for i in ids}
    for v in ids:
        if v % CC_BLOCK != 0:
            u = v - v % CC_BLOCK
            nbrs.setdefault(u, []).append(v); nbrs[v].append(u)
        elif v >= CC_BLOCK and (v // CC_BLOCK) % CC_GROUP != 0:
            u = v - CC_BLOCK
            nbrs.setdefault(u, []).append(v); nbrs[v].append(u)

    labels = {i: (lang[i], 0) for i in ids if i % LP_SEED_MOD == 0}
    for k in range(1, LP_ITERS + 1):
        votes: dict = {}
        for u, (lab, _) in labels.items():
            for v in nbrs[u]:
                if v not in labels:
                    votes.setdefault(v, {}).setdefault(lab, 0)
                    votes[v][lab] += 1
        for v, cnt in votes.items():
            lab = min(cnt, key=lambda c: (-cnt[c], c))
            labels[v] = (lab, k)

    ref: dict = {}
    for lab, rnd in labels.values():
        row = ref.setdefault(lab, [0] * (LP_ITERS + 2))
        row[0] += 1          # n_total
        row[rnd + 1] += 1    # n_round{rnd}
    got = QUERIES["graph_label_propagation"](spark, SF).collect()
    assert len(got) == len(ref)
    for g in got:
        exp = ref[g["label"]]
        assert [g["n_total"]] + [g[f"n_round{r}"]
                                 for r in range(LP_ITERS + 1)] == exp, \
            (g["label"], exp)


# ---------------------------------------------------------------------------
# Corpus drift: numpy-free JS reference — integers exact, JS ±1 micro
# ---------------------------------------------------------------------------
def test_corpus_drift_matches_python_reference(spark):
    from big_data_science_project_spark.operators.curation import (
        DRIFT_BASE_PCT, DRIFT_EN_KEEP_PCT)

    # every lang in the corpus gets a row (the engine groups ALL docs
    # by lang, so 0/0 languages still appear)
    nb: dict = {}
    nc: dict = {}
    langs = set()
    for d in _docs():
        langs.add(d["lang"])
        snap = _bucket(f"snap#{d['doc_id']}")
        if snap < DRIFT_BASE_PCT:
            nb[d["lang"]] = nb.get(d["lang"], 0) + 1
        elif (d["lang"] != "en"
              or _bucket(f"drop#{d['doc_id']}") < DRIFT_EN_KEEP_PCT):
            nc[d["lang"]] = nc.get(d["lang"], 0) + 1
    tb, tc = sum(nb.values()), sum(nc.values())

    got = QUERIES["curate_corpus_drift"](spark, SF).collect()
    assert len(got) == len(langs)
    for g in got:
        b, c = nb.get(g["lang"], 0), nc.get(g["lang"], 0)
        assert (g["n_base"], g["n_cur"]) == (b, c)
        assert g["share_base_ppm"] == 1_000_000 * b // tb
        assert g["share_cur_ppm"] == 1_000_000 * c // tc
        p, q = b / tb, c / tc
        m = (p + q) / 2
        js = ((0.5 * p * math.log(p / m) if b else 0.0)
              + (0.5 * q * math.log(q / m) if c else 0.0))
        assert abs(g["js_term_micro"] - math.floor(js * 1e6 + 0.5)) <= 1


# ---------------------------------------------------------------------------
# Dup-rate estimator + shard shuffle: pure-hash references, exact
# ---------------------------------------------------------------------------
def test_dup_rate_matches_python_reference(spark):
    from big_data_science_project_spark.operators.curation import (
        CLONE_ID_OFFSET, CLONE_PCT, DUP_SAMPLE_PCT)

    corpus = []
    for d in _docs():
        corpus.append((d["doc_id"], d["text"]))
        if _bucket(f"clone#{d['doc_id']}") < CLONE_PCT:
            corpus.append((d["doc_id"] + CLONE_ID_OFFSET, d["text"]))
    # clone ids must not collide with real ids — a collision silently
    # biases the row-sample estimator (shared in_rs flag), so pin the
    # offset's precondition: every real doc_id sits below the offset
    assert max(d["doc_id"] for d in _docs()) < CLONE_ID_OFFSET, \
        "real doc_id >= CLONE_ID_OFFSET — clone ids would collide"
    cs = [(i, t) for (i, t) in corpus if _bucket(t) < DUP_SAMPLE_PCT]
    rs = [(i, t) for (i, t) in corpus
          if _bucket(f"row#{i}") < DUP_SAMPLE_PCT]

    def dup_ppm(rows):
        if not rows:
            return 0
        return (1_000_000 * (len(rows) - len({t for _, t in rows}))
                // len(rows))

    [g] = QUERIES["curate_dup_rate_estimate"](spark, SF).collect()
    assert g["n_total"] == len(corpus)
    assert g["dup_total"] == len(corpus) - len({t for _, t in corpus})
    assert (g["n_cs"], g["n_rs"]) == (len(cs), len(rs))
    assert g["exact_dup_ppm"] == dup_ppm(corpus)
    assert g["est_content_ppm"] == dup_ppm(cs)
    assert g["est_rowsample_ppm"] == dup_ppm(rs)


def test_shard_shuffle_matches_python_reference(spark):
    from big_data_science_project_spark.operators.curation import (
        N_SHARDS, SHUFFLE_SEED)

    ref: dict = {}
    for d in _docs():
        h = f"{SHUFFLE_SEED}#{d['doc_id']}"
        shard = int(hashlib.md5(h.encode()).hexdigest()[:4], 16) % N_SHARDS
        o = _okey(h)
        row = ref.setdefault(shard, [0, set(), 0, o, o])
        row[0] += 1
        row[1].add(d["lang"])
        row[2] += d["n_chars"]
        row[3] = min(row[3], o)
        row[4] = max(row[4], o)

    got = QUERIES["curate_shard_shuffle"](spark, SF).collect()
    assert len(got) == len(ref)
    for g in got:
        n, langs, chars, lo, hi = ref[g["shard"]]
        assert (g["n_docs"], g["n_langs"], g["total_chars"],
                g["first_okey"], g["last_okey"]) == \
            (n, len(langs), chars, lo, hi)
