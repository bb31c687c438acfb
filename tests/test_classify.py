"""Naive Bayes quality classifier (ops/classify.py): pure-Python oracle
parity for training counts and scores, smoothing/OOV semantics, pruning
self-consistency, filter behavior, persistence round-trip."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark.ops import classify as C

_WS = re.compile(r"[ \t\n\x0b\f\r]+")

GOOD = [
    "the committee published its annual report on regional development",
    "researchers measured the effect of temperature on reaction rates",
    "the library catalog lists every edition with its printing history",
    "a detailed analysis of the survey results appears in chapter four",
]
BAD = [
    "click here buy now best price click here free free free",
    "win win win casino bonus click now now now free spins",
    "cheap cheap deals click buy buy buy now free shipping",
]


def _tok(t):
    return [w for w in _WS.split((t or "").lower()) if w]


def _py_train(rows, min_count=1):
    cnt = Counter()
    docs = Counter()
    for label, text in rows:
        docs[label] += 1
        for w in _tok(text):
            cnt[(w, label)] += 1
    if min_count > 1:
        cnt = Counter({k: v for k, v in cnt.items() if v >= min_count})
    totals = Counter()
    for (w, l), v in cnt.items():
        totals[l] += v
    vocab = len({w for (w, l) in cnt})
    return cnt, totals, docs, vocab


def _py_score(text, cnt, totals, docs, vocab, alpha=1.0):
    d_total = sum(docs.values())
    toks = _tok(text)
    out = {}
    for l in docs:
        s = math.log(docs[l] / d_total)
        for w in toks:
            s += math.log(cnt.get((w, l), 0) + alpha)
        s -= len(toks) * math.log(totals.get(l, 0) + alpha * vocab)
        out[l] = s
    return out


@pytest.fixture(scope="module")
def train_df(spark):
    rows = [("good", t) for t in GOOD] + [("bad", t) for t in BAD]
    return spark.createDataFrame(rows, "label string, text string")


@pytest.fixture(scope="module")
def model(train_df):
    return C.train_nb(train_df).cache()


def test_train_counts_match_python(model):
    rows = [("good", t) for t in GOOD] + [("bad", t) for t in BAD]
    cnt, totals, docs, vocab = _py_train(rows)
    got = {(r["kind"], r["tok"], r["label"]): r["cnt"] for r in model.collect()}
    exp = {("tok", w, l): v for (w, l), v in cnt.items()}
    exp.update({("total", "", l): v for l, v in totals.items()})
    exp.update({("docs", "", l): v for l, v in docs.items()})
    exp[("vocab", "", "")] = vocab
    assert got == exp


def test_score_matches_python_oracle(spark, model):
    probes = [
        (0, "the annual report on temperature"),
        (1, "click now free bonus"),
        (2, "completely unseen words only zzz qqq"),
        (3, ""),
        (4, None),
        (5, "the the the click"),
    ]
    rows = [("good", t) for t in GOOD] + [("bad", t) for t in BAD]
    cnt, totals, docs, vocab = _py_train(rows)
    df = spark.createDataFrame(probes, "doc_id int, text string")
    got = {r["id"]: r for r in C.score_nb(df, model, id_col="doc_id").collect()}
    for i, t in probes:
        exp = _py_score(t, cnt, totals, docs, vocab)
        for l, v in exp.items():
            assert got[i][f"logp_{l}"] == pytest.approx(v, rel=1e-12), (i, l)
        best = max(sorted(exp), key=lambda l: (exp[l],))
        # argmax with lexically-first tie-break
        mx = max(exp.values())
        assert got[i]["pred"] == sorted(l for l in exp if exp[l] == mx)[0]
        n = len(_tok(t))
        if n:
            vals = sorted(exp.values(), reverse=True)
            assert got[i]["margin"] == pytest.approx((vals[0] - vals[1]) / n, rel=1e-9)
        else:
            assert got[i]["margin"] == 0.0
        assert got[i]["n_toks"] == n


def test_classifies_held_out_text(spark, model):
    df = spark.createDataFrame(
        [
            (0, "the analysis of regional survey results"),
            (1, "free bonus click buy now"),
        ],
        "doc_id int, text string",
    )
    got = {r["id"]: r["pred"] for r in C.score_nb(df, model, id_col="doc_id").collect()}
    assert got == {0: "good", 1: "bad"}


def test_min_count_pruning_self_consistent(spark, train_df):
    m = C.train_nb(train_df, min_count=2)
    rows = {(r["kind"], r["tok"], r["label"]): r["cnt"] for r in m.collect()}
    toks = {(t, l): v for (k, t, l), v in rows.items() if k == "tok"}
    assert toks and all(v >= 2 for v in toks.values())
    # totals and vocab recomputed AFTER the prune
    for l in ("good", "bad"):
        assert rows[("total", "", l)] == sum(
            v for (t, ll), v in toks.items() if ll == l
        )
    assert rows[("vocab", "", "")] == len({t for (t, l) in toks})


def test_classify_filter(spark, model):
    df = spark.createDataFrame(
        [
            (0, "the annual report on regional development", "x"),
            (1, "click click free free buy now bonus", "y"),
            (2, "the survey analysis", "z"),
        ],
        "doc_id int, text string, extra string",
    )
    out = C.classify_filter(df, model, "good")
    assert out.columns == df.columns
    assert {r["doc_id"] for r in out.collect()} == {0, 2}
    # a high margin bar drops everything
    assert C.classify_filter(df, model, "good", min_margin=50.0).count() == 0


def test_model_persistence_round_trip(spark, model, tmp_path):
    p = str(tmp_path / "nb_model")
    model.write.parquet(p)
    loaded = spark.read.parquet(p)
    df = spark.createDataFrame(
        [(0, "the annual report"), (1, "click free bonus")], "doc_id int, text string"
    )
    a = sorted(C.score_nb(df, model, id_col="doc_id").collect())
    b = sorted(C.score_nb(df, loaded, id_col="doc_id").collect())
    assert a == b


def test_null_label_raises(spark):
    df = spark.createDataFrame(
        [("good", "some text"), (None, "other text")], "label string, text string"
    )
    with pytest.raises(Exception, match="NULL label"):
        C.train_nb(df).collect()


def test_arg_validation(spark, train_df, model):
    with pytest.raises(ValueError, match="min_count"):
        C.train_nb(train_df, min_count=0)
    df = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="alpha"):
        C.score_nb(df, model, id_col="doc_id", alpha=0.0)
    with pytest.raises(ValueError, match="docs"):
        C.score_nb(df, df.select(F.lit("tok").alias("kind"), F.lit("a").alias("tok"), F.lit("l").alias("label"), F.lit(1).alias("cnt")), id_col="doc_id")


def test_broadcast_and_shuffle_join_parity(spark, model):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD)], "doc_id int, text string"
    )
    a = sorted(C.score_nb(df, model, id_col="doc_id", broadcast_model=True).collect())
    b = sorted(C.score_nb(df, model, id_col="doc_id", broadcast_model=False).collect())
    assert a == b


def test_clean_corpus_classifier_gate(spark):
    """Pipeline integration: the NB gate drops crawl-junk turns inside
    clean_corpus while leaving the run identical with the gate off."""
    from pdf_ocr_api_spark.ops import corpus

    rows = [("good", t) for t in GOOD] + [("bad", t) for t in BAD]
    model = C.train_nb(spark.createDataFrame(rows, "label string, text string"))
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    batch = spark.createDataFrame(
        [
            ("c0", 0, "user", "the committee report lists the survey analysis", None),
            ("c1", 0, "user", "click here free bonus buy now click free", None),
        ],
        schema,
    )
    base = corpus.clean_corpus(batch, min_quality=0.0, min_tokens=3)
    assert {r["conv_id"] for r in base.collect()} == {"c0", "c1"}
    gated = corpus.clean_corpus(
        batch, min_quality=0.0, min_tokens=3,
        classifier=model, classifier_keep="good",
    )
    assert {r["conv_id"] for r in gated.collect()} == {"c0"}


def test_runner_classifier_gate_cli(spark, tmp_path):
    """CLI surface: --classifier-table + --classifier-keep gates the
    clean-corpus job."""
    from pdf_ocr_api_spark import runner

    rows = [("good", t) for t in GOOD] + [("bad", t) for t in BAD]
    model = C.train_nb(spark.createDataFrame(rows, "label string, text string"))
    mpath = str(tmp_path / "nb")
    model.write.parquet(mpath)
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    batch = spark.createDataFrame(
        [
            ("c0", 0, "user", "the committee report lists the survey analysis", None),
            ("c1", 0, "user", "click here free bonus buy now click free", None),
        ],
        schema,
    )
    bin_ = str(tmp_path / "batch")
    batch.write.parquet(bin_)
    root = str(tmp_path / "run")
    assert runner.main(
        ["--clean-corpus", "--input", bin_, "--output", root,
         "--min-quality", "0.0", "--min-tokens", "3", "--buckets", "8",
         "--classifier-table", mpath, "--classifier-keep", "good"]
    ) == 0
    kept = {r["conv_id"] for r in spark.read.parquet(f"{root}/corpus").collect()}
    assert kept == {"c0"}


def test_margin_zero_on_partial_tie_three_labels(spark):
    """Review regression: with 3+ labels, two tying at the max must
    yield margin 0 (zero-confidence), not best-minus-third."""
    tr = spark.createDataFrame(
        [("a", "same text here"), ("b", "same text here"), ("c", "other words entirely")],
        "label string, text string",
    )
    m = C.train_nb(tr)
    df = spark.createDataFrame([(0, "same text here")], "doc_id int, text string")
    r = C.score_nb(df, m, id_col="doc_id").collect()[0]
    assert r["logp_a"] == r["logp_b"] and r["logp_a"] > r["logp_c"]
    assert r["pred"] == "a"  # lexically-first of the tied pair
    assert r["margin"] == 0.0
    # and a margin gate refuses the zero-confidence doc
    assert C.classify_filter(df, m, "a", min_margin=0.01).count() == 0


def test_zero_vocab_model_raises(spark):
    tr = spark.createDataFrame(
        [("good", "rare words only"), ("bad", "other rare tokens")],
        "label string, text string",
    )
    m = C.train_nb(tr, min_count=5)  # prunes every token
    df = spark.createDataFrame([(0, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="zero retained vocabulary"):
        C.score_nb(df, m, id_col="doc_id")


def test_labels_colliding_with_internal_columns(spark):
    """Review regression (live-confirmed): labels named 'id'/'tok' or
    containing dots must not break the pivot join or column parsing."""
    tr = spark.createDataFrame(
        [("id", "alpha beta"), ("tok", "gamma delta"), ("en.us", "epsilon zeta")],
        "label string, text string",
    )
    m = C.train_nb(tr)
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "epsilon zeta")], "doc_id int, text string"
    )
    got = {r["id"]: r for r in C.score_nb(df, m, id_col="doc_id").collect()}
    assert got[0]["pred"] == "id"
    assert got[1]["pred"] == "en.us"
    assert C.classify_filter(df, m, "en.us").count() == 1


def test_keep_label_validated(spark, model):
    df = spark.createDataFrame([(0, "x words")], "doc_id int, text string")
    with pytest.raises(ValueError, match="not one of the model's classes"):
        C.classify_filter(df, model, "goood")


def test_zero_token_docs_never_pass_the_gate(spark, model):
    """Review regression (live-confirmed): empty/whitespace/NULL text
    has no evidence — the gate must not admit it on class priors."""
    df = spark.createDataFrame(
        [(0, "the annual report analysis"), (1, ""), (2, "   "), (3, None)],
        "doc_id int, text string",
    )
    kept = {r["doc_id"] for r in C.classify_filter(df, model, "good").collect()}
    assert kept == {0}
