"""ops/lm.py — Stupid Backoff LM vs a pure-Python oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pdf_ocr_api_spark.ops import lm as L

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _tok(t):
    toks = [w for w in _WS.split((t or "").lower()) if w]
    return [(L._ESC + w) if w in (L._BOS, L._EOS) else w for w in toks]


def _py_train(texts, order, min_count=1):
    counts = Counter()
    for t in texts:
        mt = [L._BOS] * (order - 1) + _tok(t) + [L._EOS]
        for n in range(1, order + 1):
            for i in range(len(mt) - n + 1):
                counts[(n, " ".join(mt[i : i + n]))] += 1
    if min_count > 1:
        counts = Counter(
            {k: v for k, v in counts.items() if k[0] == 1 or v >= min_count}
        )
    big_n = sum(v for (n, g), v in counts.items() if n == 1 and g != L._BOS)
    return counts, big_n


def _py_score(text, counts, big_n, order, alpha=L.ALPHA):
    mt = [L._BOS] * (order - 1) + _tok(text) + [L._EOS]
    logs = []
    for i in range(len(mt) - order + 1):
        end = i + order

        def s(n):
            g = " ".join(mt[end - n : end])
            if n == 1:
                c = counts.get((1, g))
                return (c / big_n) if c else (1.0 / big_n)
            cg = counts.get((n, g))
            cx = counts.get((n - 1, " ".join(mt[end - n : end - 1])))
            if cg and cx:
                return cg / cx
            return alpha * s(n - 1)

        logs.append(math.log(s(order)))
    return sum(logs) / len(logs)


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat together",
    "the cat chased the dog around the garden",
]
TEST = [
    (1, "the cat sat on the rug"),        # in-domain
    (2, "zq wv xk jj qq pp zz"),          # OOV gibberish
    (3, "the dog chased the cat"),
    (4, ""),                               # empty → scores EOS only
    (5, None),
]


@pytest.fixture(scope="module")
def lm3(spark):
    tr = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    return L.train_ngram_lm(tr, order=3).localCheckpoint()


def test_counts_match_oracle(spark, lm3):
    counts, big_n = _py_train(TRAIN, order=3)
    got = {(r["n"], r["gram"]): r["cnt"] for r in lm3.collect()}
    assert got.pop((0, "")) == big_n
    assert got == dict(counts)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_scores_match_oracle(spark, order):
    tr = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    lm = L.train_ngram_lm(tr, order=order)
    docs = spark.createDataFrame(TEST, "doc_id int, text string")
    got = {
        r["id"]: (r["n_scored"], r["logscore_per_token"])
        for r in L.score_lm(docs, lm, order=order).collect()
    }
    counts, big_n = _py_train(TRAIN, order=order)
    for i, t in TEST:
        want = _py_score(t, counts, big_n, order)
        n_want = len(_tok(t)) + 1
        assert got[i][0] == n_want, i
        assert abs(got[i][1] - round(want, 6)) < 2e-6, (i, got[i][1], want)


def test_indomain_beats_gibberish(spark, lm3):
    docs = spark.createDataFrame(TEST, "doc_id int, text string")
    ppl = {r["id"]: r["pseudo_ppl"] for r in L.score_lm(docs, lm3).collect()}
    assert ppl[1] < ppl[2] < ppl[2] + 1  # sanity shape
    assert ppl[2] > 10 * ppl[1]          # gibberish is far out-of-domain


def test_min_count_prunes_but_unigrams_survive(spark):
    tr = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    lm = L.train_ngram_lm(tr, order=3, min_count=2)
    rows = lm.collect()
    assert all(r["cnt"] >= 2 for r in rows if r["n"] >= 2)
    assert any(r["n"] == 1 and r["cnt"] == 1 for r in rows)
    # pruned LM still scores (falls back to shorter contexts), and the
    # oracle with the same pruning agrees
    docs = spark.createDataFrame(TEST, "doc_id int, text string")
    got = {
        r["id"]: r["logscore_per_token"]
        for r in L.score_lm(docs, lm, order=3).collect()
    }
    counts, big_n = _py_train(TRAIN, order=3, min_count=2)
    for i, t in TEST:
        want = _py_score(t, counts, big_n, 3)
        assert abs(got[i] - round(want, 6)) < 2e-6, i


def test_broadcast_parity(spark, lm3):
    docs = spark.createDataFrame(TEST, "doc_id int, text string")
    a = sorted(L.score_lm(docs, lm3).collect())
    b = sorted(L.score_lm(docs, lm3, broadcast_lm=True).collect())
    assert a == b


def test_perplexity_filter(spark, lm3):
    docs = spark.createDataFrame(TEST, "doc_id int, text string")
    ppl = {r["id"]: r["pseudo_ppl"] for r in L.score_lm(docs, lm3).collect()}
    cut = (ppl[1] + ppl[2]) / 2
    kept = L.perplexity_filter(docs, lm3, max_ppl=cut)
    assert kept.columns == ["doc_id", "text"]
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 1 in ids and 2 not in ids
    with pytest.raises(ValueError, match="order"):
        L.score_lm(docs, lm3, order=0)
    with pytest.raises(ValueError, match="order"):
        L.train_ngram_lm(docs, order=0)


def test_runner_train_lm_and_gate(spark, tmp_path):
    """CLI surface: --train-lm persists the LM table; --lm-table +
    --lm-max-ppl gates out-of-domain turns in the clean-corpus job
    while in-domain turns survive."""
    from pdf_ocr_api_spark import runner

    seed_texts = TRAIN * 3
    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    seed = spark.createDataFrame(
        [(f"s{i}", 0, "user", t, None) for i, t in enumerate(seed_texts)], schema
    )
    seed_in = str(tmp_path / "seed")
    seed.write.parquet(seed_in)
    lm_out = str(tmp_path / "lm")
    assert runner.main(
        ["--train-lm", "--input", seed_in, "--output", lm_out,
         "--lm-order", "3", "--lm-min-count", "1"]
    ) == 0
    lm_rows = spark.read.parquet(lm_out)
    assert set(lm_rows.columns) == {"n", "gram", "cnt"}

    batch = spark.createDataFrame(
        [("a0", 0, "user", "the cat sat on the rug near the garden", None),
         ("a1", 0, "user", "zq wv xk jj qq pp zz yy ww vv uu tt", None)],
        schema,
    )
    bin_ = str(tmp_path / "batch")
    batch.write.parquet(bin_)
    root = str(tmp_path / "run")
    # pick a cut between the two docs' perplexities via the operator
    from pdf_ocr_api_spark.ops import lm as L2

    ppl = {
        r["id"]: r["pseudo_ppl"]
        for r in L2.score_lm(
            batch.withColumnRenamed("conv_id", "doc_id"),
            spark.read.parquet(lm_out),
            text_col="text", id_col="doc_id",
        ).collect()
    }
    cut = (ppl["a0"] + ppl["a1"]) / 2
    assert runner.main(
        ["--clean-corpus", "--input", bin_, "--output", root,
         "--min-quality", "0.2", "--min-tokens", "3", "--buckets", "8",
         "--lm-table", lm_out, "--lm-max-ppl", str(cut)]
    ) == 0
    stored = {r.conv_id for r in spark.read.parquet(f"{root}/corpus").collect()}
    assert stored == {"a0"}


def test_literal_marker_tokens_cannot_collide(spark):
    """Review regression: a literal whitespace-delimited '<s>' (HTML
    tag) or bare control char in TEXT must not merge with the BOS/EOS
    marker rows or yield unigram scores > 1 (log-score > 0)."""
    tr = spark.createDataFrame(
        [("<s> tagged text here",), ("\x02 raw control char",)]
        + [(t,) for t in TRAIN],
        "text string",
    )
    lm = L.train_ngram_lm(tr, order=3)
    rows = {(r["n"], r["gram"]): r["cnt"] for r in lm.collect()}
    # marker rows count ONLY the synthetic markers: (order-1) per doc
    n_docs = 2 + len(TRAIN)
    assert rows[(1, L._BOS)] == 2 * n_docs
    assert rows[(1, L._EOS)] == n_docs
    # the literal '<s>' is its own unigram; the literal \x02 is escaped
    assert rows[(1, "<s>")] == 1
    assert rows[(1, L._ESC + L._BOS)] == 1
    docs = spark.createDataFrame(
        [(1, "<s> tagged text here"), (2, "\x02 raw control char")],
        "doc_id int, text string",
    )
    scored = L.score_lm(docs, lm, order=3).collect()
    assert all(r["logscore_per_token"] <= 0.0 for r in scored)
