"""Distributed byte-level BPE (ops/bpe).

Correctness axes: the pre-tokenizer is a partition of the string; the
distributed word count equals a plain Counter; training is deterministic
under repartitioning and reproduces the classic merge order on the
Sennrich toy corpus; the encoder REPLAYS the trainer (encode(word) ==
final trainer segmentation for every trained word); encode→decode is
byte-lossless on arbitrary unicode; save/load round-trips the model."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark.ops import bpe

TEXTS = [
    "the low lantern glowed lower over the lowest shelf",
    "newer tools ship newest features; the newest win",
    "Águas de março — fechando o verão!  5,500 km²",
    "tabs\tand\nnewlines   and   runs of spaces",
    "underscores_are_punctuation and CamelCase words",
    "低重复率的中文文本也要走字节级路径",
    "emoji 🎉🎉 and accents: naïve café résumé",
]


# ---------------------------------------------------------------------------
# pre-tokenizer
# ---------------------------------------------------------------------------

def test_pretokenize_is_a_partition():
    for t in TEXTS + ["", " ", "  x  ", "a'll b's c'd", "..."]:
        assert "".join(bpe.pre_tokenize(t)) == t


def test_pretokenize_shapes():
    toks = bpe.pre_tokenize("the cat, 42 dogs_!")
    assert toks == ["the", " cat", ",", " 42", " dogs", "_!"]
    assert bpe.pre_tokenize("it's we'll") == ["it", "'s", " we", "'ll"]


# ---------------------------------------------------------------------------
# word frequencies (distributed == local Counter)
# ---------------------------------------------------------------------------

def test_word_frequencies_match_counter(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS] + [(None,)], "text STRING")
    got = {r.word: r.n for r in bpe.word_frequencies(df.repartition(5)).collect()}
    want: Counter = Counter()
    for t in TEXTS:
        want.update(bpe.pre_tokenize(t))
    assert got == dict(want)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def test_train_classic_toy_corpus():
    """Sennrich's example: {low:5, lower:2, newest:6, widest:3} — highest
    pair counts are ('e','s') 9, then ('es','t') 9 — with byte tie-break
    ('e','s') < ('es','t') resolved by count order then content."""
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = bpe.train_bpe(freqs, vocab_size=256 + 4, min_frequency=1)
    merged = [m.vocab[256 + r] for r in range(len(m.merges))]
    assert merged[0] == b"es"          # count 9
    assert merged[1] == b"est"         # count 9 after first merge
    assert b"lo" in merged or b"ow" in merged  # count 7 family next


def test_train_deterministic_across_partitioning(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS * 3], "text STRING")
    f1 = bpe.word_frequencies(df.repartition(2))
    f2 = bpe.word_frequencies(df.repartition(17))
    m1 = bpe.train_bpe(f1, vocab_size=300, min_frequency=1)
    m2 = bpe.train_bpe(f2, vocab_size=300, min_frequency=1)
    assert m1.merges == m2.merges and m1.vocab == m2.vocab


def test_train_min_frequency_stops():
    freqs = [("aaaa", 5), ("bb", 1)]   # (b,b) pair count 1 < min_frequency
    m = bpe.train_bpe(freqs, vocab_size=1000, min_frequency=2)
    # only the 'a'-run pairs clear min_frequency; no b-merges appear
    assert all(b"b" not in m.vocab[256 + r] for r in range(len(m.merges)))


def test_train_max_words_reports_dropped_mass():
    freqs = [("common", 100), ("rare", 1), ("rarer", 1)]
    m = bpe.train_bpe(freqs, vocab_size=280, max_words=1, min_frequency=1)
    assert m.stats["n_words"] == 1
    # 9 of 609 byte-mass dropped
    assert 0.0 < m.stats["dropped_mass"] < 0.05
    full = bpe.train_bpe(freqs, vocab_size=280, min_frequency=1)
    assert full.stats["dropped_mass"] == 0.0


def test_train_rejects_tiny_vocab():
    with pytest.raises(ValueError):
        bpe.train_bpe([("a", 1)], vocab_size=10)


def test_overlapping_pair_merge_is_left_to_right():
    # 'aaa' with merge (a,a): left-to-right gives [aa, a], never [a, aa]
    freqs = [("aaa", 10)]
    m = bpe.train_bpe(freqs, vocab_size=258, min_frequency=1, keep_segments=True)
    aa = 256
    assert m.vocab[aa] == b"aa"
    assert m.final_segments["aaa"][0] == aa or m.final_segments["aaa"] == (257,)
    assert tuple(bpe.encode_text("aaa", m)) == m.final_segments["aaa"]


# ---------------------------------------------------------------------------
# encoder replays the trainer; lossless round-trip
# ---------------------------------------------------------------------------

def test_encode_replays_trainer_on_every_trained_word(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS * 2], "text STRING")
    freqs = bpe.word_frequencies(df)
    m = bpe.train_bpe(freqs, vocab_size=320, min_frequency=1, keep_segments=True)
    assert m.final_segments
    for word, want in m.final_segments.items():
        got = bpe._encode_word_bytes(word.encode("utf-8"), m.rank_map(), m.merges)
        assert got == want, word


def test_encode_decode_lossless():
    m = bpe.train_bpe([("hello", 3), ("world", 2)], vocab_size=270, min_frequency=1)
    for t in TEXTS:
        ids = bpe.encode_text(t, m)
        assert bpe.decode_ids(ids, m) == t
        assert all(0 <= i < m.vocab_size for i in ids)


def test_bpe_encode_and_count_distributed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 4)], "row_id INT, text STRING"
    ).repartition(6)
    freqs = bpe.word_frequencies(df)
    m = bpe.train_bpe(freqs, vocab_size=300, min_frequency=1)

    enc = bpe.bpe_encode(df, m).collect()
    for r in enc:
        assert r.token_ids == bpe.encode_text(r.text, m)
        assert bpe.decode_ids(r.token_ids, m) == r.text

    cnt = bpe.bpe_token_count(df, m).collect()
    want = {r.row_id: len(r.token_ids) for r in enc}
    assert all(r.n_bpe_tokens == want[r.row_id] for r in cnt)


def test_encode_null_text(spark):
    df = spark.createDataFrame([(1, None), (2, "ok then")], "row_id INT, text STRING")
    m = bpe.train_bpe([("ok", 2)], vocab_size=258, min_frequency=1)
    rows = {r.row_id: r for r in bpe.bpe_encode(df, m).collect()}
    assert rows[1].token_ids == []
    assert bpe.decode_ids(rows[2].token_ids, m) == "ok then"


def test_lowercase_mode(spark):
    df = spark.createDataFrame([("MiXeD Case",)], "text STRING")
    m = bpe.train_bpe(bpe.word_frequencies(df, lowercase=True), 280, min_frequency=1)
    (r,) = bpe.bpe_encode(df, m, lowercase=True).collect()
    assert bpe.decode_ids(r.token_ids, m) == "mixed case"


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

def test_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    m = bpe.train_bpe(bpe.word_frequencies(df), vocab_size=300, min_frequency=1)
    path = str(tmp_path / "tok")
    bpe.save_bpe(spark, m, path)
    m2 = bpe.load_bpe(spark, path)
    assert m2.vocab == m.vocab and m2.merges == m.merges
    for t in TEXTS:
        assert bpe.encode_text(t, m2) == bpe.encode_text(t, m)
    assert m2.stats["dropped_mass"] == str(m.stats["dropped_mass"])


def test_load_rejects_unknown_format(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.createDataFrame([("format", "bpe-v999")], "key STRING, value STRING") \
        .write.parquet(f"{path}/props")
    with pytest.raises(ValueError):
        bpe.load_bpe(spark, path)
