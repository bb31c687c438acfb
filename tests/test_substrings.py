"""ops/substrings.py — exact substring dedup vs a brute-force oracle."""

from __future__ import annotations

import random
import re
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark.ops import substrings as S

_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _brute(docs: list[tuple[int, str | None]], width: int, min_count: int = 2):
    """Reference implementation: enumerate every stride-1 width-token
    window as a TUPLE (no hashing), keep-one = min (id, pos), mark
    coverage, rebuild.  Mirrors the documented contract exactly."""
    toks = {i: [w for w in _WS.split(t or "") if w] for i, t in docs}
    occ = defaultdict(list)
    for i, ts in toks.items():
        for p in range(len(ts) - width + 1):
            occ[tuple(ts[p : p + width])].append((i, p))
    cuts = defaultdict(list)
    for places in occ.values():
        if len(places) >= min_count:
            keeper = min(places)
            for pl in places:
                if pl != keeper:
                    cuts[pl[0]].append(pl[1])
    out = {}
    for i, t in docs:
        ts = toks[i]
        if not cuts[i]:
            out[i] = (t, 0)
            continue
        covered = [False] * len(ts)
        for p in cuts[i]:
            for j in range(p, min(p + width, len(ts))):
                covered[j] = True
        kept = [w for w, c in zip(ts, covered) if not c]
        out[i] = (" ".join(kept), sum(covered))
    return out


def _run_spark(spark, docs, width, min_count=2, partitions=1):
    sdf = spark.createDataFrame(docs, "doc_id int, text string").repartition(
        partitions
    )
    got = S.dedup_substrings(sdf, width=width, min_count=min_count).collect()
    return {r["doc_id"]: (r["text"], r["n_tokens_removed"]) for r in got}


def test_keep_one_occurrence(spark):
    span = " ".join(f"dup{i}" for i in range(12))
    docs = [
        (1, "intro one two three " + span + " tail alpha beta"),
        (2, "different head here " + span + " other ending words"),
        (3, "totally unique doc with no shared content at all"),
        (4, span),
        (5, None),
    ]
    got = _run_spark(spark, docs, width=10)
    assert got == _brute(docs, width=10)
    # the min-(id,pos) doc keeps the span verbatim, others lose it
    assert span in got[1][0]
    assert "dup0" not in got[2][0] and got[2][1] == 12
    assert got[4] == ("", 12)
    assert got[5] == (None, 0)


def test_intra_document_repeat(spark):
    span = " ".join(f"w{i}" for i in range(8))
    docs = [(1, span + " middle filler words go here " + span)]
    got = _run_spark(spark, docs, width=8)
    # first occurrence kept, second (same doc) removed
    assert got == _brute(docs, width=8)
    assert got[1][0].startswith(span)
    assert got[1][1] == 8


def test_random_corpus_matches_oracle(spark):
    """30 docs over a 40-word vocab with planted shared spans AND
    accidental small-vocab repeats; exact match against the brute-force
    tuple-window oracle, under a 7-partition layout (layout
    independence rides the deterministic keeper rule)."""
    rng = random.Random(42)
    vocab = [f"v{i}" for i in range(40)]
    planted = [
        " ".join(rng.choice(vocab) for _ in range(15)) for _ in range(3)
    ]
    docs = []
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 70))]
        if rng.random() < 0.5:
            p = rng.choice(planted).split()
            at = rng.randint(0, len(words))
            words = words[:at] + p + words[at:]
        docs.append((i, " ".join(words)))
    docs.append((30, None))
    docs.append((31, ""))
    for width, mc in ((8, 2), (8, 3), (12, 2)):
        got = _run_spark(spark, docs, width=width, min_count=mc, partitions=7)
        assert got == _brute(docs, width=width, min_count=mc), (width, mc)


def test_short_docs_emit_nothing(spark):
    docs = [(1, "a b c"), (2, "a b c"), (3, "a b c d e")]
    # width 4 > 3 tokens: identical short docs are NOT this operator's
    # job (document-level dedup owns them)
    got = _run_spark(spark, docs, width=4)
    assert all(v[1] == 0 for v in got.values())
    sdf = spark.createDataFrame(docs, "doc_id int, text string")
    assert S.window_fingerprints(sdf, width=4).count() == 2  # doc 3 only
    with pytest.raises(ValueError, match="width"):
        S.window_fingerprints(sdf, width=1)


def test_stats_audit(spark):
    span = " ".join(f"s{i}" for i in range(10))
    docs = [(i, f"head{i} " + span + f" tail{i}") for i in range(5)]
    sdf = spark.createDataFrame(docs, "doc_id int, text string")
    st = S.substring_dup_stats(sdf, width=10, min_count=2).collect()
    # only the pure-span alignment (pos 1) repeats — the edge windows
    # include the per-doc head/tail tokens
    assert len(st) == 1
    (r,) = st
    assert r["n_occurrences"] == 5 and r["n_docs"] == 5
    assert r["keeper_id"] == 0 and r["keeper_pos"] == 1
    # min_count above the occurrence count → empty audit
    assert S.substring_dup_stats(sdf, width=10, min_count=6).count() == 0


def test_schema_passthrough_and_extra_columns(spark):
    span = " ".join(f"x{i}" for i in range(6))
    sdf = spark.createDataFrame(
        [(1, span, "keep1"), (2, span, "keep2")],
        "doc_id int, text string, tag string",
    )
    out = S.dedup_substrings(sdf, width=6)
    assert out.columns == ["doc_id", "text", "tag", "n_tokens_removed"]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["tag"] == "keep1" and rows[2]["tag"] == "keep2"
    assert rows[1]["n_tokens_removed"] == 0 and rows[2]["n_tokens_removed"] == 6
