"""Frozen golden-file equality (FIXTURES.md §3): the Spark pipeline must
reproduce tests/golden/tiny_extracted.jsonl.gz byte-for-byte under stable
(conv_id, turn_idx) ordering. Regenerate ONLY deliberately via
tools/gen_goldens (and re-review the diff)."""

import gzip
import json
from pathlib import Path

from pdf_ocr_api_spark import fixtures, pipeline

GOLDEN = Path(__file__).parent / "golden" / "tiny_extracted.jsonl.gz"


def _load_golden():
    with gzip.open(GOLDEN, "rt", encoding="utf-8") as f:
        return [json.loads(line) for line in f]


def test_spark_pipeline_matches_frozen_golden(spark, depara):
    want = _load_golden()
    sdf = spark.createDataFrame(fixtures.fixture_frame(15))
    got = (
        pipeline.extract_transcripts(sdf, depara)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(got) == len(want)
    for i, w in enumerate(want):
        g = got.iloc[i]
        key = f"{w['conv_id']}/{w['turn_idx']}"
        assert g.conv_id == w["conv_id"] and int(g.turn_idx) == w["turn_idx"], key
        assert g["kind"] == w["kind"], key
        assert g.clean_text == w["clean_text"], key
        assert g.doc_text == w["doc_text"], key
        g_spans = [dict(s) if isinstance(s, dict) else s.asDict() for s in g.spans]
        assert g_spans == w["spans"], key
        g_svcs = []
        for s in g.services:
            d = dict(s) if isinstance(s, dict) else s.asDict()
            if d["Unidade"] is not None:
                d["Unidade"] = int(d["Unidade"])
            g_svcs.append(d)
        assert g_svcs == w["services"], key
        assert int(g.n_chars_in) == w["n_chars_in"] and int(g.n_chars_out) == w["n_chars_out"], key
