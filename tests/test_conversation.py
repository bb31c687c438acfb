"""Spark window-expr conversation assembly vs the node-parity Python twin.

``extract/document.py`` is byte-parity-verified against the reference
(test_document_parity); here the DISTRIBUTED implementation (windows +
column predicates, conversation.py) must equal that twin on the fixture
table — proving A4/A5/A6/F2-F12/T10-T11/J6 survive the move to Spark.
"""

import json

import pytest

from pdf_ocr_api_spark import conversation, fixtures, pipeline
from pdf_ocr_api_spark.extract.document import parse_document_py


@pytest.fixture(scope="module")
def assembled(spark, depara):
    meta = fixtures.fixture_frame(30, with_meta=True)
    sdf = spark.createDataFrame(meta[fixtures.TRANSCRIPT_COLUMNS])
    ext = pipeline.extract_transcripts(sdf, depara)
    tipo_dim = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])
    recs = conversation.conversation_records(ext, tipo_dim).toPandas().set_index("conv_id")
    ext_pd = pipeline._extract_frame(meta[fixtures.TRANSCRIPT_COLUMNS], depara)
    return meta, recs, ext_pd


def _twin_docs(meta, ext_pd, cid):
    grp = ext_pd[ext_pd.conv_id == cid].sort_values("turn_idx")
    docs = []
    for _, row in grp.iterrows():
        raw = meta.loc[(meta.conv_id == cid) & (meta.turn_idx == row.turn_idx), "text"].iloc[0]
        t = (raw or "").lstrip()
        if t.startswith("{"):
            try:
                d = json.loads(raw)
                if isinstance(d, dict) and "elements" not in d:
                    docs.append(d)
                    continue
            except Exception:
                pass
        docs.append({"text": row.doc_text, "pages": []})
    return docs


def test_conversation_records_match_twin(assembled, depara):
    meta, recs, ext_pd = assembled
    checked = 0
    for cid in sorted(ext_pd.conv_id.unique()):
        want = parse_document_py(_twin_docs(meta, ext_pd, cid), depara)
        got = recs.loc[cid]
        g_svcs = []
        for s in got.Servicos:
            d = s.asDict() if hasattr(s, 'asDict') else dict(s)
            if d["Unidade"] is not None:
                d["Unidade"] = int(d["Unidade"])
            g_svcs.append(d)
        tipo = got.TipodaCertidao
        tipo = None if tipo is None or tipo != tipo else int(tipo)
        assert want["NumerodaCertidao"] == got.NumerodaCertidao, cid
        assert want["Estado"] == got.Estado, cid
        assert want["TipodaCertidao"] == tipo, cid
        assert want["Servicos"] == g_svcs, cid
        checked += 1
    assert checked >= 25


def test_assemble_explains_single_window_exchange(spark, depara):
    """Plan shape guard: the service-assembly windows must share one
    partitioning — exactly one Exchange below the Window operators."""
    meta = fixtures.fixture_frame(8)
    sdf = spark.createDataFrame(meta)
    ext = pipeline.extract_transcripts(sdf, depara)
    svc = conversation.assemble_services(conversation.explode_services(ext))
    plan = svc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 1
    # windows over the same (conv_id | turn_idx, svc_idx) spec collapse
    # into one sort; no second exchange between them
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_header_fields_match_python_rules(spark, depara):
    """S7 enrichment: the Spark when-chain must equal the Python
    deterministic_header (itself the same rules J2 encodes)."""
    from pdf_ocr_api_spark.extract.tipo import map_by_sigla

    rows = [
        ("h0", 0, "user", "Obra de execução hospitalar em edificação urbana", None),
        ("h1", 0, "user", "Projeto de infraestrutura para fiscalização escolar", None),
        ("h2", 0, "user", "nada relevante aqui", None),
        ("h2", 1, "user", "execução tardia não conta (não é o primeiro turno)", None),
    ]
    sdf = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING")
    ext = pipeline.extract_transcripts(sdf, depara)
    recs = conversation.conversation_records(
        ext,
        conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"]),
        header_depara=fixtures.DEPARA_RAW,
    ).toPandas().set_index("conv_id")

    for cid, head in (("h0", rows[0][3]), ("h1", rows[1][3]), ("h2", rows[2][3])):
        want = map_by_sigla(head[:8000], fixtures.DEPARA_RAW["nivelAtividade"])
        got = recs.loc[cid].NiveldeAtividade
        got = None if got is None or got != got else int(got)
        assert got == want, (cid, got, want)
    assert int(recs.loc["h0"].QualificacaoObra) == 1      # EDIFICACAO
    assert int(recs.loc["h0"].QualificacaoEspecifica) == 1  # HOSPITAL
    assert int(recs.loc["h1"].QualificacaoObra) == 2      # INFRAESTRUTURA
    assert recs.loc["h2"].NiveldeAtividade is None or recs.loc["h2"].NiveldeAtividade != recs.loc["h2"].NiveldeAtividade


def test_pagina_uppercase_dropped_distributed(spark, depara):
    """F12 'PÁGINA 3' (all-caps OCR): the Java rlike needs (?u) to fold
    the accented Á — the row must be dropped like the Python twin does."""
    ext_rows = [
        ("pg", 0, "user", "x", "t",
         [{"Item": None, "Categoria": None, "Descricao": "PÁGINA 3", "Unidade": None, "Quantidade": "1,0"},
          {"Item": None, "Categoria": None, "Descricao": "Servico real de obra", "Unidade": None, "Quantidade": "2,0"}]),
    ]
    from pdf_ocr_api_spark.pipeline import SERVICE_FIELDS
    ext = spark.createDataFrame(
        ext_rows,
        f"conv_id STRING, turn_idx INT, role STRING, clean_text STRING, doc_text STRING, services ARRAY<STRUCT<{SERVICE_FIELDS}>>",
    )
    svc = conversation.assemble_services(conversation.explode_services(ext)).collect()
    descs = [r.Descricao for r in svc]
    assert "PÁGINA 3" not in descs and "Servico real de obra" in descs


def test_service_rows_equal_array_form(spark, depara):
    """conversation_service_rows (row-form record: nothing
    conversation-sized in the plan) must carry exactly the array form's
    content: same scalars per conversation, same services in
    (turn_idx, svc_idx) order, empty-service conversations preserved."""
    import pandas as pd

    meta = fixtures.fixture_frame(20, with_meta=True)
    sdf = spark.createDataFrame(meta[fixtures.TRANSCRIPT_COLUMNS])
    ext = pipeline.extract_transcripts(sdf, depara)
    tipo = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])
    arr = conversation.conversation_records(ext, tipo).toPandas().set_index("conv_id")
    rows = conversation.conversation_service_rows(ext, tipo).toPandas()

    def _n(v):  # NaN/None/np types → canonical python
        if v is None or (isinstance(v, float) and v != v) or (hasattr(pd, "isna") and pd.isna(v)):
            return None
        return int(v) if isinstance(v, (int, float)) and not isinstance(v, bool) and float(v).is_integer() and not isinstance(v, str) else v

    assert set(rows.conv_id) == set(arr.index)  # empty-service convs kept
    for cid, grp in rows.groupby("conv_id"):
        want = arr.loc[cid]
        first = grp.iloc[0]
        assert _n(first.NumerodaCertidao) == _n(want.NumerodaCertidao), cid
        assert _n(first.Estado) == _n(want.Estado), cid
        assert _n(first.TipodaCertidao) == _n(want.TipodaCertidao), cid
        g = grp[grp.svc_idx.notna()].sort_values(["turn_idx", "svc_idx"])
        got = [
            tuple(_n(x) for x in (r.Item, r.Categoria, r.Descricao, r.Unidade, r.Quantidade))
            for r in g.itertuples()
        ]
        wanted = [
            tuple(_n(s[k]) for k in ("Item", "Categoria", "Descricao", "Unidade", "Quantidade"))
            for s in want.Servicos
        ]
        assert got == wanted, cid


def test_record_schema_matches_twin_contract(spark, depara):
    """The Spark record's field set AND order must equal the twin's
    (ref parseDocument.js:227-236 incl. the de-facto-null
    ObjetodaCertidaCertidao, gpt/extractHeader.js:78-88)."""
    rows = [("c0", 0, "user", "obra em SP", None)]
    sdf = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING")
    ext = pipeline.extract_transcripts(sdf, depara)
    tipo_dim = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])
    recs = conversation.conversation_records(ext, tipo_dim, header_depara=fixtures.DEPARA_RAW)
    want = list(parse_document_py([{"text": "x", "pages": []}], depara).keys())
    got = [c for c in recs.columns if c != "conv_id"]
    assert got == want, (got, want)
    row = recs.collect()[0]
    assert row.ObjetodaCertidaCertidao is None


def test_segmented_scalars_cross_chunk_straddle(spark, depara):
    """J6 tokens that straddle turn AND chunk boundaries must still be
    detected: the normalize strips the '\\n' separators, so
    'Acervo Téc' + 'nico' concatenates to ACERVOTECNICO across turns.
    chunk_turns=1 forces every turn boundary to also be a chunk boundary,
    exercising the '#'-fenced boundary stream; numero/estado stay exact
    (their regexes cannot span the separator)."""
    from pdf_ocr_api_spark.extract.tipo import detect_tipo_certidao
    from pdf_ocr_api_spark.functions import patterns as P

    convs = {
        # token straddles two turns (and two chunks at chunk_turns=1)
        "s1": ["registro de Acervo Téc", "nico junto ao CREA regional"],
        # token straddles THREE turns (middle turn entirely inside it)
        "s2": ["preambulo ACERVOOPE", "RACIO", "NAL do CAU em obra", "numero 98765/2021 em MG"],
        # regex must NOT match across the newline join
        "s3": ["certidao 12345/", "2024 nada", "mas 55555/2020 vale em SP"],
        # no tokens at all
        "s4": ["texto comum sem marcadores", "ainda sem nada"],
        # everything inside one turn (interior path, not the stream)
        "s5": ["Certidão de Acervo Técnico CREA numero 77777/2019 obra em RJ"],
    }
    rows = [
        (cid, i, "user", text, None)
        for cid, turns in convs.items()
        for i, text in enumerate(turns)
    ]
    sdf = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING")
    ext = pipeline.extract_transcripts(sdf, depara)
    tipo_dim = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])

    for chunk_turns in (1, 2, 512):
        recs = (
            conversation.conversation_records(ext, tipo_dim, chunk_turns=chunk_turns)
            .toPandas().set_index("conv_id")
        )
        for cid, turns in convs.items():
            joined = "\n".join(turns)
            want_num = P.extract_numero(joined)
            want_uf = P.extract_estado(joined)
            want_tipo = detect_tipo_certidao(joined, depara.get("listaTiposOriginal"))
            got = recs.loc[cid]
            tipo = got.TipodaCertidao
            tipo = None if tipo is None or tipo != tipo else int(tipo)
            assert got.NumerodaCertidao == want_num, (cid, chunk_turns)
            assert got.Estado == want_uf, (cid, chunk_turns)
            assert tipo == want_tipo, (cid, chunk_turns, tipo, want_tipo)


def test_segmented_scalars_randomized_straddle_fuzz(spark, depara):
    """200 random conversations whose text is CUT AT ARBITRARY CHARACTER
    POSITIONS into turns (tokens and numbers straddle turn boundaries
    mid-token): the segmented scalars must equal the Python twin on the
    '\\n'-joined text for every conversation, at chunk sizes that force
    many chunk boundaries. One Spark job per chunk size (not per case)."""
    import random

    from pdf_ocr_api_spark.extract.tipo import detect_tipo_certidao
    from pdf_ocr_api_spark.functions import patterns as P

    rng = random.Random(20260816)
    vocab = [
        "acervo", "técnico", "ACERVO", "TECNICO", "OPERACIONAL", "cat", "CAO",
        "crea", "CAU", "crt", "CRA", "cfta", "obra", "registro", "xyz",
        "12345/2020", "99999/1999", "1234/2020", "em SP", "no RJ", "MGX",
        "Página 1/2", "texto comum", "certidão", "un", "45,0",
    ]
    convs = {}
    for ci in range(200):
        n_words = rng.randint(3, 25)
        full = " ".join(rng.choice(vocab) for _ in range(n_words))
        # cut into 1..8 turns at arbitrary char positions (mid-token cuts)
        n_turns = rng.randint(1, 8)
        cuts = sorted(rng.sample(range(len(full) + 1), min(n_turns - 1, len(full))))
        turns, prev = [], 0
        for c in cuts:
            turns.append(full[prev:c])
            prev = c
        turns.append(full[prev:])
        convs[f"f{ci:03d}"] = turns

    rows = [
        (cid, i, "user", t, None)
        for cid, turns in convs.items()
        for i, t in enumerate(turns)
    ]
    sdf = spark.createDataFrame(rows, "conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING")
    ext = pipeline.extract_transcripts(sdf, depara)
    tipo_dim = conversation.tipo_dim_df(spark, fixtures.DEPARA_RAW["tipoCertidao"])

    for chunk_turns in (1, 3):
        recs = (
            conversation.conversation_records(ext, tipo_dim, chunk_turns=chunk_turns)
            .toPandas().set_index("conv_id")
        )
        bad = []
        for cid, turns in convs.items():
            # the twin sees each turn's doc_text = the raw prose (text path)
            joined = "\n".join(turns)
            want = (
                P.extract_numero(joined),
                P.extract_estado(joined),
                detect_tipo_certidao(joined, depara.get("listaTiposOriginal")),
            )
            got = recs.loc[cid]
            tipo = got.TipodaCertidao
            tipo = None if tipo is None or tipo != tipo else int(tipo)
            if (got.NumerodaCertidao, got.Estado, tipo) != want:
                bad.append((cid, chunk_turns, (got.NumerodaCertidao, got.Estado, tipo), want, turns))
        assert not bad, bad[:3]


def test_segmented_assembly_equals_monolithic(spark, depara):
    """The segmented-scan assembly (chunked A4/A6 + prefix combine) must
    be byte-identical to the single-window version — including the hot
    skewed conversation and tiny chunk sizes that force many chunks."""
    meta = fixtures.fixture_frame(25, with_meta=True)
    sdf = spark.createDataFrame(meta[fixtures.TRANSCRIPT_COLUMNS])
    ext = pipeline.extract_transcripts(sdf, depara)
    svc = conversation.explode_services(ext)

    cols = ["conv_id", "turn_idx", "svc_idx", "Item", "Categoria", "Descricao", "Unidade", "Quantidade"]
    a = (
        conversation.assemble_services(svc)
        .select(cols).orderBy("conv_id", "turn_idx", "svc_idx").toPandas()
    )
    for chunk_turns in (3, 512):  # 3 forces many chunks even on tiny convs
        b = (
            conversation.assemble_services_segmented(svc, chunk_turns=chunk_turns)
            .select(cols).orderBy("conv_id", "turn_idx", "svc_idx").toPandas()
        )
        assert a.equals(b), f"chunk_turns={chunk_turns}"
