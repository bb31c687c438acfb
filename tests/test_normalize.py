"""Unit tests for T1-T6 normalizers (SURVEY §2.7) — scalar and vectorized."""

import pandas as pd
import pytest

from pdf_ocr_api_spark.functions import normalize as N


CASES_HEADER = [
    ("Descrição dos Serviços", "DESCRICAO DOS SERVICOS"),
    ("  Quantidade\t\n Executada ", "QUANTIDADE EXECUTADA"),
    ("ÁÉÍÓÚ àèìòù ç Ç ãõ", "AEIOU AEIOU C C AO"),
    ("", ""),
    ("a b", "A B"),  # NBSP collapsed by \s+
]


@pytest.mark.parametrize("raw,want", CASES_HEADER)
def test_normalize_header(raw, want):
    assert N.normalize_header(raw) == want


def test_normalize_header_none():
    assert N.normalize_header(None) == ""


@pytest.mark.parametrize(
    "raw,want",
    [
        ("M²", "M2"),          # NFD: ² is not decomposed-combining; kept? → see below
        ("m2", "M2"),
        ("M 2", "M2"),
        ("M/2", "MX2"),
        ("M-2", "MX2"),
        ("M×2", "MX2"),
        ("48,69%", "4869%"),
        ("Mês", "MES"),
        ("  un  ", "UN"),
    ],
)
def test_clean_ocr(raw, want):
    # note: "²" has compatibility (not canonical) decomposition — NFD keeps
    # it, then [^A-Z0-9X%] drops it; so M² → M, matching the reference,
    # whose alias table handles M² explicitly (normalizeUnidade.js:3-11)
    if raw == "M²":
        assert N.clean_ocr(raw) == "M"
    else:
        assert N.clean_ocr(raw) == want


def test_clean_line_nbsp_and_ws():
    assert N.clean_line("a  b   c\t d") == "a b c d"
    assert N.clean_line(None) == ""


def test_normaliza_sigla():
    assert N.normaliza_sigla("Metro Quadrado") == "METROQUADRADO"
    assert N.normaliza_sigla(None) is None


def test_normalize_tipo():
    assert N.normalize_tipo("CAT – CREA") == "CATCREA"
    assert N.normalize_tipo("Acervo Técnico!") == "ACERVOTECNICO"


def test_vectorized_matches_scalar():
    vals = [c[0] for c in CASES_HEADER] + ["Coordenação", None, "x\r\ny"]
    s = pd.Series(vals)
    got = N.v_normalize_header(s).tolist()
    want = [N.normalize_header(v) for v in vals]
    assert got == want

    got = N.v_clean_line(s).tolist()
    want = [N.clean_line(v) for v in vals]
    assert got == want

    got = N.v_clean_ocr(s).tolist()
    want = [N.clean_ocr(v) for v in vals]
    assert got == want
