"""Unit tests for F2-F12 predicates and T7-T11 extractors (SURVEY §2.2/2.7)."""

import pytest

from pdf_ocr_api_spark.functions import patterns as P


BOILER_HITS = [
    "Certidão de Acervo Técnico",
    "certidão  de  acervo  técnico",  # /i + \s+
    "Conselho Regional de Engenharia e Agronomia",
    "Conselho Regional de Engenharia Agronomia",  # optional (e\s+)? group
    "CREA-BA",
    "CREA - BA",
    "Página 3/12",
    "página  12 / 40",
    "Tel: + 55 (71) 3453-8000",
    "Rua Alfa, 123",
    "Impresso em: 01/02/2024",
    "Resolução N° 1025",
    "CERTIFICAMOS , para os devidos fins",
    "Site: www.creaba.org.br",
    "GOVERNO DO ESTADO",
    "un",
    "un   ",
    "Mat. 12.345.678-9",
]

BOILER_MISSES = [
    "Execução de alvenaria de vedação",
    "rua, 123",  # Rua\s+[A-ZÀ-Ú]: /i folds case, but ',' breaks \s+letter
    "Pagina 3",           # needs the slash form
    "unidade",            # ^un\s*$ anchored
    "telefone",
    "",
]


@pytest.mark.parametrize("line", BOILER_HITS)
def test_boilerplate_hits(line):
    assert P.is_boilerplate(line)
    assert any(rx.search(line) for rx in P.BOILERPLATE_PATTERNS)


@pytest.mark.parametrize("line", BOILER_MISSES)
def test_boilerplate_misses(line):
    assert not P.is_boilerplate(line)


def test_combined_equals_individual():
    for line in BOILER_HITS + BOILER_MISSES:
        assert P.is_boilerplate(line) == any(rx.search(line) for rx in P.BOILERPLATE_PATTERNS)


# one witness per BOILERPLATE_PATTERNS_SRC entry, in list order — each must
# match its own pattern, so the grouped-screen equivalence test below
# exercises EVERY pattern through the vectorized path
F2_WITNESSES = [
    "Certidão de Acervo Técnico",
    "Conselho Regional de Engenharia e Agronomia",
    "Conselho Regional de Engenharia",
    "Regional de Engenharia e também Agronomia da Bahia",
    "CREA-BA",
    "Página 3 / 10",
    "vinculado à Certidão",
    "Chave de Impressão",
    "Certidão º 123 / 2020",
    "01/02/2024, 10:",
    "/02/2024, 10:",
    "Tel: +55 (71)",
    "Avenida 123",
    "Rua Alberto",
    "Plataforma G, Lado A",
    "Centro Administrativo da Bahia",
    "Salvador-Bahia CEP 40000",
    "Impresso em: 01/02/2024",
    "Este documento encontra-se registrado",
    "O documento neste ato registrado",
    "Resolução Nº 123",
    "CERTIFICAMOS, para os devidos fins",
    "Coordenação Executiva de Infraestrutura da Rede",
    "Declaramos que todos os serviços",
    "Comissão Transitória de Recebimento",
    "Coordenador Executivo",
    "Mat. 12.345.678-9",
    "E-mail: creaba@creaba.org.br",
    "Fax: + 55",
    "Site: www.creaba.org.br",
    "GOVERNO DO ESTADO",
    "Secretaria da Saúde do Estado",
    "under F.L. 22",
    "un ",
    "Sílvia Maria Pereira",
    "Fernando da Cunha",
    "Cesar Maurício B",
    "César Mauricio Chastinet",
    "01/02/2024, 09:",
    "  /02/2024, 10: ",
]


def test_f2_witnesses_cover_every_pattern():
    assert len(F2_WITNESSES) == len(P.BOILERPLATE_PATTERNS_SRC)
    for i, (w, rx) in enumerate(zip(F2_WITNESSES, P.BOILERPLATE_PATTERNS)):
        assert rx.search(w), (i, w, P.BOILERPLATE_PATTERNS_SRC[i])


def test_boilerplate_mask_equals_combined():
    """The grouped literal-screen matcher must be EXACTLY the combined
    regex: per-pattern witnesses, case variants, near-misses, and the
    full fixture corpus line set."""
    import pandas as pd

    from pdf_ocr_api_spark import fixtures
    from pdf_ocr_api_spark.functions.normalize import v_clean_line

    probes = list(F2_WITNESSES)
    probes += [w.upper() for w in F2_WITNESSES]
    probes += [w.lower() for w in F2_WITNESSES]
    probes += list(BOILER_HITS) + [x for x in BOILER_MISSES if x]
    probes += ["unido", "un x", "01/02/2024 10:", "rua, 123", "mat 123", "documento comum"]
    s = pd.Series(probes)
    got = P.boilerplate_mask(s)
    want = s.str.contains(P.BOILERPLATE_COMBINED, regex=True)
    assert got.tolist() == want.tolist(), [
        (p, g, w) for p, g, w in zip(probes, got, want) if g != w
    ]

    meta = fixtures.fixture_frame(60)
    lines = v_clean_line(meta["text"].fillna("").str.split("\n").explode())
    lines = lines[lines != ""]
    got = P.boilerplate_mask(lines)
    want = lines.str.contains(P.BOILERPLATE_COMBINED, regex=True)
    assert (got.to_numpy() == want.to_numpy()).all()


def test_garbage_quantidade():
    # ref parseDocument.js:183-190
    assert P.is_garbage_quantidade(".,;:")
    assert P.is_garbage_quantidade("x" * 26)
    assert P.is_garbage_quantidade("1234567890123")        # >12 pure digits
    assert not P.is_garbage_quantidade("123456789012")     # ==12 ok
    assert P.is_garbage_quantidade("1.234.567.890.123.456,78")  # >15 digit mass
    assert not P.is_garbage_quantidade("1.234,56")
    assert not P.is_garbage_quantidade(None)
    assert P.is_garbage_quantidade("")  # trimmed-empty → true (s === "")


def test_garbage_item():
    assert P.is_garbage_item("12345678901")
    assert not P.is_garbage_item("1234567890")
    assert not P.is_garbage_item("1.2.3")
    assert not P.is_garbage_item(None)


def test_unidade_parece_indice():
    assert P.unidade_parece_indice(7)
    assert P.unidade_parece_indice("042")
    assert not P.unidade_parece_indice(0)
    assert not P.unidade_parece_indice("12345")
    assert not P.unidade_parece_indice(None)


def test_detect_quantidade():
    assert P.detect_quantidade("Alvenaria M2 150,00") == ("150,00", "Alvenaria M2")
    assert P.detect_quantidade("sem numero") == (None, "sem numero")
    # trailing sentence period is a (degenerate) quantity — reference quirk
    assert P.detect_quantidade("Frase terminada.") == (".", "Frase terminada")


def test_detect_item():
    assert P.detect_item("1.2.3 Pintura") == ("1.2.3", "Pintura")
    assert P.detect_item("Pintura 1.2") == (None, "Pintura 1.2")
    assert P.detect_item("10Pintura") == ("10", "Pintura")


def test_numero_estado():
    t = "Processo 12345/2024 em Salvador BA"
    assert P.extract_numero(t) == "12345/2024"
    assert P.extract_estado(t) == "BA"
    assert P.extract_numero("123/2024 curto") is None
    # JS/ASCII \b: accented letters are non-word → "ES" inside
    # "VERIFICAÇÕES" IS a match (Java \b differs; see UF_RE_JAVA)
    assert P.extract_estado("MEDIÇÕES VERIFICAÇÕES") == "ES"
    assert P.extract_estado("ESTADO") is None
