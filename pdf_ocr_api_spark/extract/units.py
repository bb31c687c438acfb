"""Unit-dimension lookups J1/J4/J5 (SURVEY.md §2.3).

Behavior-faithful reimplementation of the reference's unit resolution:
* ``normalize_unidade``  — ref parser/normalizeUnidade.js:25-66 (J1)
* ``detect_unidade``     — ref parser/parseServices.js:70-105 (J4)
* ``infer_unidade_from_descricao`` — ref parser/parseServices.js:107-119 (J5)

These run inside the per-turn parser cascade (the unit token is *stripped
from the line*, so resolution cannot be deferred to a join). The
DataFrame-level broadcast-join equivalent of J1 lives in
``pdf_ocr_api_spark.conversation`` for SQL-expressible normalization of
already-extracted unit strings.

Order sensitivity: both J1 and J4 iterate the unit list in its given
order, first match wins — preserved exactly.
"""

from __future__ import annotations

import functools
import re

from ..functions.normalize import clean_ocr, normalize_header

# ref parser/normalizeUnidade.js:3-11
ALIASES: dict[str, list[str]] = {
    "METROQUADRADO": ["M2", "M²", "METROQUADRADO"],
    "METROCUBICO": ["M3", "M³", "METROCUBICO"],
    "QUILOGRAMA": ["KG", "QUILOGRAMA"],
    "METRO": ["M", "METRO"],
    "UNIDADE": ["UN", "UNIDADE", "UT"],
    "MES": ["MES", "MÊS"],
    "HORA": ["H", "HORA"],
}


def _raw_nome(item: dict) -> str:
    return item.get("unidadeNome") or item.get("valor") or item.get("nome") or ""


# per-dimension-list lookup tables (cleaned key → first matching id, in
# LIST order — first match wins exactly like the reference's loop); the
# tables depend only on the list contents, so they are built once per
# distinct list and every normalize_unidade call becomes two dict probes
_NORM_CACHE: dict[tuple, dict] = {}
# id(list) → (held list ref, prep): identity fast path, same rationale
# as _PREP_BY_ID below (key construction walks the whole list per call)
_NORM_BY_ID: dict[int, tuple] = {}


def _prepare_norm(lista_unidades) -> dict:
    # identity fast path assumes the depara list is IMMUTABLE job config
    # (it is: captured once per extractor closure, like the reference's
    # per-job payload). The len() check catches the common append/remove
    # mutation and falls back to the content-key path; in-place edits of
    # an item dict are NOT detected — copy the list to change it.
    ent = _NORM_BY_ID.get(id(lista_unidades))
    if ent is not None and ent[0] is lista_unidades and len(ent[0]) == ent[2]:
        return ent[1]
    key = tuple((item.get("id"), _raw_nome(item)) for item in lista_unidades)
    prep = _NORM_CACHE.get(key)
    if prep is not None:
        if len(_NORM_BY_ID) > 64:
            _NORM_BY_ID.clear()
        _NORM_BY_ID[id(lista_unidades)] = (lista_unidades, prep, len(lista_unidades))
        return prep

    exact: dict[str, int] = {}
    for item in lista_unidades:
        raw = _raw_nome(item)
        if not raw:
            continue
        partes = raw.split(" - ")
        primeiro = (partes[0] or "").strip()
        sigla_limpa = clean_ocr(
            primeiro.split()[0] if " " in primeiro and primeiro.split() else primeiro
        )
        nome_limpo = clean_ocr(partes[1] if len(partes) > 1 else "")
        for k in (sigla_limpa, nome_limpo):
            exact.setdefault(k, item["id"])

    # alias groups: cleaned variant → first item whose cleaned sigla is in
    # the group (None when the group has no item — the original loop then
    # falls through, i.e. the variant simply resolves to nothing)
    alias: dict[str, int | None] = {}
    for variantes in ALIASES.values():
        cleaned = [clean_ocr(v) for v in variantes]
        group_id = None
        for item in lista_unidades:
            raw = _raw_nome(item)
            sigla = clean_ocr(raw.split(" - ")[0] or "")
            if sigla in cleaned:
                group_id = item["id"]
                break
        for cv in cleaned:
            # a variant already resolved by an earlier group keeps it; a
            # variant whose earlier group had NO item falls through to
            # this group — exactly the reference loop's continue
            if alias.get(cv) is None:
                alias[cv] = group_id

    prep = {"exact": exact, "alias": alias}
    if len(_NORM_CACHE) > 64:
        _NORM_CACHE.clear()
    _NORM_CACHE[key] = prep
    if len(_NORM_BY_ID) > 64:
        _NORM_BY_ID.clear()
    _NORM_BY_ID[id(lista_unidades)] = (lista_unidades, prep, len(lista_unidades))
    return prep


def normalize_unidade(unidade_extraida: str | None, lista_unidades) -> int | None:
    """J1 — exact match on cleaned sigla or full name, then alias
    fallback (ref parser/normalizeUnidade.js:25-66; list order = first
    match wins, preserved by the prepared tables)."""
    if not unidade_extraida:
        return None
    if not isinstance(lista_unidades, list):
        return None

    prep = _prepare_norm(lista_unidades)
    limpa = clean_ocr(unidade_extraida)
    hit = prep["exact"].get(limpa)
    if hit is not None:
        return hit
    return prep["alias"].get(limpa)


_WORDLIKE = re.compile(r"^[A-Za-z0-9_]+$")


@functools.lru_cache(maxsize=4096)
def _build_unit_regex(termo: str) -> re.Pattern:
    """ref parseServices.js:73-78 — escape; \\b wrap only for word-like
    terms (JS \\b is ASCII → re.ASCII for the word-like branch)."""
    escaped = re.escape(termo)
    if _WORDLIKE.match(termo):
        return re.compile(rf"\b{escaped}\b", re.IGNORECASE | re.ASCII)
    return re.compile(escaped, re.IGNORECASE)


def _partes(item: dict) -> list[str]:
    raw = _raw_nome(item)
    parts = raw.split(" - ")
    sigla = (parts[0] or "").strip()
    nome_completo = " - ".join(parts[1:]).strip()
    return [p for p in (sigla, nome_completo) if p]


# prepared per-dimension matcher cache: termo regexes in list order plus a
# cheap union "gate" — most prose lines contain no unit token at all, and
# the gate skips the ordered per-term scan for them (~2× on the text path)
_PREP_CACHE: dict[tuple, dict] = {}
# id(list) → (held list ref, prep); the ref pins the id (see _prepare_units)
_PREP_BY_ID: dict[int, tuple] = {}


def _prepare_units(lista_unidades) -> dict:
    # identity fast path: the depara list object is stable for the life
    # of the extractor closure, and building the content key below walks
    # the whole unit list (~15 µs/call — profiled as HALF of
    # detect_unidade's cost across 9k calls/batch). The held reference
    # keeps id() from being reused. Immutability assumption + len guard:
    # see _prepare_norm.
    ent = _PREP_BY_ID.get(id(lista_unidades))
    if ent is not None and ent[0] is lista_unidades and len(ent[0] or ()) == ent[2]:
        return ent[1]
    key = tuple((item.get("id"), _raw_nome(item)) for item in (lista_unidades or []))
    prep = _PREP_CACHE.get(key)
    if prep is not None:
        if len(_PREP_BY_ID) > 64:
            _PREP_BY_ID.clear()
        _PREP_BY_ID[id(lista_unidades)] = (lista_unidades, prep, len(lista_unidades or ()))
        return prep

    entries: list[list[tuple[str, re.Pattern]]] = []
    word_terms: list[str] = []
    other_terms: list[str] = []
    for item in lista_unidades or []:
        termos = _partes(item)
        if not termos or not termos[0]:
            continue
        tlist = []
        for termo in termos:
            if not termo:
                continue
            tlist.append((termo, _build_unit_regex(termo)))
            (word_terms if _WORDLIKE.match(termo) else other_terms).append(re.escape(termo))
        entries.append(tlist)

    gates = []
    if word_terms:
        gates.append(re.compile(r"\b(?:" + "|".join(word_terms) + r")\b", re.IGNORECASE | re.ASCII))
    if other_terms:
        gates.append(re.compile("|".join(other_terms), re.IGNORECASE))

    prep = {"entries": entries, "gates": gates}
    if len(_PREP_CACHE) > 64:
        _PREP_CACHE.clear()
    _PREP_CACHE[key] = prep
    if len(_PREP_BY_ID) > 64:
        _PREP_BY_ID.clear()
    _PREP_BY_ID[id(lista_unidades)] = (lista_unidades, prep, len(lista_unidades or ()))
    return prep


def detect_unidade(linha: str | None, lista_unidades) -> tuple[int | None, str]:
    """J4 — scan the line for any unit sigla/full-name; strip the first
    matched token; first match in LIST order wins (order-sensitive —
    the gate only short-circuits the no-match case, never reorders)."""
    if not linha:
        return None, linha or ""

    prep = _prepare_units(lista_unidades)
    if not any(g.search(linha) for g in prep["gates"]):
        return None, linha

    for tlist in prep["entries"]:
        for termo, rx in tlist:
            m = rx.search(linha)
            if m:
                nova = (linha[: m.start()] + linha[m.end():]).strip()
                return normalize_unidade(termo, lista_unidades), nova

    return None, linha


_PCT_WORDS = re.compile(r"\bPOR\s+CENTO\b|\bPERCENT(UAL|O)?\b", re.ASCII)


def infer_unidade_from_descricao(descricao: str | None, lista_unidades) -> int | None:
    """J5 — '%' anywhere, or POR CENTO / PERCENT(UAL|O) in normalized text."""
    if not descricao:
        return None
    if "%" in descricao:
        return normalize_unidade("%", lista_unidades)
    if _PCT_WORDS.search(normalize_header(descricao)):
        return normalize_unidade("%", lista_unidades)
    return None
