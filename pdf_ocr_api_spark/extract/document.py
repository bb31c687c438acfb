"""Conversation/document-level assembly — single-process twin (SURVEY §2.4).

Behavior-faithful reimplementation of the reference's document assembly
(ref parser/parseDocument.js:54-237): ordered concat (A1), first-chunk
header (A2), numero/estado scalars (T10/T11), item renumbering (A5/A6),
category inheritance (A4), category-header dedupe (F7), boilerplate +
garbage filters (F2-F12), tipo detection (J6).

This module is the *oracle twin* used by golden tests and small inputs.
The distributed implementation with the same semantics — window exprs +
column predicates over exploded service rows — lives in
``pdf_ocr_api_spark.conversation``; tests assert both produce identical
results.
"""

from __future__ import annotations

from ..functions import patterns as P
from .services import parse_services
from .tipo import detect_tipo_certidao


def sem_quantidade(qtd) -> bool:
    """ref parseDocument.js:6-10 — null/empty/whitespace-only."""
    if qtd is None:
        return True
    return str(qtd).strip() == ""


def categoria_por_prefixo(descricao) -> str | None:
    """T9 — prefix up to the EARLIER of " - " / ":" (ref :13-24)."""
    if not descricao or not isinstance(descricao, str):
        return None
    d = descricao.strip()
    if not d:
        return None
    fim = len(d)
    idx_traco = d.find(" - ")
    idx_dois = d.find(":")
    if idx_traco != -1:
        fim = min(fim, idx_traco)
    if idx_dois != -1:
        fim = min(fim, idx_dois)
    prefixo = d[:fim].strip()
    return prefixo or None


def preencher_categoria(servicos: list[dict]) -> list[dict]:
    """A4 — stateful category inheritance (ref :30-52)."""
    if not isinstance(servicos, list) or not servicos:
        return servicos
    categoria_vigente = None
    out = []
    for s in servicos:
        descricao = s.get("Descricao")
        eh_linha_mae = sem_quantidade(s.get("Quantidade"))
        if eh_linha_mae and descricao:
            categoria_vigente = descricao.strip()
            out.append({**s, "Categoria": categoria_vigente})
            continue
        categoria = categoria_vigente
        if categoria is None:
            categoria = categoria_por_prefixo(descricao)
        out.append({**s, "Categoria": categoria})
    return out


def renumerar_itens(servicos: list[dict]) -> list[dict]:
    """A5+A6 — when ALL items blank, number rows that have quantity (ref :104-114)."""
    todos_em_branco = all(
        s.get("Item") is None or str(s.get("Item")).strip() == "" for s in servicos
    )
    if not (todos_em_branco and servicos):
        return servicos
    contador = 0
    out = []
    for s in servicos:
        if not sem_quantidade(s.get("Quantidade")):
            contador += 1
            out.append({**s, "Item": str(contador)})
        else:
            out.append({**s, "Item": None})
    return out


def filtrar_cabecalho_categoria(servicos: list[dict]) -> list[dict]:
    """F7 — drop pure category-header rows (ref :123-133)."""
    out = []
    for s in servicos:
        sem_item = s.get("Item") is None or str(s["Item"]).strip() == ""
        sem_unidade = s.get("Unidade") is None or str(s["Unidade"]).strip() == ""
        sem_qtd = sem_quantidade(s.get("Quantidade"))
        cat = str(s["Categoria"]).strip() if s.get("Categoria") is not None else ""
        desc = str(s["Descricao"]).strip() if s.get("Descricao") is not None else ""
        if sem_item and sem_unidade and sem_qtd and cat != "" and cat == desc:
            continue
        out.append(s)
    return out


def filtrar_boilerplate(servicos: list[dict]) -> list[dict]:
    """F2-F6, F11-F12 — garbage/boilerplate row filters (ref :202-215)."""
    out = []
    for s in servicos:
        cat = (s.get("Categoria") is not None and str(s["Categoria"]).strip()) or ""
        desc = (s.get("Descricao") is not None and str(s["Descricao"]).strip()) or ""
        text = f"{cat} {desc}".strip()
        if len(text) > P.DESC_MAX_LENGTH:
            continue
        if desc and P.PAGINA_DESC.match(desc):
            continue
        if s.get("Quantidade") is not None and str(s["Quantidade"]).strip() == "47" and not desc:
            continue
        if P.is_garbage_quantidade(s.get("Quantidade")):
            continue
        if P.is_garbage_item(s.get("Item")):
            continue
        if (cat == "un" or desc == "un") and not s.get("Quantidade") and not s.get("Item"):
            continue
        if (
            P.unidade_parece_indice(s.get("Unidade"))
            and sem_quantidade(s.get("Quantidade"))
            and cat
            and cat == desc
        ):
            continue
        if P.is_boilerplate(text):
            continue
        out.append(s)
    return out


def parse_document_py(docs, depara: dict) -> dict:
    """Full document assembly, semantics of ref parseDocument.js:54-237.

    ``docs``: ordered list of per-chunk/turn document dicts ``{text, pages}``.
    Header GPT fields are the reference's de-facto all-null error path
    (ref gpt/extractHeader.js:123-133) — see ``tipo.deterministic_header``
    for the opt-in rule-based enrichment.
    """
    documentos = docs if isinstance(docs, list) else [docs]

    texto_completo = "\n".join((d or {}).get("text") or "" for d in documentos)

    numero = P.extract_numero(texto_completo)
    estado = P.extract_estado(texto_completo)

    servicos: list[dict] = []
    for doc in documentos:
        servicos.extend(parse_services(doc or {}, depara))

    servicos = renumerar_itens(servicos)
    servicos = preencher_categoria(servicos)
    servicos = filtrar_cabecalho_categoria(servicos)
    servicos = filtrar_boilerplate(servicos)

    tipo_id = detect_tipo_certidao(texto_completo, depara.get("listaTiposOriginal"))

    return {
        "NumerodaCertidao": numero,
        "ObjetodaCertidaCertidao": None,
        "TipodaCertidao": tipo_id,
        "QualificacaoObra": None,
        "QualificacaoEspecifica": None,
        "NiveldeAtividade": None,
        "Estado": estado,
        "Servicos": servicos,
    }
