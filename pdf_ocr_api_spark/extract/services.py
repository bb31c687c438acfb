"""Service-extraction parser cascade X1-X4 (SURVEY.md §2.8).

Behavior-faithful reimplementation of the reference's tiered parser
(ref parser/parseServices.js:125-314):

* tier 1 — Document-AI-shaped table parse (X1, ref :132-208) using the
  span-slice primitive P1 (ref :7-13) and header→column inference T16
  (ref :24-41);
* tier 2 — CAT semicolon splitter (X2, ref :218-241);
* tier 3 — line-by-line parser restricted to the "Planilha de Serviços"
  section when present (X3, ref :249-311);
* cascade routing: first tier producing rows wins (X4, ref :210,240).

Output row shape (ref :182-190): ``{Item, Categoria, Descricao, Unidade,
Quantidade}`` — strings except ``Unidade`` (int FK into the unidades
dimension), all nullable.

This module is deliberately plain Python over ONE turn's payload: the
vectorization boundary is the turn (a batch of turns is a
``pd.Series`` handled in ``pipeline.py``), matching the "no per-row
Python" rule — rows-within-turn are elements of one document.
"""

from __future__ import annotations

from ..functions import patterns as P
from ..functions.normalize import clean_line, normalize_header
from .units import detect_unidade, infer_unidade_from_descricao, normalize_unidade


def get_text_from_cell(doc_text: str, cell: dict) -> str | None:
    """P1 — resolve a cell via its FIRST text segment (ref :7-13).

    JS ``String.substring`` clamps negatives to 0 and swaps start/end.
    """
    # direct indexing + exception guard: this runs per CELL (75k
    # calls/batch profiled) and the defensive .get chain allocated two
    # fallback dicts per miss-free call
    try:
        segs = cell["layout"]["textAnchor"]["textSegments"]
    except (KeyError, TypeError):
        return None
    if not segs:
        return None
    seg0 = segs[0]
    start = seg0.get("startIndex", 0) or 0
    end = seg0.get("endIndex", 0) or 0
    start, end = max(0, int(start)), max(0, int(end))
    if start > end:
        start, end = end, start
    return (doc_text or "")[start:end].strip() or None


def guess_service_columns(header_cells: list) -> dict:
    """T16 — fuzzy header→column-index map (ref :24-41). -1 = not found."""
    headers = [normalize_header(h or "") for h in header_cells]

    def find(rx) -> int:
        for i, h in enumerate(headers):
            if rx.search(h):
                return i
        return -1

    return {
        "idxItem": find(P.HDR_ITEM),
        "idxDescricao": find(P.HDR_DESCRICAO),
        "idxUnidade": find(P.HDR_UNIDADE),
        "idxQuantidade": find(P.HDR_QUANTIDADE),
    }


def _parse_tables(doc: dict, depara: dict) -> list[dict]:
    """Tier 1 (X1) — ref :132-208."""
    resultado: list[dict] = []
    doc_text = doc.get("text") or ""
    unidades = depara.get("unidades") or []

    # defensive at 10^12-turn scale: malformed payloads (non-list pages/
    # tables) must not kill the task — the reference would throw here
    def _lst(v):
        return v if isinstance(v, list) else []

    def _cells(row):
        # a non-dict row (string/number in bodyRows) reads as "no cells",
        # matching JS row.cells -> undefined -> || [] — never AttributeError
        return row.get("cells") or [] if isinstance(row, dict) else []

    for page in _lst(doc.get("pages")):
        if not isinstance(page, dict):
            continue
        for table in _lst(page.get("tables")):
            if not isinstance(table, dict):
                continue
            header_rows = table.get("headerRows") or []
            header_row = header_rows[0] if header_rows else None
            body_rows = list(table.get("bodyRows") or [])

            # header sometimes arrives as the first body row (ref :138-148)
            if header_row is None and body_rows:
                first_cells = [get_text_from_cell(doc_text, c) for c in _cells(body_rows[0])]
                first_row_text = " ".join("" if c is None else c for c in first_cells).upper()
                if P.HDR_UNIDADE.search(first_row_text) and P.HDR_QUANTIDADE.search(first_row_text):
                    header_row = body_rows[0]
                    body_rows = body_rows[1:]

            header_cells = (
                [get_text_from_cell(doc_text, c) for c in _cells(header_row)]
                if header_row
                else []
            )
            idx = guess_service_columns(header_cells)
            has_service_shape = (
                idx["idxUnidade"] != -1
                and idx["idxQuantidade"] != -1
                and (idx["idxDescricao"] != -1 or idx["idxItem"] != -1 or len(header_cells) > 0)
            )

            for row in body_rows:
                cells = [get_text_from_cell(doc_text, c) for c in _cells(row)]
                if not any(cells):
                    continue

                if has_service_shape:
                    # JS `cells[i]` out of range → undefined → null (no fallback)
                    def cell_at(i: int):
                        return cells[i] if 0 <= i < len(cells) else None

                    item_raw = cell_at(idx["idxItem"]) if idx["idxItem"] != -1 else None
                    item = item_raw if (item_raw and P.ITEM_FULL.match(item_raw)) else None
                    descricao = (
                        cell_at(idx["idxDescricao"])
                        if idx["idxDescricao"] != -1
                        else (cells[0] if cells else None)
                    ) or None
                    unidade_raw = (cell_at(idx["idxUnidade"]) if idx["idxUnidade"] != -1 else None) or None
                    quantidade = (cell_at(idx["idxQuantidade"]) if idx["idxQuantidade"] != -1 else None) or None

                    desc_norm = normalize_header(descricao or "")
                    if not descricao and not item:
                        continue
                    if P.TOTAL_PREFIX.match(desc_norm):
                        continue

                    unidade = normalize_unidade(unidade_raw, unidades)
                    if unidade is None:
                        unidade = infer_unidade_from_descricao(descricao, unidades)
                    resultado.append(
                        {
                            "Item": item,
                            "Categoria": None,
                            "Descricao": descricao,
                            "Unidade": unidade,
                            "Quantidade": quantidade,
                        }
                    )
                    continue

                # legacy branch: numeric-item-first tables (ref :195-206)
                item = cells[0] if cells else None
                if item and P.ITEM_FULL.match(item):
                    resultado.append(
                        {
                            "Item": item,
                            "Categoria": None,
                            "Descricao": (cells[1] if len(cells) > 1 else None) or None,
                            "Unidade": normalize_unidade(cells[2] if len(cells) > 2 else None, unidades),
                            "Quantidade": (cells[3] if len(cells) > 3 else None) or None,
                        }
                    )

    return resultado


def extract_tables_structured(doc: dict) -> list[dict]:
    """Whole-table structured emission (SURVEY §2.9 optional — the
    relational analogue of the reference's Extract TableStructureType.CSV
    renditions, ref src/extractpdf/extract-text-table-info-with-tables-
    structure-from-pdf.js:54-57): every table as
    ``{"page": i, "header": [cells], "rows": [[cells]]}``.

    Cells resolve via the SAME first-segment rule as the service parser
    (P1, ``get_text_from_cell``); unresolved cells become '' so row
    widths stay rectangular for CSV-style consumers. Unlike the tier-1
    service parser this does NOT filter or reshape — it is the faithful
    structured dump of what the payload carries.
    """
    out: list[dict] = []
    doc_text = doc.get("text") or ""

    def _lst(v):
        return v if isinstance(v, list) else []

    def _row(row) -> list[str]:
        cells = row.get("cells") if isinstance(row, dict) else None
        return [(get_text_from_cell(doc_text, c) or "") for c in _lst(cells)]

    for pg_i, page in enumerate(_lst(doc.get("pages"))):
        if not isinstance(page, dict):
            continue
        for table in _lst(page.get("tables")):
            if not isinstance(table, dict):
                continue
            header_rows = _lst(table.get("headerRows"))
            out.append(
                {
                    "page": pg_i,
                    "header": _row(header_rows[0]) if header_rows else [],
                    "rows": [_row(r) for r in _lst(table.get("bodyRows"))],
                }
            )
    return out


def _parse_cat(texto_completo: str, depara: dict) -> list[dict]:
    """Tier 2 (X2) — ref :218-241. Returns [] when the split finds ≤1 segment."""
    resultado: list[dict] = []
    unidades = depara.get("unidades") or []
    # the split separator starts with ';' — skip the lookahead regex
    # entirely for the (majority) texts without one; same result
    if ";" not in texto_completo:
        return []
    segmentos = P.CAT_SPLIT.split(texto_completo)
    if len(segmentos) <= 1:
        return []

    for seg in segmentos:
        # JS: cleanLine(seg.replace(/^Atividade\s+Técnica:\s*/i, "").trim())
        seg = clean_line(P.ATIVIDADE_PREFIX.sub("", seg, count=1).strip())
        if not seg or len(seg) < 10:
            continue
        quantidade, sem_qtd = P.detect_quantidade(seg)
        unidade_id, resto = detect_unidade(sem_qtd, unidades)
        if not quantidade and not unidade_id:
            continue
        item, descricao = P.detect_item(resto)
        resultado.append(
            {
                "Item": item,
                "Categoria": None,
                "Descricao": descricao or resto or None,
                "Unidade": unidade_id,
                "Quantidade": quantidade,
            }
        )
    return resultado


def _parse_lines(texto_completo: str, depara: dict) -> list[dict]:
    """Tier 3 (X3) — ref :249-311."""
    resultado: list[dict] = []
    unidades = depara.get("unidades") or []

    texto_para_linhas = texto_completo
    for rx in P.PLANILHA_MARKERS:
        m = rx.search(texto_completo)
        if m:
            texto_para_linhas = texto_completo[m.end():]
            break

    for linha in texto_para_linhas.split("\n"):
        linha = clean_line(linha)
        if not linha or len(linha) < 5:
            continue

        quantidade, sem_quantidade = P.detect_quantidade(linha)
        unidade_id, sem_unidade = detect_unidade(sem_quantidade, unidades)
        item, resto = P.detect_item(sem_unidade)

        if not quantidade and not unidade_id and not item:
            # isolated ALL-CAPS short line → category row (ref :286-297)
            if P.CATEGORIA_LINE.match(linha) and len(linha) < 60:
                resultado.append(
                    {
                        "Item": None,
                        "Categoria": linha,
                        "Descricao": None,
                        "Unidade": None,
                        "Quantidade": None,
                    }
                )
            continue

        resultado.append(
            {
                "Item": item,
                "Categoria": None,
                "Descricao": resto or None,
                "Unidade": unidade_id,
                "Quantidade": quantidade,
            }
        )
    return resultado


def parse_services_tiered(doc: dict, depara: dict) -> tuple[list[dict], str | None]:
    """X4 cascade — tier 1, else tier 2, else tier 3 (ref :210,240).

    Returns ``(services, tier)`` with tier in {'table', 'cat', 'lines', None}.
    """
    resultado = _parse_tables(doc, depara)
    if resultado:
        return resultado, "table"

    texto_completo = (doc.get("text") or "").replace("\r\n", "\n")

    resultado = _parse_cat(texto_completo, depara)
    if resultado:
        return resultado, "cat"

    resultado = _parse_lines(texto_completo, depara)
    return resultado, ("lines" if resultado else None)


def parse_services(doc: dict, depara: dict) -> list[dict]:
    """X4 cascade, reference-shaped return (ref :210,240)."""
    return parse_services_tiered(doc, depara)[0]


# ---------------------------------------------------------------------------
# Batch-vectorized tier 3 (X3) — identical semantics to _parse_lines for
# payloads WITHOUT planilha markers and WITHOUT the tier-2 ';' pattern
# (the router sends those through the scalar cascade). Operates on the
# already-exploded clean_line'd lines of many turns at once; per-line
# Python survives only for (a) the rare unit-gate hits and (b) the final
# row assembly over precomputed arrays.
# ---------------------------------------------------------------------------

def parse_lines_batch(lines, depara: dict) -> dict:
    """``lines``: pd.Series of cleaned lines (T6 applied), index = turn
    label, in original line order per turn. Returns {label: service_rows}
    with rows byte-identical to ``_parse_lines`` on the same turns.
    """
    import numpy as np
    import pandas as pd

    from .units import _prepare_units

    out: dict = {}
    if lines.empty:
        return out

    keep = (lines != "") & (lines.str.len() >= 5)
    L = lines[keep]
    if L.empty:
        return out

    # T7: trailing quantity + residual (JS $-anchored replace-first + trim)
    qty = L.str.extract(P.QUANTIDADE_TRAILING, expand=False)
    sem_qtd = L.str.replace(P.QUANTIDADE_TRAILING, "", n=1, regex=True).str.strip()

    # J4 gate: the ordered per-term scan only for gate hits
    prep = _prepare_units(depara.get("unidades") or [])
    hit = pd.Series(False, index=L.index)
    for g in prep["gates"]:
        hit = hit | sem_qtd.str.contains(g, regex=True)

    uid = np.full(len(L), None, dtype=object)
    sem_unit = sem_qtd.to_numpy(dtype=object, copy=True)
    if hit.any():
        unidades = depara.get("unidades") or []
        hit_np = hit.to_numpy()
        for i in np.nonzero(hit_np)[0]:
            u, rest = detect_unidade(sem_unit[i], unidades)
            uid[i] = u
            sem_unit[i] = rest

    sem_unit_s = pd.Series(sem_unit, index=L.index, dtype=object)
    # ASCII \d to match the scalar ITEM_LEADING (JS \d is ASCII; a
    # unicode-aware extract would accept full-width OCR digits here
    # while the scalar router path rejects them)
    item = sem_unit_s.str.extract(P.ITEM_LEADING_CAPTURE, expand=False)
    resto = sem_unit_s.str.replace(P.ITEM_LEADING, "", n=1, regex=True).str.strip()

    # X3 category rule: isolated ALL-CAPS short line (ref :286-297).
    # Derive from the SAME compiled pattern the scalar path matches
    # (P.CATEGORIA_LINE is ^...$-anchored; fullmatch needs the bare
    # body) so a future pattern edit cannot desynchronize the twins.
    is_cat = L.str.fullmatch(P.CATEGORIA_LINE.pattern.lstrip("^").rstrip("$")) & (
        L.str.len() < 60
    )

    labels = L.index.to_numpy()
    l_np = L.to_numpy(dtype=object)
    qty_np = qty.to_numpy(dtype=object)
    item_np = item.to_numpy(dtype=object)
    resto_np = resto.to_numpy(dtype=object)
    cat_np = is_cat.to_numpy()

    for j in range(len(labels)):
        q = qty_np[j] if isinstance(qty_np[j], str) else None
        it = item_np[j] if isinstance(item_np[j], str) else None
        u = uid[j]
        lbl = labels[j]
        if not q and not u and not it:
            if cat_np[j]:
                out.setdefault(lbl, []).append(
                    {"Item": None, "Categoria": l_np[j], "Descricao": None, "Unidade": None, "Quantidade": None}
                )
            continue
        r = resto_np[j]
        out.setdefault(lbl, []).append(
            {"Item": it, "Categoria": None, "Descricao": r or None, "Unidade": u, "Quantidade": q}
        )
    return out
