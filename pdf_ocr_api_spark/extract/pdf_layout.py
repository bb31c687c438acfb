"""Geometric PDF-layout analyzer (SURVEY §7 Phase 2 (b)).

From-scratch reading-order recovery over the Adobe-Extract element model
(ref result.zip → structuredData.json: elements with ``Text``, ``Bounds``
``[x0, y0, x1, y1]`` in bottom-up PDF coordinates, ``Page``, ``Path``),
replacing the reference's cloud layout analysis (S5/S8) with a
deterministic simplified XY-cut:

1. per page, sort elements top-to-bottom (descending y-top);
2. segment into vertical bands: full-width elements (> 60 % of the page
   content width) break the flow and form their own band; runs of narrow
   elements form multi-column bands;
3. inside a band, detect column boundaries by gaps > ``COL_GAP_FRAC`` of
   page width in the sorted x0 distribution; order columns left→right,
   elements within a column top→bottom then left→right;
4. emit texts in that order with char spans into the joined clean text.

numpy-vectorized over the element arrays (a turn's payload is one
document; elements per page are typically O(100)).
"""

from __future__ import annotations

import numpy as np

from ..functions.normalize import clean_line

FULL_WIDTH_FRAC = 0.6
COL_GAP_FRAC = 0.07


def _leaf(path: str | None) -> str:
    if not path:
        return "El"
    leaf = path.rstrip("/").split("/")[-1]
    return leaf.rstrip("[]0123456789") or "El"


def _order_band(idx: np.ndarray, x0: np.ndarray, ytop: np.ndarray, page_w: float) -> list[int]:
    """Order one multi-column band: columns left→right, top→bottom inside."""
    if len(idx) <= 1:
        return list(idx)
    xs = np.sort(np.unique(x0[idx]))
    boundaries: list[float] = []
    if len(xs) > 1:
        gaps = np.diff(xs)
        for g_i in np.nonzero(gaps > COL_GAP_FRAC * page_w)[0]:
            boundaries.append((xs[g_i] + xs[g_i + 1]) / 2.0)
    col_of = np.digitize(x0[idx], boundaries) if boundaries else np.zeros(len(idx), dtype=int)
    out: list[int] = []
    for c in range(int(col_of.max()) + 1 if len(col_of) else 0):
        members = idx[col_of == c]
        order = np.lexsort((x0[members], -ytop[members]))
        out.extend(members[order].tolist())
    return out


def reading_order(elements: list[dict], pages: list[dict] | None = None) -> list[int]:
    """Return element indices in reading order (text elements only)."""
    page_dims = {p.get("page_number", i): float(p.get("width", 612.0)) for i, p in enumerate(pages or [])}

    keep = [
        i
        for i, e in enumerate(elements)
        if isinstance(e, dict)
        and e.get("Text")
        and isinstance(e.get("Bounds"), (list, tuple))
        and len(e["Bounds"]) == 4
    ]
    if not keep:
        return []

    page = np.array([elements[i].get("Page", 0) or 0 for i in keep])
    b = np.array([elements[i]["Bounds"] for i in keep], dtype=float)
    x0, ytop, x1 = b[:, 0], b[:, 3], b[:, 2]
    width = x1 - x0

    ordered: list[int] = []
    for pg in np.unique(page):
        page_w = page_dims.get(int(pg), 612.0)
        mask = np.nonzero(page == pg)[0]
        # top-to-bottom scan of the page
        scan = mask[np.argsort(-ytop[mask], kind="stable")]
        full = width[scan] > FULL_WIDTH_FRAC * page_w

        band: list[int] = []
        for pos, el in enumerate(scan):
            if full[pos]:
                if band:
                    ordered.extend(_order_band(np.array(band), x0, ytop, page_w))
                    band = []
                ordered.append(int(el))
            else:
                band.append(int(el))
        if band:
            ordered.extend(_order_band(np.array(band), x0, ytop, page_w))

    return [keep[i] for i in ordered]


def _style_of(el: dict) -> tuple:
    """Styling attributes of an element (ref Extract-with-styling output,
    src/extractpdf/extract-text-table-info-with-styling-info-from-pdf.js:51-54
    `getStylingInfo: true` → Font/TextSize/Lang fields on each element of
    structuredData.json). Absent fields → None."""
    font = el.get("Font") if isinstance(el.get("Font"), dict) else {}
    ts = el.get("TextSize")
    return (
        font.get("family_name"),
        int(font["weight"]) if isinstance(font.get("weight"), (int, float)) else None,
        bool(font["italic"]) if isinstance(font.get("italic"), bool) else None,
        float(ts) if isinstance(ts, (int, float)) else None,
        el.get("Lang") if isinstance(el.get("Lang"), str) else None,
    )


def extract_pdf_layout(doc: dict, with_styling: bool = False) -> tuple[str, list[tuple]]:
    """Extract reading-ordered text from an Adobe-element-model document.

    Returns ``(clean_text, spans)``; spans are ``(start, end, path_leaf)``
    offsets into clean_text, one per element — or, with
    ``with_styling=True``, ``(start, end, path_leaf, font_family,
    font_weight, italic, text_size, lang)`` mirroring the reference's
    styling-enriched element model.
    """
    elements = doc.get("elements")
    if not isinstance(elements, list):
        elements = []
    pages = doc.get("pages")
    if not isinstance(pages, list):
        pages = []
    order = reading_order(elements, pages)

    spans: list[tuple] = []
    parts: list[str] = []
    pos = 0
    for i in order:
        text = clean_line(elements[i].get("Text") or "")
        if not text:
            continue
        start = pos
        parts.append(text)
        pos += len(text)
        leaf = _leaf(elements[i].get("Path"))
        if with_styling:
            spans.append((start, pos, leaf) + _style_of(elements[i]))
        else:
            spans.append((start, pos, leaf))
        pos += 1
    return "\n".join(parts), spans


def document_metadata(doc: dict) -> tuple:
    """Per-document ``extended_metadata`` projection (§2.9 pdf-properties
    analogue — ref src/pdfproperties/get-pdf-properties.js:67-69 surfaces
    fileSize/pdfVersion/pageCount; the golden ``structuredData.json``
    carries ``extended_metadata{language, page_count, pdf_version,
    is_encrypted}`` and per-page ``is_scanned``/``rotation``).

    Returns ``(language_hint, page_count, pdf_version, is_encrypted,
    is_scanned, rotation)``: declared ``extended_metadata`` fields pass
    through verbatim when present; ``page_count`` falls back to
    ``len(pages)``; ``is_scanned`` is the any-page OR; ``rotation`` is
    the first page's. The language *hint* is only the declared field —
    content-based fallback (``ops.textstats.lang_id``) is composed
    Spark-side in ``pipeline.with_extended_metadata`` so the heuristic
    stays a JVM expression, not Python."""
    ext = doc.get("extended_metadata")
    if not isinstance(ext, dict):
        ext = {}
    pages = doc.get("pages")
    if not isinstance(pages, list):
        pages = []
    page_dicts = [p for p in pages if isinstance(p, dict)]

    lang = ext.get("language")
    pc = ext.get("page_count")
    if not isinstance(pc, int) or isinstance(pc, bool):
        pc = len(pages) if pages else None
    ver = ext.get("pdf_version")
    enc = ext.get("is_encrypted")
    scanned = None
    if any("is_scanned" in p for p in page_dicts):
        scanned = any(bool(p.get("is_scanned")) for p in page_dicts)
    rot = None
    for p in page_dicts:
        r = p.get("rotation")
        if isinstance(r, (int, float)) and not isinstance(r, bool):
            rot = int(r)
        break
    return (
        lang if isinstance(lang, str) else None,
        pc,
        ver if isinstance(ver, str) else None,
        enc if isinstance(enc, bool) else None,
        scanned,
        rot,
    )
