"""Text normalizers T1-T6 (SURVEY.md §2.7).

Each reimplements, from behavior, one of the reference's normalization
helpers (cited per function). Two shapes per normalizer:

* a scalar Python function (used inside the per-turn parser cascade), and
* a vectorized ``pandas.Series`` variant (used in mapInPandas batches).

JS→Python semantics notes (verified against node goldens in tests/):
* ``String.prototype.toUpperCase()`` ≈ ``str.upper()`` for BMP text.
* ``normalize("NFD").replace(/[̀-ͯ]/g, "")`` ≈
  ``unicodedata.normalize("NFD", s)`` + the same codepoint-range strip.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

_COMBINING = re.compile("[̀-ͯ]")
_WS = re.compile(r"\s+")


def strip_accents_upper(s: str) -> str:
    """upper → NFD → strip combining marks (shared core of T1-T5)."""
    return _COMBINING.sub("", unicodedata.normalize("NFD", s.upper()))


def normalize_header(s: str | None) -> str:
    """T1 — ref parser/parseServices.js:15-22 (normalizeHeader):
    upper, NFD-strip, collapse whitespace to single space, trim."""
    if s is None:
        s = ""
    return _WS.sub(" ", strip_accents_upper(s)).strip()


def normaliza_depara(s: str | None) -> str | None:
    """T2 — ref parser/normalizeDepara.js:1-8: like T1 (single spaces kept)."""
    if s is None:
        return None
    return _WS.sub(" ", strip_accents_upper(s)).strip()


def normaliza_sigla(s: str | None) -> str | None:
    """T3 — ref parser/mapBySigla.js:1-7: upper/NFD-strip, remove ALL whitespace."""
    if s is None:
        return None
    return _WS.sub("", strip_accents_upper(s))


def normalize_tipo(s: str | None) -> str:
    """T4 — ref parser/detectTipoCertidao.js:1-7: upper/NFD-strip,
    keep only [A-Z0-9]."""
    if s is None:
        s = ""
    return re.sub(r"[^A-Z0-9]", "", strip_accents_upper(s))


import functools


@functools.lru_cache(maxsize=65536)
def clean_ocr(s: str | None) -> str:
    """T5 — ref parser/normalizeUnidade.js:13-23 (cleanOCR):
    upper/NFD-strip, drop all whitespace, ×→X, '/' and '-'→X,
    keep '%' plus [A-Z0-9X]. Pure and called tens of thousands of times
    per batch on a small repeating unit vocabulary — memoized."""
    if s is None:
        s = ""
    out = strip_accents_upper(s)
    out = _WS.sub("", out)
    out = out.replace("×", "X")  # ×
    out = re.sub(r"[/\-]", "X", out)
    return re.sub(r"[^A-Z0-9X%]", "", out)


def clean_line(s: str | None) -> str:
    """T6 — ref parser/parseServices.js:43-48 (cleanLine):
    collapse whitespace runs to one space, NBSP→space, trim.

    NOTE the reference order: ``replace(/\\s+/g," ")`` FIRST, then
    NBSP→space. JS ``\\s`` already matches NBSP, so the second replace
    is a no-op there; Python ``\\s`` also matches NBSP — same result.
    """
    if s is None:
        s = ""
    return _WS.sub(" ", s).replace(" ", " ").strip()


# ---------------------------------------------------------------------------
# Vectorized pandas variants (Arrow-batch hot path — no per-row Python)
# ---------------------------------------------------------------------------

def v_strip_accents_upper(s: pd.Series) -> pd.Series:
    return (
        s.fillna("")
        .str.upper()
        .str.normalize("NFD")
        .str.replace(_COMBINING, "", regex=True)
    )


def v_normalize_header(s: pd.Series) -> pd.Series:
    """Vectorized T1."""
    return v_strip_accents_upper(s).str.replace(_WS, " ", regex=True).str.strip()


def v_clean_line(s: pd.Series) -> pd.Series:
    """Vectorized T6."""
    return (
        s.fillna("")
        .str.replace(_WS, " ", regex=True)
        .str.replace(" ", " ", regex=False)
        .str.strip()
    )


def v_clean_ocr(s: pd.Series) -> pd.Series:
    """Vectorized T5."""
    out = v_strip_accents_upper(s)
    out = out.str.replace(_WS, "", regex=True)
    out = out.str.replace("×", "X", regex=False)
    out = out.str.replace(r"[/\-]", "X", regex=True)
    return out.str.replace(r"[^A-Z0-9X%]", "", regex=True)
