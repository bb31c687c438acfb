"""Regenerate the frozen golden fixtures under tests/golden/.

Run ONLY when the extraction contract changes deliberately; review the
diff by hand before committing (the goldens are the per-turn
byte-equality gate, FIXTURES.md §3).

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pdf_ocr_api_spark import fixtures, pipeline  # noqa: E402

GOLDEN = Path(__file__).resolve().parents[1] / "tests" / "golden" / "tiny_extracted.jsonl.gz"


def main() -> int:
    meta = fixtures.fixture_frame(15, with_meta=True)
    out = pipeline._extract_frame(meta[fixtures.TRANSCRIPT_COLUMNS], fixtures.runtime_depara())
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    cols = [
        "conv_id", "turn_idx", "kind", "clean_text", "spans", "services",
        "doc_text", "n_chars_in", "n_chars_out",
    ]
    rows = out[cols].to_dict("records")
    with gzip.open(GOLDEN, "wt", encoding="utf-8") as f:
        for r in rows:
            r["turn_idx"] = int(r["turn_idx"])
            r["n_chars_in"] = int(r["n_chars_in"])
            r["n_chars_out"] = int(r["n_chars_out"])
            f.write(json.dumps(r, ensure_ascii=False, sort_keys=True) + "\n")
    print(f"wrote {len(rows)} golden turns to {GOLDEN}")
    print("review the diff (git diff tests/golden/) before committing!")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
