"""Fuzz-parity harness: my parse_services vs the reference via node.

Usage: python tools/parity_check.py [n_cases]
Generates deterministic payloads across kinds, runs both implementations,
prints the first divergence (if any). Exit 0 = full parity.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

from pdf_ocr_api_spark.extract.services import parse_services  # noqa: E402
from pdf_ocr_api_spark import fixtures  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400


def main() -> int:
    depara = fixtures.runtime_depara()
    cases = []
    metas = []
    for i in range(N):
        rng = fixtures.rng_for("parity", i)
        kind = ("pdf_table", "cat", "lines", "plain", "boiler")[i % 5]
        text, _ = fixtures._BUILDERS[kind](rng)
        if kind == "pdf_table":
            doc = json.loads(text)
        else:
            doc = {"text": text, "pages": []}
        cases.append({"doc": doc, "depara": depara})
        metas.append((i, kind))

    proc = subprocess.run(
        ["node", "/root/repo/tools/ref_oracle.js"],
        input=json.dumps({"op": "parseServices", "cases": cases}),
        capture_output=True,
        text=True,
        check=True,
    )
    ref_results = json.loads(proc.stdout)["results"]

    bad = 0
    for (i, kind), case, ref in zip(metas, cases, ref_results):
        mine = parse_services(case["doc"], case["depara"])
        if mine != ref:
            bad += 1
            if bad <= 3:
                print(f"DIVERGENCE case {i} kind={kind}")
                print("  ref :", json.dumps(ref, ensure_ascii=False)[:500])
                print("  mine:", json.dumps(mine, ensure_ascii=False)[:500])
    print(f"{N - bad}/{N} cases match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
