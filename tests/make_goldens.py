"""Freeze extraction goldens over the synthetic corpus.

Run: ``python tests/make_goldens.py``.  Regenerate ONLY when a deliberate
spec change to the extraction kernel is made; the committed file locks
byte-identical `content` per (doc, mode) across engine changes.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from crawler_engine_spark.data import gen
from crawler_engine_spark.kernels.extract import extract_page

N_DOCS = 300
MODES = ["adaptive", "semantic", "structured", "rule_based", "hybrid"]
QUERIES = [None, "spark crawl data", "politeness budget"]


def main() -> None:
    cases = []
    for doc_id in range(0, N_DOCS, 7):  # 43 docs spanning all templates
        html = gen.html_of(doc_id, N_DOCS)
        url = gen.url_of(doc_id)
        for mi, mode in enumerate(MODES):
            query = QUERIES[(doc_id + mi) % len(QUERIES)]
            res = extract_page(url, html, query, mode)
            cases.append(
                {
                    "doc_id": doc_id,
                    "mode": mode,
                    "query": query,
                    "content": res["content"],
                    "confidence_score": res["confidence_score"],
                    "out_links": res["out_links"],
                }
            )
    out = pathlib.Path(__file__).parent / "goldens" / "extraction.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({"n_docs": N_DOCS, "cases": cases}, indent=1))
    print(f"wrote {len(cases)} golden cases to {out}")


if __name__ == "__main__":
    main()
