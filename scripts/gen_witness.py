#!/usr/bin/env python3
"""Golden-witness oracle fixtures for the extraction family (r3 VERDICT #2).

The extraction queries are byte-deterministic but not SQL-expressible,
so their DuckDB oracles SELECT from witness parquets generated HERE by
the SINGLE-PROCESS kernel loop — a code path with no Spark in it.
tests/test_spark_job.py proves the distributed output byte-equals this
loop, so the witness is an independent ground truth for the driver's
hash compare, not an echo of the Spark plan.

Witnesses are pinned to the driver's correctness scale (sf0.01, the
same constants the queries derive from that sf_dir).  Regenerate with

    python scripts/gen_witness.py

tests/test_witness.py re-derives every witness in-process and fails if
the committed fixtures are stale.
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_pipeline_spark.fixtures.gen_pages import (  # noqa: E402
    generate_rows,
    wrap_document_as_page,
)
from ocr_pipeline_spark.fixtures.gen_pdfs import doc_pdf  # noqa: E402
from ocr_pipeline_spark.kernel.assemble import assemble_document  # noqa: E402
from ocr_pipeline_spark.kernel.page import (  # noqa: E402
    extract_page,
    page_num_from_url,
)
from ocr_pipeline_spark.sources.pdf import (  # noqa: E402
    page_text,
    split_pdf_pages,
    split_pdf_pages_text,
)

SF_DIR = "/root/testdata/sf0.01"
WITNESS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "witness",
)
SEED = 42
# the sf-derived sizes the queries compute from sf_dir at sf0.01
N_ASSEMBLE_PAGES = 2000   # max(500, 0.01 * 200_000)
N_PDF_DOCS = 400          # min(max(100, 0.01 * 40_000), 2000)

_PAGE_SUFFIX = re.compile(r"/page-\d+/?$")


def _assemble(per_doc: dict[str, list[dict]]) -> pd.DataFrame:
    """Ordered per-document fold — mirrors operators/assembly_op.py
    _batch_assemble semantics in plain Python."""
    rows = []
    for doc_key, pages in per_doc.items():
        ordered = sorted(pages, key=lambda p: p["page_num"])
        markdowns = [p["markdown"] for p in ordered]
        n_figures = int(sum(p["n_figures"] for p in ordered))
        diagrams_used = sum(1 for p in ordered if (p["description"] or "") != "")
        doc_name = doc_key.rstrip("/").rsplit("/", 1)[-1] or doc_key
        markdown = assemble_document(
            markdowns, doc_name, n_figures=n_figures, diagrams_used=diagrams_used
        )
        rows.append(
            {
                "doc_key": doc_key,
                "n_pages": len(markdowns),
                "n_figures": n_figures,
                "n_chars": len(markdown),
            }
        )
    return pd.DataFrame(rows).sort_values("doc_key").reset_index(drop=True)


def witness_extract_documents() -> pd.DataFrame:
    """Twin of _q_extract_documents at sf0.01: documents -> wrapped
    pages -> per-page kernel; columns (url, page_type, method,
    markdown, n_chars)."""
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    rows = []
    for d, t, l, s in zip(docs.doc_id, docs.text, docs.lang, docs.source):
        p = wrap_document_as_page(int(d), t, l, s)
        r = extract_page(p["html"], page_num_from_url(p["url"]), describe=True)
        rows.append(
            {
                "url": p["url"],
                "page_type": r.classification["type"],
                "method": r.method,
                "markdown": r.markdown,
                "n_chars": len(r.markdown),
            }
        )
    return pd.DataFrame(rows).sort_values("url").reset_index(drop=True)


def witness_assemble_documents() -> pd.DataFrame:
    """Twin of _q_assemble_documents at sf0.01: synthetic pages corpus
    -> kernel -> per-document ordered assembly; columns (doc_key,
    n_pages, n_figures, n_chars)."""
    per_doc: dict[str, list[dict]] = {}
    for p in generate_rows(N_ASSEMBLE_PAGES, SEED):
        r = extract_page(p["html"], page_num_from_url(p["url"]), describe=True)
        doc_key = _PAGE_SUFFIX.sub("", p["url"])
        per_doc.setdefault(doc_key, []).append(
            {
                "page_num": page_num_from_url(p["url"]),
                "markdown": r.markdown,
                "n_figures": r.n_figures,
                "description": r.description,
            }
        )
    return _assemble(per_doc)


def witness_extract_pdf_documents() -> pd.DataFrame:
    """Twin of _q_extract_pdf_documents at sf0.01: PDF corpus ->
    structural text split -> html wrap (sources/pdf.py:pdf_to_pages_df
    convention) -> kernel -> assembly; columns (doc_key, n_pages,
    n_chars)."""
    import html as _html

    per_doc: dict[str, list[dict]] = {}
    for i in range(N_PDF_DOCS):
        url, payload, _ = doc_pdf(SEED, i)
        for page in split_pdf_pages_text(payload):
            body = "".join(
                f"<p>{_html.escape(line)}</p>"
                for line in page["text"].split("\n")
                if line.strip()
            )
            html = f"<html><body><main>{body}</main></body></html>"
            page_url = f"{url}/page-{page['page_num']}"
            r = extract_page(html.encode("utf-8"), page["page_num"], describe=True)
            doc_key = _PAGE_SUFFIX.sub("", page_url)
            per_doc.setdefault(doc_key, []).append(
                {
                    "page_num": page["page_num"],
                    "markdown": r.markdown,
                    "n_figures": r.n_figures,
                    "description": r.description,
                }
            )
    return _assemble(per_doc)[["doc_key", "n_pages", "n_chars"]]


def witness_pdf_page_explode() -> pd.DataFrame:
    """Twin of _q_pdf_page_explode at sf0.01: PDF corpus -> structural
    page split -> content-stream text; columns (url, page_num, n_bytes,
    text)."""
    rows = []
    for i in range(N_PDF_DOCS):
        url, payload, _ = doc_pdf(SEED, i)
        for page in split_pdf_pages(payload):
            content = page["content"] or b""
            rows.append(
                {
                    "url": url,
                    "page_num": page["page_num"],
                    "n_bytes": len(content),
                    "text": page_text(content),
                }
            )
    return (
        pd.DataFrame(rows)
        .sort_values(["url", "page_num"])
        .reset_index(drop=True)
    )


WITNESSES = {
    "extract_documents": witness_extract_documents,
    "assemble_documents": witness_assemble_documents,
    "extract_pdf_documents": witness_extract_pdf_documents,
    "pdf_page_explode": witness_pdf_page_explode,
}


def main() -> None:
    os.makedirs(WITNESS_DIR, exist_ok=True)
    for name, fn in WITNESSES.items():
        out = os.path.join(WITNESS_DIR, f"{name}.parquet")
        df = fn()
        df.to_parquet(out, index=False)
        print(f"wrote {out}: {len(df)} rows, cols {list(df.columns)}")


if __name__ == "__main__":
    main()
