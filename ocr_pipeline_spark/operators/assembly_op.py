"""Per-document assembly operator (A3/A4 as a grouped-map kernel).

Graft of the reference's document assembly
(/root/reference/src/stage2_ocr.py:474-605): pages of one document are
an ordered fold (boundary-fragment carry + header + separators), so in
Spark it is ``groupBy(doc_key).applyInPandas`` — the one place grouped
state is genuinely required.  The shuffle key is the document key;
groups are small (pages per document), so skew is bounded by document
size, not host popularity.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_pipeline_spark.kernel.assemble import assemble_document

DOCUMENT_DDL = (
    "doc_key string, markdown string, n_pages int, n_figures int, n_chars bigint"
)

_PAGE_SUFFIX = r"/page-\d+/?$"


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("page_num", kind="mergesort")  # stable, deterministic
    doc_key = pdf["doc_key"].iloc[0]
    markdowns = list(pdf["markdown"])
    n_figures = int(pdf["n_figures"].sum())
    diagrams_used = int((pdf["description"].fillna("") != "").sum())
    doc_name = doc_key.rstrip("/").rsplit("/", 1)[-1] or doc_key
    markdown = assemble_document(
        markdowns, doc_name, n_figures=n_figures, diagrams_used=diagrams_used
    )
    return pd.DataFrame(
        [
            {
                "doc_key": doc_key,
                "markdown": markdown,
                "n_pages": len(markdowns),
                "n_figures": n_figures,
                "n_chars": len(markdown),
            }
        ]
    )


def assemble_documents(extracted: DataFrame) -> DataFrame:
    """extracted (per-page) -> one assembled markdown document per doc_key.

    doc_key strips the `/page-N` suffix; single-page urls form 1-page
    documents (the HTML corpus degenerate case, SURVEY.md §2.4 A3).
    """
    keyed = extracted.withColumn(
        "doc_key", F.regexp_replace("url", _PAGE_SUFFIX, "")
    ).select("doc_key", "page_num", "markdown", "n_figures", "description")
    return keyed.groupBy("doc_key").applyInPandas(
        _assemble_group, schema=DOCUMENT_DDL
    )
