"""Head-metadata scan projection: (url, html) -> metadata columns.

Arrow-vectorized like operators/extract_op.py — one mapInPandas kernel
over the (url, html) scan, no per-row Python on the JVM side.  The
output rows are five short strings per page (never the html), so at
crawl scale this is a narrow map whose only cost is the parse — and
the parse is shared-shape with extraction, so a fused caller can run
both projections in one pass over the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ocr_pipeline_spark.kernel.metadata import page_metadata

METADATA_DDL = (
    "url string, title string, description string, canonical string, "
    "og_title string, ld_type string"
)
_FIELDS = ("title", "description", "canonical", "og_title", "ld_type")


def metadata_kernel():
    """Iterator-of-batches kernel: per-worker setup once, not per row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list[str]] = {f: [] for f in _FIELDS}
            for html in pdf["html"]:
                meta = page_metadata(bytes(html))
                for f in _FIELDS:
                    cols[f].append(meta[f])
            out = {"url": pdf["url"].astype(object)}
            for f in _FIELDS:
                out[f] = pd.Series(cols[f], dtype=object)
            yield pd.DataFrame(out)

    return kernel


def page_metadata_df(pages: DataFrame) -> DataFrame:
    """(url, title, description, canonical, og_title, ld_type) per page.

    Narrow map over the scan: column pruning keeps the parquet read to
    (url, html) even when the pages table is wider.
    """
    return pages.select("url", "html").mapInPandas(
        metadata_kernel(), schema=METADATA_DDL
    )
