"""Link-graph construction: page outlinks -> host edge list.

Arrow-vectorized like operators/extract_op.py — one mapInPandas kernel
over the (url, html) scan, no per-row Python on the JVM side, then one
partial-aggregated groupBy for the host graph.  At crawl scale the
edge list is the only shuffled payload (two short strings + a count),
never the html.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ocr_pipeline_spark.kernel.links import (
    extract_anchors,
    extract_outlinks,
    host_of,
)

OUTLINKS_DDL = "url string, src_host string, outlink string, dst_host string"
ANCHORS_DDL = "url string, src_host string, dst_url string, anchor string"


def outlinks_kernel(max_links: int = 256):
    """Iterator-of-batches kernel: per-worker setup once, not per row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, srcs, outs, dsts = [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                src = host_of(url)
                for link in extract_outlinks(bytes(html), url, max_links):
                    urls.append(url)
                    srcs.append(src)
                    outs.append(link)
                    dsts.append(host_of(link))
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "src_host": pd.Series(srcs, dtype=object),
                    "outlink": pd.Series(outs, dtype=object),
                    "dst_host": pd.Series(dsts, dtype=object),
                }
            )

    return kernel


def extract_outlinks_df(pages: DataFrame, max_links: int = 256) -> DataFrame:
    """(url, src_host, outlink, dst_host) — one row per canonical link.

    Narrow map over the scan: column pruning keeps the parquet read to
    (url, html) even when the pages table is wider.
    """
    return pages.select("url", "html").mapInPandas(
        outlinks_kernel(max_links), schema=OUTLINKS_DDL
    )


def anchors_kernel(max_links: int = 256):
    """Iterator-of-batches kernel for (target url, anchor text) pairs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, srcs, dsts, txts = [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                src = host_of(url)
                for link, text in extract_anchors(bytes(html), url, max_links):
                    urls.append(url)
                    srcs.append(src)
                    dsts.append(link)
                    txts.append(text)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "src_host": pd.Series(srcs, dtype=object),
                    "dst_url": pd.Series(dsts, dtype=object),
                    "anchor": pd.Series(txts, dtype=object),
                }
            )

    return kernel


def anchor_texts_df(pages: DataFrame, max_links: int = 256) -> DataFrame:
    """(url, src_host, dst_url, anchor) — one row per canonical link
    with its whitespace-normalized anchor text.  Narrow map over the
    (url, html) scan, like extract_outlinks_df."""
    return pages.select("url", "html").mapInPandas(
        anchors_kernel(max_links), schema=ANCHORS_DDL
    )


def host_link_graph(pages: DataFrame, max_links: int = 256) -> DataFrame:
    """(src_host, dst_host, n_links) host-level edge list.

    One shuffle total: the groupBy's hash partial aggregation combines
    map-side, so the exchange carries at most |hosts|^2 rows per task,
    not one row per link.
    """
    return (
        extract_outlinks_df(pages, max_links)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
