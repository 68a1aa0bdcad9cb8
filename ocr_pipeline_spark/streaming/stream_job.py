"""Structured Streaming ingest: incremental extraction of crawl drops.

The reference is strictly batch (SURVEY.md §4.5) and so is the graft's
primary plan (`plans/job.py`); this module is the *incremental* shape
of the same computation for continuously-arriving WARC partitions:
new parquet files landing under a directory are picked up by a file
source, run through the identical Arrow extraction kernel (the kernel
is pure per-row, so batch and streaming plans are byte-identical per
url), and appended to the sink exactly once per input file via the
streaming checkpoint — Structured Streaming's file-source log plays
the role the batch path's bucket manifests play (SURVEY.md §4.4).

`Trigger.AvailableNow` gives run-to-completion semantics per
invocation: each call processes everything that arrived since the last
checkpointed offset and stops — a cron-style incremental crawl job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_pipeline_spark.operators.extract_op import (
    EXTRACTED_DDL,
    fused_extract_kernel,
)

# Input schema must be declared for streaming file sources (no inference
# at stream time) — exactly the `pages` table shape from BASELINE.json.
PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def run_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    describe: bool = True,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process all pages parquet files not yet seen by `checkpoint_path`,
    appending extracted rows to `output_path`.  Returns rows written in
    this increment (0 when nothing new arrived).

    Stateless streaming: the kernel is a narrow mapInPandas, so there is
    no state store, no shuffle, and a failed micro-batch replays from
    the checkpoint without duplicates (file-source offsets + sink
    transaction log).
    """
    reader = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.parquet(input_path)

    extracted = pages.select("url", "warc_ts", "html", "lang").mapInPandas(
        fused_extract_kernel(describe), schema=EXTRACTED_DDL
    )

    query = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    progress = query.recentProgress
    return int(sum(p["numInputRows"] for p in progress)) if progress else 0


def streaming_dedup(
    stream: DataFrame,
    keys: list[str],
    event_time: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: keep the first row per
    key across micro-batches, drop re-deliveries (re-crawled pages,
    replayed WARC drops, at-least-once upstream queues).

    Built on `dropDuplicatesWithinWatermark`: a key's dedup state lives
    only until the event-time watermark passes `watermark` beyond it,
    so state size tracks the re-delivery horizon, not the corpus — the
    property that makes exact streaming dedup viable at crawl scale
    (plain dropDuplicates would retain every key forever).  A
    re-delivery inside the horizon is dropped as an in-state duplicate;
    one arriving after the key's eviction is dropped by the watermark
    itself as late — either way each key survives exactly once as long
    as re-deliveries lag the original by less than `watermark` plus the
    stream's disorder bound.

    Returns the streaming DataFrame (caller attaches the sink)."""
    return stream.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_crawl_metrics(
    pages_stream: DataFrame,
    watermark: str = "1 hour",
    window_len: str = "1 day",
) -> DataFrame:
    """Watermarked windowed crawl metrics over a streaming pages source:
    per (warc_ts window, lang) page counts and byte volume.  Late rows
    beyond `watermark` are dropped deterministically; state for closed
    windows is evicted, so the aggregation runs unbounded.

    Returns the streaming DataFrame (caller attaches the sink) — the
    streaming analog of the batch job's per-partition metrics rows
    (plans/job.py:partition_metrics).
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_len).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("n_html_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_html_bytes",
        )
    )
