#!/usr/bin/env python3
"""spark-submit entrypoint — the graft of the reference's CLI contract
(/root/reference/src/ocr_pipeline.py:386-455, entrypoint.py:9-45).

    spark-submit --py-files dist/ocr_pipeline_spark.zip \
        scripts/extract_job.py \
        --input  <pages parquet path or iceberg table> \
        --warehouse <output warehouse dir> \
        --run-id R1 [--table extracted] [--buckets 64] [--chunk-size 8] \
        [--no-describe-diagrams] [--mode fused|staged] [--salt 8] \
        [--no-co-locate] [--synthetic N]

Env-var equivalents (graft of OCR_* vars, docs/DEPLOYMENT_PLAN.md:205-216):
    EXTRACT_INPUT, EXTRACT_WAREHOUSE, EXTRACT_RUN_ID,
    EXTRACT_DESCRIBE_DIAGRAMS=0/1, EXTRACT_VERBOSE=0/1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python scripts/extract_job.py` runs (no --py-files zip): make
# the repo root importable
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark main-content extraction")
    p.add_argument("--input", default=os.environ.get("EXTRACT_INPUT"))
    p.add_argument("--warehouse", default=os.environ.get("EXTRACT_WAREHOUSE"))
    p.add_argument("--run-id", default=os.environ.get("EXTRACT_RUN_ID", "run1"))
    p.add_argument("--table", default="extracted")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--chunk-size", type=int, default=None)
    p.add_argument("--mode", choices=("fused", "staged"), default="fused")
    p.add_argument("--salt", type=int, default=8)
    p.add_argument(
        "--no-describe-diagrams", action="store_true",
        default=os.environ.get("EXTRACT_DESCRIBE_DIAGRAMS", "1") == "0",
    )
    p.add_argument("--no-co-locate", action="store_true")
    p.add_argument(
        "--co-locate-stage", choices=("pre", "post"), default="post",
        help="where the salted host exchange sits: 'post' (default) "
        "shuffles markdown-sized extracted rows; 'pre' shuffles raw "
        "pages (for inputs whose scans expose too few splits)",
    )
    p.add_argument(
        "--metrics-mode", choices=("committed", "observe"), default="committed",
        help="lineage metrics source: 'committed' (default) re-reads the "
        "committed files (pruned scan, exact under any failure); 'observe' "
        "accumulates per-bucket metrics inside the extraction kernel "
        "during the write (no re-read; fused mode only)",
    )
    p.add_argument(
        "--synthetic", type=int, default=None,
        help="generate N synthetic pages instead of reading --input",
    )
    p.add_argument(
        "--incremental", action="store_true",
        help="Structured Streaming mode: process only parquet files under "
        "--input not yet seen by this run-id's checkpoint, then exit "
        "(cron-style incremental crawl ingest)",
    )
    p.add_argument(
        "-v", "--verbose", action="store_true",
        default=os.environ.get("EXTRACT_VERBOSE", "0") == "1",
    )
    args = p.parse_args(argv)
    if not args.warehouse:
        p.error("--warehouse (or EXTRACT_WAREHOUSE) is required")
    if not args.input and args.synthetic is None:
        p.error("--input (or EXTRACT_INPUT) or --synthetic is required")
    return args


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession

    from ocr_pipeline_spark.plans.job import run_pipeline

    spark = SparkSession.builder.appName(
        f"extract-{args.run_id}"
    ).getOrCreate()
    if not args.verbose:
        spark.sparkContext.setLogLevel("WARN")

    if args.incremental:
        from ocr_pipeline_spark.streaming import run_extraction_stream

        out_dir = os.path.join(args.warehouse, args.table)
        ckpt = os.path.join(args.warehouse, f"_checkpoints/{args.run_id}")
        n = run_extraction_stream(
            spark, args.input, out_dir, ckpt,
            describe=not args.no_describe_diagrams,
        )
        print(json.dumps({"run_id": args.run_id, "mode": "incremental",
                          "rows_processed": n, "output": out_dir}))
        return 0

    if args.synthetic is not None:
        from ocr_pipeline_spark.fixtures.gen_pages import generate_pages_df

        pages = generate_pages_df(spark, args.synthetic)
    elif args.input.startswith("iceberg:"):
        pages = spark.read.format("iceberg").load(args.input[len("iceberg:"):])
    else:
        pages = spark.read.parquet(args.input)

    summary = run_pipeline(
        spark, pages, args.warehouse, args.run_id,
        table=args.table,
        describe=not args.no_describe_diagrams,
        mode=args.mode,
        n_buckets=args.buckets,
        chunk_size=args.chunk_size,
        salt=args.salt,
        co_locate_hosts=not args.no_co_locate,
        co_locate_stage=args.co_locate_stage,
        metrics_mode=args.metrics_mode,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
