from ocr_pipeline_spark.streaming.stream_job import (  # noqa: F401
    run_extraction_stream,
    streaming_crawl_metrics,
)
