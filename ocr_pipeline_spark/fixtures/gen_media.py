"""Deterministic media-table fixture: binary image payloads for the
multimodal operators (X13), generated with the repo's own pure-Python
encoders (operators/imagecodecs.py) so the decode path under test is
exercised by REAL container bytes — the same generate-don't-download
pattern as fixtures/gen_pdfs.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _payload(media_id: int, seed: int) -> bytes | None:
    """media_id -> deterministic payload; cycles through GIF, baseline
    JPEG, empty, non-image garbage, progressive JPEG, and PNG so every
    decode branch is hit."""
    from ocr_pipeline_spark.operators.imagecodecs import (
        encode_baseline_jpeg,
        encode_gif,
        encode_png,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(seed * 1_000_003 + media_id)
    kind = media_id % 6
    h, w = int(rng.randint(4, 24)), int(rng.randint(4, 24))
    if kind == 0:
        levels = np.linspace(0, 255, 8, dtype=np.uint8)
        arr = np.stack([levels[rng.randint(0, 8, size=(h, w))]] * 3, axis=2)
        return encode_gif(arr)
    if kind == 1:
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        return encode_baseline_jpeg(arr)
    if kind == 2:
        return None
    if kind == 4:
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        return encode_progressive_jpeg(arr)
    if kind == 5:
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        return encode_png(arr)
    return b"not-an-image:" + rng.bytes(64)


def generate_media_df(
    spark: SparkSession, n_rows: int, seed: int = 42
) -> DataFrame:
    pdf = pd.DataFrame(
        {
            "media_id": np.arange(n_rows, dtype=np.int64),
            "media": [_payload(i, seed) for i in range(n_rows)],
        }
    )
    return spark.createDataFrame(pdf, "media_id long, media binary")
