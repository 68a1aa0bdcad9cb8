"""As-of join — a core time-series operator Spark lacks natively.

For each left row, attach the most recent right row of the same key
with right_time <= left_time (ties broken by the largest tie_col —
fully deterministic).  Physical shape: union the two sides with a
side marker and run one `last(payload, ignorenulls=True)` window over
(key, time, side) — a single shuffle on the key, no range cross join,
no per-row Python.  This is the standard scalable encoding (the
union-window technique); pandas' merge_asof semantics, Spark-native.

At 10^12 rows the window partitions by the join key, so skew follows
key popularity — pre-filter or salt mega-keys as with any keyed op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_col: str,
) -> DataFrame:
    """Returns left rows plus `asof_<payload>` columns from the matched
    right row (null when no right row precedes).  `tie_col` must be a
    right column that makes (right_time, tie_col) unique per key."""
    l_marked = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in payload_cols
            ) + ">"
        ).alias("_payload"),
        F.lit(None).cast(right.schema[tie_col].dataType.simpleString()).alias("_tie"),
    )
    r_marked = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_marked.schema["_left"].dataType.simpleString()).alias("_left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        F.col(tie_col).alias("_tie"),
    )
    unioned = l_marked.unionByName(r_marked)
    # right rows sort before left rows at equal time (inclusive <=);
    # among right ties the LAST in (time, tie) order is carried
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_left.*"),
        *[
            F.col(f"_asof.{c}").alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return out
