"""Range (interval) join — matches right rows whose time falls inside a
left row's [start, end] window, per key.

Naive encoding is a key equi-join plus range filter, which Catalyst
executes fine when a key exists; the bucketed variant here is the
scale path that also survives *low-selectivity keys*: both sides map
to coarse time buckets (left intervals explode to every bucket they
overlap), the join is a pure equi-join on (key, bucket) — a hash
shuffle, never a broadcast-nested-loop — and the exact range predicate
filters inside matched buckets.  Bucket width trades explode factor
against bucket population; pick ~the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_time: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner range join: every (left, right) pair with same `key` and
    right_time in [left_start, left_end].  Columns of both sides are
    kept (right's prefixed `r_`)."""
    w = F.lit(int(bucket_seconds))
    ls = F.unix_timestamp(F.col(left_start))
    le = F.unix_timestamp(F.col(left_end))
    l_bucketed = left.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(ls / w), F.floor(le / w))),
    )
    r_bucketed = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(f"r_{right_time}")) / w)
    )
    joined = l_bucketed.join(
        r_bucketed,
        on=[
            l_bucketed[key] == r_bucketed[f"r_{key}"],
            l_bucketed["_bucket"] == r_bucketed["_bucket"],
        ],
    )
    exact = joined.filter(
        (F.col(f"r_{right_time}") >= F.col(left_start))
        & (F.col(f"r_{right_time}") <= F.col(left_end))
    )
    return exact.drop("_bucket", f"r_{key}")
