"""Approximate nearest neighbor over embedding columns.

Baseline: brute-force cosine top-k with JVM-side expressions
(zip_with/aggregate — no Python in the hot path).  Scale path:
random-hyperplane LSH — signatures are computed once per row in an
Arrow kernel, candidates come from signature-bucket equality (a hash
lookup / broadcast semi-join, never a cross join), and only candidates
pay the exact cosine.  At 10^12 rows the signature table is the index;
multi-table probing trades recall for candidate count.

Parameter regime matters: P(candidate) per table = p^n_planes with
p = 1 - angle/pi.  For strongly-similar neighbors (cos >= 0.8, p ~ 0.8)
n_planes=12..16 keeps buckets tiny at high recall; for weak neighbors
(cos ~ 0.4, p ~ 0.62) use short signatures + many tables
(n_planes=4..6, n_tables=8..16) — or fall back to brute force, which
stays JVM-vectorized.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEED = 0x9E3779B9


def _planes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    rng = random.Random((_SEED << 4) ^ (table * 7919) ^ dim)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def signature_of(vec: list[float], planes: list[list[float]]) -> int:
    sig = 0
    for i, plane in enumerate(planes):
        s = 0.0
        for a, b in zip(vec, plane):
            s += float(a) * b
        if s >= 0.0:
            sig |= 1 << i
    return sig


def _cosine_col(vec_col: str, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(dbl, q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm_v = F.sqrt(
        F.aggregate(F.transform(dbl, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    qn = sum(float(x) * float(x) for x in query) ** 0.5
    return dot / (norm_v * F.lit(qn))


def cosine_topk_bruteforce(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine; JVM expressions only."""
    return (
        df.select(
            F.col(id_col), F.round(_cosine_col(vec_col, query), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def add_lsh_signatures(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, n_tables: int = 4
) -> DataFrame:
    """Arrow kernel: one `sig_t` column per hash table (the ANN index)."""
    plane_sets = [_planes(dim, n_planes, t) for t in range(n_tables)]
    cols = list(df.columns)
    out_ddl = ", ".join(
        [f"{c} {t}" for c, t in zip(cols, _ddl_types(df))]
        + [f"sig_{t} bigint" for t in range(n_tables)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            vecs = list(pdf[vec_col])
            for t, planes in enumerate(plane_sets):
                pdf[f"sig_{t}"] = [signature_of(list(v), planes) for v in vecs]
            yield pdf

    return df.mapInPandas(kernel, schema=out_ddl)


def _ddl_types(df: DataFrame) -> list[str]:
    return [f.dataType.simpleString() for f in df.schema.fields]


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = rows sharing any table's signature with
    the query; exact cosine re-rank of candidates only."""
    dim = len(query)
    signed = add_lsh_signatures(df, vec_col, dim, n_planes, n_tables)
    plane_sets = [_planes(dim, n_planes, t) for t in range(n_tables)]
    qsigs = [signature_of(query, planes) for planes in plane_sets]
    predicate = None
    for t, qs in enumerate(qsigs):
        clause = F.col(f"sig_{t}") == F.lit(qs)
        predicate = clause if predicate is None else (predicate | clause)
    candidates = signed.filter(predicate)
    return cosine_topk_bruteforce(candidates, vec_col, id_col, query, k)
