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

import numpy as np
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
    """Query-side / scalar-reference hyperplane signature.

    Uses the same numpy dot as the batch kernel in add_lsh_signatures so
    the two are bit-identical (a sequential-Python sum could round
    differently near a zero dot product)."""
    P = np.asarray(planes, dtype=np.float64)
    bits = (P @ np.asarray(vec, dtype=np.float64)) >= 0.0
    return int(
        (bits.astype(np.uint64) << np.arange(len(planes), dtype=np.uint64)).sum()
    )


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
    """Arrow kernel: one `sig_t` column per hash table (the ANN index).

    All tables' planes stack into one (n_tables*n_planes, dim) matrix so
    each Arrow batch pays exactly one matmul — no per-row Python (same
    shape as assign_ivf_cells / the cosine verify kernel)."""
    P_all = np.array(
        [p for t in range(n_tables) for p in _planes(dim, n_planes, t)],
        dtype=np.float64,
    )
    shifts = np.arange(n_planes, dtype=np.uint64)
    out_ddl = ", ".join(
        [f"{c} {t}" for c, t in zip(df.columns, _ddl_types(df))]
        + [f"sig_{t} bigint" for t in range(n_tables)]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
                bits = (V @ P_all.T) >= 0.0
                for t in range(n_tables):
                    blk = bits[:, t * n_planes : (t + 1) * n_planes]
                    pdf[f"sig_{t}"] = (
                        (blk.astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
                    )
            else:
                for t in range(n_tables):
                    pdf[f"sig_{t}"] = pd.Series([], dtype="int64")
            yield pdf

    return df.mapInPandas(kernel, schema=out_ddl)


def _ddl_types(df: DataFrame) -> list[str]:
    return [f.dataType.simpleString() for f in df.schema.fields]


def _pair_cosine_col(a_col: str, b_col: str):
    dbl = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    dot = F.aggregate(
        F.zip_with(dbl(a_col), dbl(b_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(dbl(c), lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    return dot / (norm(a_col) * norm(b_col))


def _seq_sq_norms(m: np.ndarray) -> np.ndarray:
    """sqrt of per-row squared norms accumulated IN DIMENSION ORDER —
    bit-identical to the sequential JVM `aggregate(transform(v, x*x),
    0.0, +)` fold (and DuckDB's list_dot_product), unlike numpy's
    pairwise-summed einsum/dot."""
    acc = np.zeros(len(m))
    for k in range(m.shape[1]):
        c = m[:, k]
        acc += c * c
    return np.sqrt(acc)


def cosine_pairs_bruteforce(
    df: DataFrame, vec_col: str, id_col: str, threshold: float
) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (id_a < id_b, cos >= t).

    Quadratic verification baseline — at scale use cosine_near_dup_lsh
    below; this exists as the oracle-checkable exact reference.  Pair
    cosines are computed as a block GEMM in one Arrow kernel, with the
    dot/norm reductions accumulated in dimension order (d vectorized
    outer-product adds, never numpy's pairwise-summed dot), so every
    float64 is bit-identical to the former per-pair JVM
    aggregate/zip_with expression and to DuckDB's list_dot_product —
    the 4-dp rounded threshold compare cannot drift between engines
    (pinned by tests/test_ops.py bit-equality vs the HOF expression).
    The vector side rides one broadcast (the exact bound the previous
    F.broadcast(b) nested-loop plan had) while the row side streams
    through mapInPandas; the F.round(HALF_UP) + threshold compare stay
    JVM-side, the kernel pre-filters with 4-dp rounding slack.
    Replaces 2M per-pair HOF evals at 2k vectors: 88.7s -> <1s.

    Trade-off, accepted for a verification baseline: the vector side
    is collected at DataFrame-construction time (the former
    F.broadcast(b) plan shipped the same bytes, but lazily at first
    action), and the task broadcast lives until the session drops it."""
    sc = df.sparkSession.sparkContext
    # null vectors produced a null cosine (filtered) under the old HOF
    # expression — drop them up front so the kernel math never sees one
    df = df.filter(F.col(vec_col).isNotNull())
    side = df.select(id_col, vec_col).toPandas()
    b_ids = side[id_col].to_numpy()
    if len(side):
        b_mat = np.array(
            [list(v) for v in side[vec_col]], dtype=np.float64
        ).reshape(len(side), -1)
    else:
        b_mat = np.zeros((0, 0))
    bc = sc.broadcast((b_ids, b_mat, _seq_sq_norms(b_mat)))
    id_t = next(
        f.dataType.simpleString() for f in df.schema.fields if f.name == id_col
    )
    # rounding to 4 dp can lift a cosine by at most 5e-5: pre-filter
    # with that slack so only ~the pair set crosses Arrow, and leave
    # the authoritative HALF_UP round + compare to the JVM
    pre = threshold - 5.1e-5

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b, nrm_b = bc.value
        for pdf in batches:
            if not len(pdf) or not len(mat_b):
                continue
            mat_a = np.array(
                [list(v) for v in pdf[vec_col]], dtype=np.float64
            ).reshape(len(pdf), -1)
            ids_a = pdf[id_col].to_numpy()
            acc = np.zeros((len(mat_a), len(mat_b)))
            for k in range(mat_a.shape[1]):
                acc += np.multiply.outer(mat_a[:, k], mat_b[:, k])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = acc / np.multiply.outer(_seq_sq_norms(mat_a), nrm_b)
            keep = (ids_a[:, None] < ids_b[None, :]) & (cos >= pre)
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": ids_a[ai], "id_b": ids_b[bi], "cos_sim": cos[ai, bi]}
            )

    out = df.mapInPandas(kernel, schema=f"id_a {id_t}, id_b {id_t}, cos_sim double")
    return out.select(
        "id_a", "id_b", F.round(F.col("cos_sim"), 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def cosine_near_dup_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float,
    n_planes: int = 6,
    n_tables: int = 8,
    max_bucket: int = 1024,
) -> DataFrame:
    """Embedding near-dup pairs at scale: hyperplane-LSH signatures
    (Arrow kernel) → per-table bucket grouping → ONE cosine GEMM per
    bucket (applyInPandas) emitting only pairs >= threshold.

    Verifying inside the bucket kernel beats the
    explode-pairs → distinct → hydrate-vectors-by-join → verify chain
    it replaced: a bucket of m rows costs one m×m matmul instead of
    materializing m^2/2 candidate rows through a distinct shuffle and
    two joins.  The whole plan is a single shuffle on (table, sig)
    carrying n·n_tables vectors.

    Hot buckets (> max_bucket rows) are skipped inside the kernel —
    with short signatures a near-universal signature is the boilerplate
    analog of a hot LSH band; the cap bounds per-task work at
    max_bucket^2·dim flops.  The cap can sit far above the pair-explode
    generators' (text_ops._MAX_BUCKET) because a GEMM row is ~1000×
    cheaper than an exploded candidate row.  Pair recall vs the exact
    quadratic baseline is pinned in tests (test_ops, test_entry
    recall checks)."""
    id_ddl = df.schema[id_col].dataType.simpleString()
    signed = add_lsh_signatures(df, vec_col, dim, n_planes, n_tables)
    banded = signed.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(
            F.array(*[F.col(f"sig_{t}") for t in range(n_tables)])
        ).alias("tbl", "sig"),
    )

    def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        m = len(pdf)
        if m < 2 or m > max_bucket:
            return empty
        V = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        sims = np.round(V @ V.T, 4)
        ia, ib = np.triu_indices(m, k=1)
        mask = sims[ia, ib] >= threshold
        if not mask.any():
            return empty
        ids = pdf["_id"].to_numpy()
        a, b = ids[ia[mask]], ids[ib[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": sims[ia, ib][mask]}
        )

    pairs = banded.groupBy("tbl", "sig").applyInPandas(
        verify_bucket, schema=f"id_a {id_ddl}, id_b {id_ddl}, cos_sim double"
    )
    # Dedup multi-table hits on ids ONLY: BLAS accumulation order can
    # vary with bucket shape, so the same pair may surface from two
    # tables with cos_sim values that differ at the 4-dp rounding
    # boundary — a distinct() over (id_a, id_b, cos_sim) would keep
    # both.  max() makes the representative deterministic.
    return pairs.groupBy("id_a", "id_b").agg(F.max("cos_sim").alias("cos_sim"))


# =========================================================================
# IVF (inverted-file) ANN — coarse k-means cells + probe-nearest-cells
# =========================================================================
def train_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_cells: int = 16,
    sample_n: int = 512,
    iters: int = 8,
) -> list[list[float]]:
    """Driver-side coarse quantizer on a bounded deterministic sample
    (smallest xxhash64(id) rows — stable across partitioning).  Standard
    IVF practice: train on O(cells*40) rows, broadcast centroids; the
    full data is never collected.  Spherical k-means (cosine)."""
    import numpy as np

    rows = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string")), "_id")
        .limit(sample_n)
        .collect()
    )
    X = np.array([list(r._v) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_cells = min(n_cells, len(X))
    C = X[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(x) for x in row] for row in C]


def refine_ivf_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    rounds: int = 1,
) -> list[list[float]]:
    """Distributed Lloyd rounds over the FULL corpus: assign cells with
    broadcast centroids (Arrow kernel), compute per-cell sums of the
    row-normalized vectors via posexplode + partial-agg group-by, and
    renormalize on the driver — only n_cells x dim numbers ever leave
    the cluster, so the refinement scales to any corpus the assignment
    kernel scales to.  Spherical k-means update (centroid = normalized
    sum of normalized members); full-batch Lloyd, so the quantizer
    objective is monotone non-decreasing (pinned in tests).  Empty
    cells keep their previous centroid."""
    import numpy as np

    C = [list(map(float, row)) for row in centroids]
    dim = len(C[0])
    sq = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda s, x: s + x.cast("double") * x.cast("double"),
    )
    normed = df.select(
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / F.greatest(F.sqrt(sq), F.lit(1e-12)),
        ).alias("_nv")
    )
    for _ in range(rounds):
        celled = assign_ivf_cells(normed, "_nv", C)
        sums = (
            celled.select("ivf_cell", F.posexplode("_nv").alias("pos", "x"))
            .groupBy("ivf_cell", "pos")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        arr = np.zeros((len(C), dim))
        for r in sums:
            arr[r.ivf_cell, r.pos] = r.s
        norms = np.linalg.norm(arr, axis=1)
        out = np.array(C, dtype=np.float64)
        keep = norms > 1e-12
        out[keep] = arr[keep] / norms[keep, None]
        C = [[float(x) for x in row] for row in out]
    return C


def assign_ivf_cells(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Arrow kernel: adds `ivf_cell` (argmax cosine vs broadcast
    centroids) — the partition key of the ANN index at scale."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    out_ddl = ", ".join(
        [f"{c} {t}" for c, t in zip(df.columns, _ddl_types(df))]
        + ["ivf_cell int"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            V = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            pdf["ivf_cell"] = np.argmax(V @ C.T, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(kernel, schema=out_ddl)


def ivf_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    refine_rounds: int = 1,
) -> DataFrame:
    """IVF ANN top-k: train coarse cells (bounded-sample init +
    `refine_rounds` distributed Lloyd passes over the full corpus),
    scan only the n_probe cells nearest the query, exact-cosine re-rank
    inside them.  At scale the cell assignment is precomputed/
    partitioned-by, making a query a partition-pruned scan of
    n_probe/n_cells of the data."""
    import numpy as np

    centroids = train_ivf_centroids(df, vec_col, id_col, n_cells)
    if refine_rounds:
        centroids = refine_ivf_centroids(df, vec_col, centroids, refine_rounds)
    C = np.array(centroids, dtype=np.float64)
    q = np.array(query, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probe = [int(i) for i in np.argsort(-(C @ q))[:n_probe]]
    celled = assign_ivf_cells(df, vec_col, centroids)
    candidates = celled.filter(F.col("ivf_cell").isin(probe))
    return cosine_topk_bruteforce(candidates, vec_col, id_col, query, k)


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
