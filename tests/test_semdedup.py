"""SemDeDup (operators/semdedup.py, X43): partition invariance, the
paper's keep/drop rule re-derived brute-force, and kernel determinism.

The oracle equality (distributed == single-process witness, bit-exact
including float64 cent_sim) runs in tests/test_entry_contract.py; these
tests pin the properties that equality alone doesn't explain."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocr_pipeline_spark.operators.semdedup import (
    cell_sims,
    lloyd_spherical,
    normalize_rows,
    semdedup,
    semdedup_cell,
    train_centroids_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def result(spark, emb):
    cents = train_centroids_sample(
        emb, "embedding", "vec_id", n_cells=4, sample_n=64, iters=8
    )
    out = (
        semdedup(emb, "embedding", "vec_id", cents, tau=0.35)
        .orderBy("vec_id")
        .toPandas()
    )
    return cents, out


def test_every_input_row_verdicted(emb, result):
    _, out = result
    assert len(out) == emb.count()
    assert out.vec_id.is_unique
    assert set(out.keep.unique()) <= {0, 1}


def test_partition_invariance(spark, emb, result):
    """Same verdicts (bit-identical, float column included) no matter
    how the input is partitioned — the Arrow kernels use fixed-order
    reductions, so batching cannot leak into the output."""
    cents, out = result
    again = (
        semdedup(
            emb.repartition(7, "vec_id"), "embedding", "vec_id", cents,
            tau=0.35,
        )
        .orderBy("vec_id")
        .toPandas()
    )
    pd.testing.assert_frame_equal(out, again)


def test_keep_rule_matches_bruteforce(emb, result):
    """Re-derive the paper's rule outside the operator: rank each cell
    farthest-from-centroid first; drop iff an earlier-ranked member is
    within cosine tau (kept or not — the released code's non-cascading
    comparison set)."""
    cents, out = result
    pdf = emb.toPandas()
    Vn = normalize_rows(
        np.array([list(v) for v in pdf.embedding], dtype=np.float64)
    )
    by_id = dict(zip(pdf.vec_id, range(len(pdf))))
    for c in sorted(out.cell.unique()):
        grp = out[out.cell == c].sort_values(
            ["cent_sim", "vec_id"]
        )
        rows = [by_id[i] for i in grp.vec_id]
        M = Vn[rows] @ Vn[rows].T
        for j in range(len(rows)):
            expect = int(not any(M[i, j] >= 0.35 for i in range(j)))
            assert expect == grp.keep.iloc[j], (c, grp.vec_id.iloc[j])


def test_drops_exist_and_dropped_have_near_neighbor(result):
    """tau=0.35 produces real drops on this fixture, and every dropped
    row's verdict is justified (covered pairwise by the brute-force
    test; here just the aggregate sanity)."""
    _, out = result
    assert (out.keep == 0).sum() > 0
    assert (out.keep == 1).sum() > 0


def test_lloyd_deterministic_and_normalized():
    rng = np.random.RandomState(7)
    X = rng.randn(100, 16)
    C1 = lloyd_spherical(X, 5, iters=6)
    C2 = lloyd_spherical(X.copy(), 5, iters=6)
    assert np.array_equal(C1, C2)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0, atol=1e-9)


def test_cell_sims_batch_independent():
    """The manual-reduction cosine matrix is bitwise identical whether a
    row is computed alone or inside a larger batch — the property that
    makes assignment partition-proof (BLAS GEMM does NOT guarantee
    this)."""
    rng = np.random.RandomState(3)
    V = normalize_rows(rng.randn(50, 16))
    C = normalize_rows(rng.randn(4, 16))
    whole = cell_sims(V, C)
    for lo, hi in [(0, 13), (13, 50)]:
        assert np.array_equal(whole[lo:hi], cell_sims(V[lo:hi], C))
    one = cell_sims(V[17:18], C)
    assert np.array_equal(whole[17:18], one)


def test_semdedup_cell_singleton_and_tie_order():
    ids = np.array([5], dtype=np.int64)
    Vn = normalize_rows(np.ones((1, 4)))
    out = semdedup_cell(ids, Vn, np.array([0.9]), tau=0.5)
    assert out.keep.tolist() == [1]
    # two identical vectors, identical cent_sim: the smaller id ranks
    # first and survives; the larger id drops
    ids = np.array([9, 2], dtype=np.int64)
    Vn = normalize_rows(np.ones((2, 4)))
    out = semdedup_cell(ids, Vn, np.array([0.5, 0.5]), tau=0.99)
    assert out.sort_values("vec_id").keep.tolist() == [1, 0]
