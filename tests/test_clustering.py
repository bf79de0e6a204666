"""Distributed Lloyd k-means + SemDeDup (operators/clustering.py):
assignment ≡ numpy argmin-L2, update sums ≡ numpy, inertia
non-increasing over fit iterations, partition invariance, and SemDeDup
finding planted near-duplicates with the cell_cap guard honored."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_update,
    quantize_vec,
    semdedup_drop,
    semdedup_pairs,
)

DIM = 8
N = 240
K = 4


def _blobs():
    """4 well-separated gaussian blobs + 6 planted near-duplicate rows."""
    rng = np.random.RandomState(42)
    centers = rng.randn(K, DIM) * 3.0
    X = np.vstack(
        [centers[i % K] + rng.randn(DIM) * 1.0 for i in range(N)]
    )
    # planted near-dups: rows N..N+5 are copies of rows 0..5 + tiny noise
    dups = X[:6] + rng.randn(6, DIM) * 1e-4
    return np.vstack([X, dups])


@pytest.fixture(scope="module")
def emb_q(spark):
    X = _blobs()
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id: long, emb: array<double>")
    return (
        df.select("vec_id", quantize_vec(F.col("emb")).alias("qv"))
        .repartition(5)
        .cache()
    )


def _np_data(emb_q):
    rows = sorted(emb_q.collect(), key=lambda r: r.vec_id)
    return np.array([r.qv for r in rows], dtype=np.int64)


def test_assign_matches_numpy_argmin_l2(spark, emb_q):
    Xq = _np_data(emb_q)
    cents = emb_q.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    got = {
        r.vec_id: r.cell for r in kmeans_assign(emb_q, cents).collect()
    }
    C = Xq[:K]
    d = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    want = d.argmin(1)  # numpy argmin takes the first (smallest) index
    assert [got[i] for i in range(len(Xq))] == list(want)


def test_update_sums_match_numpy(spark, emb_q):
    Xq = _np_data(emb_q)
    cents = emb_q.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    assigned = kmeans_assign(emb_q, cents)
    stats = {r.cell: r for r in kmeans_update(assigned, DIM).collect()}
    C = Xq[:K]
    a = ((Xq[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
    for c in range(K):
        m = a == c
        if not m.any():
            assert c not in stats
            continue
        r = stats[c]
        assert r.cnt == int(m.sum())
        for i in range(DIM):
            assert r[f"s{i}"] == int(Xq[m, i].sum())


def test_fit_inertia_non_increasing_and_deterministic(spark, emb_q):
    def inertia(assigned, cents):
        C = {i: np.array(c) for i, c in enumerate(cents)}
        rows = assigned.collect()
        Xq = {r.vec_id: np.array(r.qv) for r in rows}
        cell = {r.vec_id: r.cell for r in rows}
        return sum(
            float(((Xq[i] - C[cell[i]]) ** 2).sum()) for i in Xq
        )

    prev = None
    for iters in (1, 3, 6):
        assigned, cents = kmeans_fit(
            spark, emb_q, k=K, iters=iters, dim=DIM
        )
        cur = inertia(assigned, cents)
        if prev is not None:
            assert cur <= prev * 1.0001  # integer-mean rounding slack
        prev = cur
    # every row assigned, every cell id valid (hash seeding can land
    # two seeds in one blob, so balance is a local-optimum lottery —
    # monotone inertia + determinism are the Lloyd invariants)
    rows = assigned.select("vec_id", "cell").collect()
    assert len(rows) == N + 6
    assert all(0 <= r.cell < K for r in rows)

    # partition invariance: same result from a different layout
    a2, c2 = kmeans_fit(
        spark, emb_q.repartition(11), k=K, iters=6, dim=DIM
    )
    assert c2 == cents
    assert sorted(map(tuple, a2.select("vec_id", "cell").collect())) == sorted(
        map(tuple, assigned.select("vec_id", "cell").collect())
    )


def test_semdedup_finds_planted_duplicates(spark, emb_q):
    assigned, _ = kmeans_fit(spark, emb_q, k=K, iters=4, dim=DIM)
    pairs = semdedup_pairs(assigned, 0.9999)
    got = {(r.ia, r.ib) for r in pairs.collect()}
    # every planted dup (i, N+i) must be caught, in the same cell
    for i in range(6):
        assert (i, N + i) in got, f"missed planted dup {(i, N + i)}"
    drop = {r.vec_id for r in semdedup_drop(pairs).collect()}
    assert {N + i for i in range(6)} <= drop
    # nothing outside the planted dups at this bar on gaussian blobs
    assert drop <= {N + i for i in range(6)} | set(range(6))


def test_semdedup_cell_cap_guards_hot_cells(spark, emb_q):
    # one giant cell: everything in cell 0 → cap excludes it entirely
    assigned = emb_q.select("vec_id", F.lit(0).alias("cell"), "qv")
    assert (
        semdedup_pairs(assigned, 0.9, cell_cap=10).count() == 0
    )
    # cap larger than the cell admits it again
    assert semdedup_pairs(assigned, 0.999, cell_cap=10_000).count() >= 6
