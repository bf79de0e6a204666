"""Z-order layout clustering (operators/layout.py): Morton-code
arithmetic vs a Python bit-interleave reference, cross-engine (DuckDB)
equality, the physical repartitionByRange rewrite's contiguous-range
invariant, and the headline claim — z-order prunes on BOTH dimensions
where a single-column sort prunes on one."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.layout import (
    cell_stats,
    partition_stats,
    pow2_bucket,
    pruning_fraction,
    zorder_cells,
    zorder_cells_sql,
    zorder_layout,
    zvalue_expr,
    zvalue_sql,
)


def _py_zvalue(vals, bits):
    """Reference Morton interleave: output bit i*n+j = bit i of vals[j]."""
    n = len(vals)
    out = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def _grid_df(spark, side=64):
    """Uniform side×side 2-d grid — every (x, y) cell once."""
    rows = [(x, y) for x in range(side) for y in range(side)]
    return spark.createDataFrame(rows, "x: long, y: long")


def test_zvalue_matches_python_reference(spark):
    rng = random.Random(7)
    rows = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "a: long, b: long, c: long")
    got = (
        df.withColumn(
            "zv", zvalue_expr([F.col("a"), F.col("b"), F.col("c")], bits=8)
        )
        .select("a", "b", "c", "zv")
        .collect()
    )
    for r in got:
        assert r.zv == _py_zvalue([r.a, r.b, r.c], 8), (r.a, r.b, r.c)


def test_pow2_bucket_clamps_and_shifts(spark):
    df = spark.createDataFrame(
        [(-5,), (0,), (63,), (64,), (1023,), (5000,)], "v: long"
    )
    got = [
        r.b
        for r in df.select(
            pow2_bucket(F.col("v"), 0, 10, bits=4).alias("b")
        ).collect()
    ]
    # range 1024 → 16 buckets of 64; out-of-range clamps to the edges
    assert got == [0, 0, 0, 1, 15, 15]


def test_zvalue_cross_engine_equality(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(200), rng.randrange(3000)) for _ in range(400)]
    df = spark.createDataFrame(rows, "a: long, d: long")
    specs = [("a", 0, 8), ("d", 0, 12)]
    got = (
        zorder_cells(df, specs, bits=8, cell_shift=6)
        .orderBy("a", "d")
        .select("a", "d", "zval", "cell")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (a BIGINT, d BIGINT); "
        + "INSERT INTO t VALUES "
        + ",".join(f"({a},{d})" for a, d in rows)
    )
    q = zorder_cells_sql("t", specs, bits=8, cell_shift=6)
    want = con.execute(
        f"SELECT a, d, zval, cell FROM ({q}) ORDER BY a, d"
    ).fetchall()
    assert [tuple(r) for r in got] == want


def test_zvalue_sql_matches_python(spark):
    con = duckdb.connect()
    rng = random.Random(3)
    for _ in range(50):
        a, b = rng.randrange(256), rng.randrange(256)
        (got,) = con.execute(
            f"SELECT {zvalue_sql([str(a), str(b)], bits=8)}"
        ).fetchone()
        assert got == _py_zvalue([a, b], 8)


def test_zorder_prunes_both_dims_linear_sort_does_not(spark):
    """The reason the operator exists: on a uniform 64×64 grid split
    into ~64 files, a point-range predicate on EITHER dimension must
    read only a bounded fraction of z-ordered files, while an x-sorted
    layout reads ~100% of files for any y predicate."""
    df = _grid_df(spark, 64)
    specs = [("x", 0, 6), ("y", 0, 6)]
    # z-order model cells: 12-bit zval >> 6 → 64 cells of 64 rows
    zstats = cell_stats(
        zorder_cells(df, specs, bits=6, cell_shift=6), ["x", "y"]
    ).cache()
    # linear layout model: 64 files of one x value each
    lin = df.withColumn("cell", F.col("x"))
    lstats = cell_stats(lin, ["x", "y"]).cache()

    # predicate: an eighth of the domain on each axis
    zx = pruning_fraction(zstats, "x", 0, 7)
    zy = pruning_fraction(zstats, "y", 0, 7)
    lx = pruning_fraction(lstats, "x", 0, 7)
    ly = pruning_fraction(lstats, "y", 0, 7)
    # linear: perfect on x, useless on y
    assert lx == pytest.approx(8 / 64)
    assert ly == 1.0
    # z-order: bounded on BOTH axes (8/64 of the square's area touches
    # each predicate → at most ~a quarter of cells overlap)
    assert zx <= 0.30 and zy <= 0.30
    # and far better than linear's worst axis
    assert max(zx, zy) < ly / 3


def test_zorder_layout_contiguous_ranges(spark):
    """The physical rewrite: partitions hold disjoint, contiguous zval
    ranges (range partitioning + in-partition sort), so each written
    file's min/max footer covers one z-interval."""
    df = _grid_df(spark, 32)
    out = zorder_layout(df, [("x", 0, 5), ("y", 0, 5)], bits=5,
                        num_partitions=8)
    st = (
        partition_stats(out, ["zval"])
        .orderBy("min_zval")
        .collect()
    )
    assert 2 <= len(st) <= 8
    assert sum(r.cnt for r in st) == 32 * 32
    for prev, cur in zip(st, st[1:]):
        assert prev.max_zval < cur.min_zval  # disjoint + ordered
