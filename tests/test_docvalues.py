"""Doc-values plane + static-rank blended scoring: pinned against the
plain scorer (weight 0), a python blend oracle, and a pruning stress
case a post-hoc blend would get wrong."""

import math

import pytest

from uci_searchengine_spark.operators.docvalues import (
    attach_doc_values,
    blended_topk,
)
from uci_searchengine_spark.operators.wand import score_wand


@pytest.fixture(scope="module")
def dv_index(spark, index_small, tmp_path_factory):
    """index_small cloned with a deterministic doc-values plane:
    value(doc) = ((doc_id * 37) % 101) / 101  — spread over [0, 1)."""
    import shutil

    d = str(tmp_path_factory.mktemp("dv_idx") / "idx")
    shutil.copytree(index_small, d)
    from uci_searchengine_spark.operators.index_build import IndexMeta

    n = IndexMeta.load(d).n_docs
    vals = spark.range(n).selectExpr(
        # divide by a DOUBLE: a bare 101.0 literal is DECIMAL in Spark SQL
        # and would truncate the value to 6 digits
        "id AS doc_id", "((id * 37) % 101) / cast(101 AS DOUBLE) AS value"
    )
    attach_doc_values(spark, d, vals, "rank")
    return d


def _dv(doc_id):
    return ((doc_id * 37) % 101) / 101.0


def test_blend_weight_zero_equals_plain(spark, dv_index):
    q = "stop0 arbak"
    plain = [(r["doc_id"], r["score"]) for r in score_wand(spark, dv_index, q, k=10).collect()]
    blended = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, dv_index, q, "rank", k=10, weight=0.0).collect()
    ]
    assert blended == plain


def test_blend_missing_plane_is_plain(spark, index_small):
    q = "stop0"
    plain = [(r["doc_id"], r["score"]) for r in score_wand(spark, index_small, q, k=10).collect()]
    blended = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, index_small, q, "nosuch", k=10, weight=3.0).collect()
    ]
    assert blended == plain


@pytest.mark.parametrize("weight", [0.1, 1.0, 25.0])
def test_blend_vs_python_oracle(spark, dv_index, oracle_small, weight):
    q = "stop0 arbak"
    scores = oracle_small.score(q)
    want = sorted(
        ((d, s + weight * _dv(d)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, dv_index, q, "rank", k=10, weight=weight).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], weight
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12), (weight, gd)


def test_blend_beats_posthoc(spark, dv_index, oracle_small):
    """At a large weight, the winners are dv-dominated docs that mostly
    sit OUTSIDE the plain bm25 top-10 — a post-scoring blend of the
    pruned top-k could not produce them, pinning that the bonus rides
    inside the θ-pruned accumulation."""
    q = "stop0"
    weight = 50.0
    scores = oracle_small.score(q)
    want = sorted(
        ((d, s + weight * _dv(d)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    plain_top = {d for d, _ in oracle_small.top_k(q, k=10)}
    assert any(d not in plain_top for d, _ in want), "stress premise broken"
    got = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, dv_index, q, "rank", k=10, weight=weight).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_blend_respects_tombstones(spark, dv_index, oracle_small, tmp_path):
    import shutil

    from uci_searchengine_spark.operators.tombstones import delete_docs

    idx2 = str(tmp_path / "idx")
    shutil.copytree(dv_index, idx2)
    q = "stop0"
    weight = 2.0
    scores = oracle_small.score(q)
    ranked = sorted(
        ((d, s + weight * _dv(d)) for d, s in scores.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    dead = ranked[0][0]
    delete_docs(idx2, [dead])
    want = [(d, s) for d, s in ranked if d != dead][:10]
    got = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, idx2, q, "rank", k=10, weight=weight).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    assert dead not in [d for d, _ in got]


def test_blend_on_appended_index(spark, tmp_path_factory):
    """Doc-values + blending on a MULTI-GENERATION index with a shared
    boundary bucket: weight-0 equals the (multi-gen-correct) scorer, and
    a nonzero blend matches the python recomputation over the scorer's
    own match set."""
    from pyspark.sql import functions as F

    from uci_searchengine_spark.operators.index_append import append_index
    from uci_searchengine_spark.operators.index_build import build_index

    d = str(tmp_path_factory.mktemp("dv_append") / "idx")
    from uci_searchengine_spark.sources.synth import synth_pages

    pages = synth_pages(spark, 300, 1337, partitions=5)
    urls = sorted(r["url"] for r in pages.select("url").distinct().collect())
    cut = urls[141]
    build_index(
        spark, pages.filter(F.col("url") < cut), d,
        num_shards=8, n_buckets=4, input_snapshot="dv-gen0",
    )
    append_index(
        spark, pages.filter(F.col("url") >= cut), d, input_snapshot="dv-gen1"
    )
    from uci_searchengine_spark.operators.index_build import IndexMeta

    n = IndexMeta.load(d).n_docs
    vals = spark.range(n).selectExpr(
        "id AS doc_id", "((id * 37) % 101) / cast(101 AS DOUBLE) AS value"
    )
    attach_doc_values(spark, d, vals, "rank")
    q = "stop0 arbak"
    plain = [
        (r["doc_id"], r["score"])
        for r in score_wand(spark, d, q, k=2000).collect()
    ]
    blended0 = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, d, q, "rank", k=2000, weight=0.0).collect()
    ]
    assert blended0 == plain
    weight = 10.0
    want = sorted(
        ((doc, s + weight * _dv(doc)) for doc, s in plain),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in blended_topk(spark, d, q, "rank", k=10, weight=weight).collect()
    ]
    assert [x[0] for x in got] == [x[0] for x in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12)


@pytest.mark.parametrize("ascending", [False, True])
def test_sort_by_field_vs_oracle(spark, dv_index, oracle_small, ascending):
    """ES sort-by-field: top-k matches ranked by the plane value (score
    carried), both directions, vs a python oracle over the match set."""
    from uci_searchengine_spark.operators.docvalues import sort_by_field_topk

    q = "stop0 arbak"
    scores = oracle_small.score(q)
    exp = sorted(
        ((d, _dv(d), s) for d, s in scores.items()),
        key=lambda t: (t[1] if ascending else -t[1], t[0]),
    )[:10]
    got = [
        (r["doc_id"], r["value"], r["score"])
        for r in sort_by_field_topk(
            spark, dv_index, q, "rank", k=10, ascending=ascending
        ).collect()
    ]
    assert [(d, round(v, 12)) for d, v, _ in got] == [
        (d, round(v, 12)) for d, v, _ in exp
    ]
    import math as _m

    for (_, _, gs), (_, _, es) in zip(got, exp):
        assert _m.isclose(gs, es, rel_tol=1e-9)


def test_sort_by_field_and_mode_and_missing_plane(
    spark, dv_index, index_small, oracle_small
):
    from uci_searchengine_spark.operators.docvalues import sort_by_field_topk

    q = "stop0 arbak"
    and_ids = {d for d, _ in oracle_small.top_k_and(q, 10**9)}
    got = sort_by_field_topk(spark, dv_index, q, "rank", k=5, mode="and").collect()
    assert all(r["doc_id"] in and_ids for r in got)
    vals = [r["value"] for r in got]
    assert vals == sorted(vals, reverse=True)
    # missing plane: every value is the dense default 0.0 → doc_id order
    got2 = sort_by_field_topk(spark, index_small, q, "nope", k=5).collect()
    assert [r["value"] for r in got2] == [0.0] * len(got2)
    ids = [r["doc_id"] for r in got2]
    assert ids == sorted(ids)


def test_rank_feature_functions(spark):
    """The three ES rank_feature transforms vs python formulas, the
    boundedness/monotonicity contract, negative clamping, pivot
    semantics (f == pivot scores boost/2), and the guard."""
    import math

    from pyspark.sql import functions as F

    from uci_searchengine_spark.operators.docvalues import (
        rank_feature_expr,
        saturation_pivot,
    )

    rows = [(i, float(v)) for i, v in enumerate([0, 1, 5, 10, 50, -3, 100])]
    df = spark.createDataFrame(rows, "id long, f double")
    pv = saturation_pivot(df, "f")
    import numpy as np

    want_pv = math.exp(np.mean([math.log(v) for _, v in rows if v > 0]))
    assert pv == pytest.approx(want_pv, rel=1e-12)
    got = {
        r["id"]: (r["s"], r["l"], r["g"])
        for r in df.select(
            "id",
            rank_feature_expr("f", "saturation", pivot=pv, boost=2.0).alias("s"),
            rank_feature_expr("f", "log", scaling=1.0).alias("l"),
            rank_feature_expr("f", "sigmoid", pivot=pv, exponent=2.0).alias("g"),
        ).collect()
    }
    for i, v in rows:
        c = max(v, 0.0)
        assert got[i][0] == pytest.approx(2.0 * c / (c + pv), rel=1e-12)
        assert got[i][1] == pytest.approx(math.log(1.0 + c), rel=1e-12)
        assert got[i][2] == pytest.approx(
            c**2 / (c**2 + pv**2) if c > 0 else 0.0, rel=1e-12
        )
        assert 0.0 <= got[i][0] <= 2.0 and 0.0 <= got[i][2] <= 1.0
    # pivot semantics: f == pivot scores exactly boost/2
    half = spark.createDataFrame([(0, float(pv))], "id long, f double").select(
        rank_feature_expr("f", "saturation", pivot=pv, boost=2.0).alias("s")
    ).collect()[0]["s"]
    assert half == pytest.approx(1.0, rel=1e-12)
    with pytest.raises(ValueError):
        rank_feature_expr("f", "linear")
