"""ES query-DSL closure wave: terms_set (per-doc dynamic
minimum_should_match), match_phrase_prefix (search-as-you-type),
boosting (negative demote), and function_score random_score (seeded
deterministic ordering). Each pinned against a hand-computed / stdlib
reference, plus the gate invariants the DuckDB oracles rely on."""

import hashlib
import math

import pytest

from uci_searchengine_spark.functions.phrase import (
    count_phrase_prefix_py,
    phrase_prefix_count_sql,
)


# ------------------------------------------------ match_phrase_prefix
def test_count_phrase_prefix_py_reference():
    t = ["data", "spark", "x", "data", "sort", "data"]
    # "data s*": positions 0 (spark) and 3 (sort); trailing "data" has
    # no successor -> not a match.
    assert count_phrase_prefix_py(t, ["data"], "s") == 2
    # bare prefix (empty fixed seq) counts every s-token
    assert count_phrase_prefix_py(t, [], "s") == 2
    # two fixed words then prefix
    assert count_phrase_prefix_py(t, ["data", "spark"], "x") == 1
    # short doc / empty doc
    assert count_phrase_prefix_py(["data"], ["data"], "s") == 0
    assert count_phrase_prefix_py([], ["data"], "s") == 0
    # empty prefix matches ANY successor token (startswith("")) — the
    # trailing "data" still fails for want of a successor position
    assert count_phrase_prefix_py(t, ["data"], "") == 2


def test_phrase_prefix_sql_matches_py():
    import duckdb

    rows = [
        ["data", "spark", "x", "data", "sort", "data"],
        ["sort", "data"],
        ["data"],
        [],
        ["data", "stream", "data", "slow", "data", "a"],
    ]
    con = duckdb.connect()
    expr = phrase_prefix_count_sql(["data"], "s")
    for toks in rows:
        lit = "[" + ", ".join(f"'{w}'" for w in toks) + "]"
        got = con.execute(
            f"SELECT {expr} FROM (SELECT {lit}::VARCHAR[] AS t)"
        ).fetchone()[0]
        assert got == count_phrase_prefix_py(toks, ["data"], "s"), toks


@pytest.mark.spark
def test_phrase_prefix_col_matches_py(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from uci_searchengine_spark.functions.phrase import (
        phrase_prefix_count_col,
    )

    rows = [
        ["data", "spark", "x", "data", "sort", "data"],
        ["sort", "data"],
        ["data"],
        [],
        ["data", "stream", "data", "slow", "data", "a"],
        ["spark"],
    ]
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(rows)), "t": rows}))
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", phrase_prefix_count_col(F.col("t"), ["data"], "s").alias("n")
        ).collect()
    }
    for i, toks in enumerate(rows):
        assert got[i] == count_phrase_prefix_py(toks, ["data"], "s"), toks


# ------------------------------------------------------------ terms_set
@pytest.mark.spark
def test_terms_set_eligibility_and_scores(spark, tmp_path):
    """Per-doc dynamic threshold: required = 1 + doc_id % 3. Docs
    matching fewer query terms than THEIR OWN requirement are excluded
    even when a laxer doc with the same match count survives; scores of
    survivors equal the plain OR-sum BM25 (eligibility never changes
    scoring)."""
    import pandas as pd

    from uci_searchengine_spark import entry_queries as eq

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5],
            # matched counts vs ['data','spark','join']:
            # d0: 3 (req 1) keep; d1: 1 (req 2) DROP; d2: 2 (req 3) DROP
            # d3: 1 (req 1) keep; d4: 2 (req 2) keep; d5: 3 (req 3) keep
            "text": [
                "data spark join",
                "data table",
                "data spark table",
                "join table",
                "spark join table",
                "join data spark data",
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [1] * 6,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["doc_id"]: r
        for r in eq.QUERIES["terms_set"][0](spark, sf).collect()
    }
    assert set(out) == {0, 3, 4, 5}
    assert out[0]["matched"] == 3 and out[0]["required"] == 1
    assert out[4]["matched"] == 2 and out[4]["required"] == 2
    # score check vs hand BM25 (k1=1.2, b=0.75) for doc 3 ('join', tf=1)
    n_docs, avgdl = 6.0, sum(len(t.split()) for t in docs.text) / 6.0
    df_join = 4.0  # docs 0,3,4,5 contain 'join'
    dl3 = 2.0
    idf = math.log((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
    sat = 1.0 * 2.2 / (1.0 + 1.2 * (1 - 0.75 + 0.75 * dl3 / avgdl))
    assert abs(out[3]["score"] - round(idf * sat, 6)) < 1e-9


# ------------------------------------------------------------- boosting
@pytest.mark.spark
def test_boosting_demotes_by_exact_factor(spark, tmp_path):
    """A doc matching the negative clause scores exactly 0.5x what the
    identical doc without the negative term scores — and the demote can
    flip an ordering that pure BM25 would keep."""
    import pandas as pd

    from uci_searchengine_spark import entry_queries as eq

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # d0 and d1 identical positive evidence; d1 also has the
            # negative term (one extra token changes doc_len, so give
            # d0 a same-length neutral filler token).
            "text": ["data spark table", "data spark join", "data big big"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [1] * 3,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in eq.QUERIES["boosting_search"][0](spark, sf).collect()
    }
    # same doc_len, same tf pattern -> demoted is exactly half, which
    # strictly flips the tie pure BM25 would score (d0 == d1 undemoted)
    assert abs(out[1] - 0.5 * out[0]) <= 1e-6 + 1e-9
    assert out[1] < out[0]
    # one-positive-term doc stays below the full-evidence doc
    assert out[2] < out[0]


# --------------------------------------------------------- random_score
@pytest.mark.spark
def test_random_score_deterministic_and_md5_exact(spark, tmp_path):
    """rkey is the first 8 md5 hex digits of 'seed:doc_id' (stdlib-
    checkable), identical across partitionings, and rscore lands in
    [0,1)."""
    import pandas as pd

    from uci_searchengine_spark import entry_queries as eq

    docs = pd.DataFrame(
        {
            "doc_id": list(range(40)),
            "text": ["spark data"] * 40,
            "lang": ["en"] * 40,
            "source": ["s"] * 40,
            "n_chars": [1] * 40,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).repartition(7).write.parquet(
        f"{sf}/documents.parquet"
    )
    rows = eq.QUERIES["random_score"][0](spark, sf).collect()
    assert len(rows) == 10
    for r in rows:
        want = int(
            hashlib.md5(f"42:{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        assert r["rkey"] == want
        assert 0.0 <= r["rscore"] < 1.0
    # descending by rkey, stable
    keys = [r["rkey"] for r in rows]
    assert keys == sorted(keys, reverse=True)
    # a second run over a differently-partitioned copy agrees exactly
    sf2 = str(tmp_path) + "_b"
    spark.createDataFrame(docs).repartition(3).write.parquet(
        f"{sf2}/documents.parquet"
    )
    rows2 = eq.QUERIES["random_score"][0](spark, sf2).collect()
    assert [(r["doc_id"], r["rkey"]) for r in rows] == [
        (r["doc_id"], r["rkey"]) for r in rows2
    ]
