"""span_first / span_not positional queries and the per-source n-gram
diversity rollup — pinned against python references and brute force."""

import duckdb
import pytest

from uci_searchengine_spark.functions.phrase import (
    count_span_first_py,
    count_span_not_py,
    span_first_count_sql,
    span_not_count_sql,
)

ROWS = [
    ["data", "join", "x", "data", "sort", "data"],
    ["data"],
    [],
    ["x", "x", "data", "join"],
    ["join", "data", "join", "data", "join"],
    ["data", "join", "data", "join", "data", "data", "join"],
]


def test_span_refs():
    t = ROWS[0]
    # 'data' at 0-based 0 and 3 inside the first 4 positions
    assert count_span_first_py(t, "data", 4) == 2
    assert count_span_first_py(t, "data", 1) == 1
    assert count_span_first_py(t, "data", 0) == 0
    assert count_span_first_py([], "data", 5) == 0
    # span_not: pos 0 starts "data join" -> excluded; 3 and 5 survive
    assert count_span_not_py(t, "data", ["data", "join"]) == 2
    # a trailing 'data' with no successor is NOT the phrase
    assert count_span_not_py(["data"], "data", ["data", "join"]) == 1
    # every occurrence excluded -> 0
    assert count_span_not_py(
        ["data", "join", "data", "join"], "data", ["data", "join"]
    ) == 0


def test_span_sql_mirrors_match_py():
    con = duckdb.connect()
    sf = span_first_count_sql("data", 4)
    sn = span_not_count_sql("data", ["data", "join"])
    for toks in ROWS:
        lit = "[" + ", ".join(f"'{w}'" for w in toks) + "]"
        got_f, got_n = con.execute(
            f"SELECT {sf}, {sn} FROM (SELECT {lit}::VARCHAR[] AS t)"
        ).fetchone()
        assert got_f == count_span_first_py(toks, "data", 4), toks
        assert got_n == count_span_not_py(toks, "data", ["data", "join"]), toks


@pytest.mark.spark
def test_span_cols_match_py(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from uci_searchengine_spark.functions.phrase import (
        span_first_count_col,
        span_not_count_col,
    )

    df = spark.createDataFrame(pd.DataFrame({"i": range(len(ROWS)), "t": ROWS}))
    got = {
        r["i"]: (r["f"], r["n"])
        for r in df.select(
            "i",
            span_first_count_col(F.col("t"), "data", 4).alias("f"),
            span_not_count_col(F.col("t"), "data", ["data", "join"]).alias(
                "n"
            ),
        ).collect()
    }
    for i, toks in enumerate(ROWS):
        assert got[i][0] == count_span_first_py(toks, "data", 4), toks
        assert got[i][1] == count_span_not_py(
            toks, "data", ["data", "join"]
        ), toks


@pytest.mark.spark
def test_ngram_diversity_brute_force(spark, tmp_path):
    """diversity = distinct trigrams / total trigrams per source, with
    a planted low-diversity (looping) source scoring far below the
    varied one."""
    import pandas as pd

    from uci_searchengine_spark import entry_queries as eq

    loop = " ".join(["a b c"] * 40)  # 3 distinct trigram shapes repeated
    varied = " ".join(f"w{i}" for i in range(120))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [loop, varied],
            "lang": ["en"] * 2,
            "source": ["looping", "varied"],
            "n_chars": [1, 1],
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {
        r["source"]: r
        for r in eq.QUERIES["ngram_diversity"][0](spark, sf).collect()
    }

    def brute(text):
        toks = text.lower().split()
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ] or [" ".join(toks)]
        return len(grams), len(set(grams))

    for src, text in (("looping", loop), ("varied", varied)):
        tot, dis = brute(text)
        assert out[src]["total_ngrams"] == tot
        assert out[src]["distinct_ngrams"] == dis
        assert abs(out[src]["diversity"] - round(dis / tot, 6)) < 1e-9
    assert out["looping"]["diversity"] < 0.05 < out["varied"]["diversity"]
