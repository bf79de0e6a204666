"""ES composite aggregation: cursor predicate correctness vs a plain
Python oracle, full pagination = gapless/overlap-free cover of the
one-shot groupBy, and the DuckDB SQL mirror."""

import duckdb
import pytest
from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (i, ["de", "en", "es", "fr"][i % 4], f"src{i % 7}", i * 3 % 101)
        for i in range(500)
    ]
    return spark.createDataFrame(
        rows, "id long, lang string, source string, n long"
    )


def _exact(rows):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        a = agg[(r["lang"], r["source"])]
        a[0] += 1
        a[1] += r["n"]
    return sorted((k[0], k[1], v[0], v[1]) for k, v in agg.items())


@pytest.mark.spark
class TestComposite:
    METRICS = lambda self: [
        F.count("*").alias("n_docs"),
        F.sum("n").alias("sum_n"),
    ]

    def test_page_resumes_after_cursor(self, spark):
        from uci_searchengine_spark.operators.composite import composite_agg

        df = _df(spark)
        exact = _exact(df.collect())
        after = ("en", "src3")  # mid-group: both predicate branches
        exp = [t for t in exact if (t[0], t[1]) > after][:5]
        got = [
            (r["lang"], r["source"], r["n_docs"], r["sum_n"])
            for r in composite_agg(
                df, ["lang", "source"], self.METRICS(), 5, after
            ).collect()
        ]
        assert got == exp

    def test_pages_cover_bucket_space_exactly(self, spark):
        from uci_searchengine_spark.operators.composite import composite_pages

        df = _df(spark)
        seen = []
        for page in composite_pages(
            df, ["lang", "source"], self.METRICS(), size=5
        ):
            assert len(page) <= 5
            seen.extend(
                (r["lang"], r["source"], r["n_docs"], r["sum_n"])
                for r in page
            )
        assert seen == _exact(df.collect())  # gapless, no overlap, ordered

    def test_duckdb_mirror(self, spark):
        from uci_searchengine_spark.operators.composite import (
            composite_agg,
            composite_sql,
        )

        df = _df(spark)
        after = ("de", "src5")
        got = [
            tuple(r)
            for r in composite_agg(
                df, ["lang", "source"], self.METRICS(), 7, after
            ).collect()
        ]
        con = duckdb.connect()
        con.register("tbl", df.toPandas())
        sql = composite_sql(
            "SELECT * FROM tbl",
            ["lang", "source"],
            "CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(n) AS BIGINT) AS sum_n",
            7,
            after,
        )
        assert got == [tuple(r) for r in con.execute(sql).fetchall()]
