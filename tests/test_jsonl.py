"""JSONL source (sources/jsonl): round-trip identity under the
explicit schema, PERMISSIVE corrupt-line quarantine (drop by default,
countable on demand), and the column-pruned scan shape."""

import json
import os

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.sources.jsonl import (
    CORRUPT_COL,
    corrupt_count,
    read_jsonl,
    write_jsonl,
)

DDL = "doc_id long, text string, lang string, n_chars long"


def _rows():
    return [
        (1, 'plain text', "en", 10),
        (2, 'quotes " and \\ backslash and \nnewline', "en", 38),
        (3, "unicode – ünïcødé ✓", "de", 19),
        (4, "", "xx", 0),
    ]


@pytest.mark.spark
class TestJsonlSource:
    def test_round_trip_identity(self, spark, tmp_path):
        df = spark.createDataFrame(
            _rows(), "doc_id long, text string, lang string, n_chars long"
        )
        p = str(tmp_path / "docs_jsonl")
        write_jsonl(df, p)
        back = read_jsonl(spark, p, DDL)
        assert sorted(map(tuple, back.collect())) == sorted(_rows())

    def test_corrupt_lines_quarantined(self, spark, tmp_path):
        p = tmp_path / "mixed"
        p.mkdir()
        good = [
            {"doc_id": 1, "text": "a", "lang": "en", "n_chars": 1},
            {"doc_id": 2, "text": "b", "lang": "en", "n_chars": 1},
        ]
        with open(p / "part-00000.json", "w") as f:
            f.write(json.dumps(good[0]) + "\n")
            f.write("{this is not json\n")
            f.write(json.dumps(good[1]) + "\n")
            f.write('["array","not","object"]\n')
        # default: malformed lines dropped, well-formed survive
        back = read_jsonl(spark, str(p), DDL)
        assert CORRUPT_COL not in back.columns
        assert sorted(r["doc_id"] for r in back.collect()) == [1, 2]
        # accounting path: both bad lines countable
        assert corrupt_count(spark, str(p), DDL) == 2

    def test_column_pruning_reaches_reader(self, spark, tmp_path):
        df = spark.createDataFrame(
            _rows(), "doc_id long, text string, lang string, n_chars long"
        )
        p = str(tmp_path / "prune")
        write_jsonl(df, p)
        narrow = read_jsonl(spark, p, DDL).select("doc_id", "lang")
        plan = narrow._sc._jvm.PythonSQLUtils.explainString(
            narrow._jdf.queryExecution(), "formatted"
        )
        rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert rs and "text" not in rs[0]  # the wide column never parsed
        assert "BatchEvalPython" not in plan

    def test_deterministic_single_file(self, spark, tmp_path):
        df = spark.createDataFrame(
            _rows(), "doc_id long, text string, lang string, n_chars long"
        )
        p = str(tmp_path / "single")
        write_jsonl(df.orderBy("doc_id"), p, single_file=True)
        parts = [
            f
            for f in os.listdir(p)
            if f.startswith("part-") and f.endswith(".json")
        ]
        assert len(parts) == 1