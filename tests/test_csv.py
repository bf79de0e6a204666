"""CSV source (sources/csv.py): RFC-4180 quote/comma torture
round-trip, corrupt-row quarantine, newline splittability trade, and
the multiLine escape hatch."""

import os

import pytest

from uci_searchengine_spark.sources.csv import read_csv, write_csv
from uci_searchengine_spark.sources.jsonl import CORRUPT_COL

DDL = "id long, text string, n long"


def test_quote_comma_roundtrip(spark, tmp_path_factory):
    rows = [
        (1, 'plain text', 1),
        (2, 'comma, embedded', 2),
        (3, 'quote " embedded', 3),
        (4, 'both, "quoted, piece" here', 4),
        (5, '', 5),
        (6, None, 6),
    ]
    df = spark.createDataFrame(rows, DDL)
    path = os.path.join(str(tmp_path_factory.mktemp("csvq")), "d")
    write_csv(df, path)
    back = sorted(tuple(r) for r in read_csv(spark, path, DDL).collect())
    # empty string and NULL both serialize to the empty field in CSV —
    # the documented lossy edge of the format; normalize both to None
    norm = lambda t: (t[0], t[1] if t[1] else None, t[2])
    assert sorted(map(norm, back)) == sorted(map(norm, rows))


def test_newline_substitution_keeps_splittable(spark, tmp_path_factory):
    rows = [(1, "line one\nline two", 1)]
    df = spark.createDataFrame(rows, DDL)
    path = os.path.join(str(tmp_path_factory.mktemp("csvn")), "d")
    write_csv(df, path)
    back = read_csv(spark, path, DDL).collect()[0]
    assert back["text"] == "line one\\nline two"  # substituted, one line
    # escape hatch: keep newlines, read multiLine
    path2 = os.path.join(str(tmp_path_factory.mktemp("csvn2")), "d")
    write_csv(df, path2, newline_sub=None)
    back2 = read_csv(spark, path2, DDL, multi_line=True).collect()[0]
    assert back2["text"] == "line one\nline two"


def test_corrupt_row_quarantine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csvc"))
    p = os.path.join(d, "part.csv")
    with open(p, "w") as f:
        f.write("id,text,n\n")
        f.write('1,ok,5\n')
        f.write('not_a_long,broken,xx\n')
        f.write('2,"fine, quoted",7\n')
    ok = read_csv(spark, d, DDL)
    assert sorted((r["id"], r["text"], r["n"]) for r in ok.collect()) == [
        (1, "ok", 5),
        (2, "fine, quoted", 7),
    ]
    kept = read_csv(spark, d, DDL, keep_corrupt=True)
    bad = kept.filter(kept[CORRUPT_COL].isNotNull()).collect()
    assert len(bad) == 1 and "not_a_long" in bad[0][CORRUPT_COL]
