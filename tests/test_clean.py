"""C4-style line-level cleaning (operators/clean.c4_clean) vs a plain
Python re-implementation of the paper's rules, on REAL punctuated
multi-line docs (the gate corpus has no newlines/punctuation, so the
terminal-punctuation and newline-split paths are pinned here)."""

import re

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.clean import c4_clean

DOCS = [
    # doc 0: normal page — mixed keep/drop lines
    (
        0,
        "This is a perfectly good opening sentence for a web page.\n"
        "short line.\n"
        "No terminal punctuation on this long enough line here\n"
        "Another fine sentence that ends the way sentences should end!\n"
        'He said the quote ends the sentence properly, "like this."\n'
        "Does a question mark count as terminal punctuation too?",
    ),
    # doc 1: javascript line dropped, still enough lines survive
    (
        1,
        "Please enable JavaScript to view the comments powered by widgets.\n"
        "The first real sentence of the article starts right here.\n"
        "A second real sentence keeps the page above the line minimum.\n"
        "And a third real sentence closes out the article nicely.",
    ),
    # doc 2: page-level lorem ipsum marker — whole page dropped
    (
        2,
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed.\n"
        "This sentence would have been fine on any other web page.\n"
        "So would this one, but the page marker dooms the document.",
    ),
    # doc 3: curly brace (code) — whole page dropped
    (
        3,
        "function init() { return window.location.href; } is code.\n"
        "A fine sentence that cannot save a page containing braces.\n"
        "Another fine sentence that also cannot save this document.",
    ),
    # doc 4: only two lines survive — below min_lines, page dropped
    (
        4,
        "One surviving sentence is simply not enough for this rule.\n"
        "Two surviving sentences are still not enough for this rule.\n"
        "no punct\n"
        "tiny.",
    ),
    # doc 5: empty text
    (5, ""),
]

TERMINAL = re.compile(r'[.!?]["”]?\s*$')


def py_c4(docs, min_words=5, min_lines=3, line_bad=("javascript",), doc_bad=("lorem ipsum",)):
    out = []
    for i, text in docs:
        lines = text.split("\n") if text else [""]
        kept = []
        for ln in lines:
            words = ln.split()
            if len(words) < min_words:
                continue
            if not TERMINAL.search(ln.strip()):
                continue
            if any(w in ln.lower() for w in line_bad):
                continue
            kept.append(ln)
        lc = text.lower()
        if len(kept) < min_lines:
            continue
        if any(w in lc for w in doc_bad) or "{" in lc:
            continue
        out.append((i, "\n".join(kept), len(kept), len(lines) - len(kept)))
    return out


@pytest.mark.spark
class TestC4Clean:
    def test_matches_python_reference(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = [
            (r["doc_id"], r["text_clean"], r["n_kept"], r["n_dropped"])
            for r in c4_clean(df, F.split("text", "\n")).orderBy("doc_id").collect()
        ]
        assert got == py_c4(DOCS)

    def test_rule_effects_pinned(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = {r["doc_id"]: r for r in c4_clean(df, F.split("text", "\n")).collect()}
        # docs 2 (lorem ipsum), 3 (brace), 4 (min_lines), 5 (empty) gone
        assert set(out) == {0, 1}
        # doc 0: "short line." (<5 words) and the unpunctuated line dropped
        assert out[0]["n_kept"] == 4 and out[0]["n_dropped"] == 2
        assert "No terminal punctuation" not in out[0]["text_clean"]
        # doc 1: the javascript line dropped despite valid punctuation
        assert out[1]["n_kept"] == 3
        assert "JavaScript" not in out[1]["text_clean"]

    def test_punct_rule_optional_and_bad_word_param(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = {
            r["doc_id"]: r
            for r in c4_clean(
                df,
                F.split("text", "\n"),
                require_terminal_punct=False,
                line_bad_words=(),
                doc_bad_words=(),
                drop_brace_docs=False,
            ).collect()
        }
        # with only the word-count + min_lines rules, docs 2/3 survive
        assert {2, 3} <= set(out)
        # doc 0's unpunctuated-but-long line now survives
        assert "No terminal punctuation" in out[0]["text_clean"]

    def test_training_prep_v4_composes(self, spark):
        """v4 = c4_clean → paragraph_dedup → pack_sequences: survivors
        must be a subset of c4_clean's survivors, and every packed doc
        carries a positive token span (the per-stage semantics are each
        pinned by their own gates/tests — this pins the composition)."""
        from uci_searchengine_spark.entry_queries import q_c4_clean, q_training_prep_v4

        sf = "/root/testdata/sf0.001"
        v4 = q_training_prep_v4(spark, sf).collect()
        assert len(v4) > 0
        survivors = {r["doc_id"] for r in q_c4_clean(spark, sf).collect()}
        assert {r["doc_id"] for r in v4} <= survivors
        assert all(r["end_off"] > r["start_off"] for r in v4)

    def test_scan_side_plan(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        plan = c4_clean(df, F.split("text", "\n"))._jdf.queryExecution().executedPlan().toString()
        for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert bad not in plan, f"{bad} in c4_clean plan"
