"""C4-style line-level corpus cleaning (Raffel et al. 2020, §2.2).

The C4 pipeline's heuristics, re-expressed as one scan-side projection:

* keep only lines that end in a terminal punctuation mark (. ! ? ")
* keep only lines with at least ``min_words`` words
* drop lines containing any of ``line_bad_words`` (C4 drops lines with
  the word "javascript")
* drop the whole page if it contains any of ``doc_bad_words`` (C4:
  the "List of Dirty, Naughty …" words and the phrase "lorem ipsum")
* drop the whole page if it contains a curly brace (code)
* drop the page unless at least ``min_lines`` lines survive (C4 keeps
  pages with >= 3 retained sentences)

Every rule is a built-in-function expression over an ``array<string>``
lines column — ``F.filter`` / ``F.exists`` higher-order functions plus
plain string predicates — so the whole operator folds into the scan's
WholeStageCodegen projection: zero shuffles, zero Python, and at 100 TB
it is exactly one pass over the corpus with column pruning intact (the
reference has no corpus-cleaning stage at all; this is part of the
training-data surface layered on the same tables, SURVEY §2 "LLM
pipeline" family).

The line-split rule belongs to the CALLER (same contract as
``dedup.paragraph_dedup``): real web text splits on newlines
(``F.split(text, "\\n")``); the synthetic bench corpus has no newline
structure, so its gate chunks the token stream via
``dedup.token_chunks_col`` and disables the punctuation rule (this
corpus has no punctuation; the rule itself is pinned by pytest on
hand-built punctuated docs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: terminal punctuation accepted by the C4 rule — period, !, ?, closing
#: double quote after one of those (C4 accepts a quote-final sentence).
_TERMINAL_RE = r'[.!?]["”]?\s*$'


def _line_word_count(line: Column) -> Column:
    t = F.trim(line)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def c4_clean(
    docs: DataFrame,
    lines,
    *,
    min_words: int = 5,
    require_terminal_punct: bool = True,
    line_bad_words: Sequence[str] = ("javascript",),
    doc_bad_words: Sequence[str] = ("lorem ipsum",),
    drop_brace_docs: bool = True,
    min_lines: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply the C4 line/page filters; returns one row per SURVIVING
    page: ``(id_col, text_clean, n_kept, n_dropped)`` with
    ``text_clean`` the retained lines joined by newlines in original
    order.

    ``lines`` is a Column producing ``array<string>`` (the split rule
    is the caller's — see module docstring). Word counts, punctuation
    and bad-word checks are all case-insensitive on lowered text,
    matching the C4 paper's description.
    """

    def keep_line(ln: Column) -> Column:
        cond = _line_word_count(ln) >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & F.trim(ln).rlike(_TERMINAL_RE)
        for w in line_bad_words:
            cond = cond & ~F.contains(F.lower(ln), F.lit(w.lower()))
        return cond

    kept = F.filter(lines, keep_line)
    out = docs.select(
        F.col(id_col),
        kept.alias("_kept"),
        (F.size(lines) - F.size(kept)).alias("n_dropped"),
        F.lower(F.col(text_col)).alias("_lc"),
    )
    doc_ok = F.size(F.col("_kept")) >= F.lit(min_lines)
    for w in doc_bad_words:
        doc_ok = doc_ok & ~F.contains(F.col("_lc"), F.lit(w.lower()))
    if drop_brace_docs:
        doc_ok = doc_ok & ~F.contains(F.col("_lc"), F.lit("{"))
    return out.filter(doc_ok).select(
        id_col,
        F.array_join("_kept", "\n").alias("text_clean"),
        F.size("_kept").alias("n_kept"),
        "n_dropped",
    )
