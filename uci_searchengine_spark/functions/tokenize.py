"""Tokenizer pinned to the reference search-path tokenizer.

Reference: /root/reference/backend/app/api/tokenizer.py:5-9 —
lower → strip non-[\\w\\s] to space → collapse whitespace → strip → split.
The crawler's variant (`re.findall(r"\\w+", text.lower())`,
backend/app/api/crawler.py:420-421) is output-equivalent; we pin the
tokenizer.py form (FIXTURES.md §5).

Two implementations with documented trade-offs:

* ``tokenize_series`` — pandas vectorized (`Series.str` ops, Python-`re`
  Unicode `\\w` semantics). Used inside Arrow UDFs on the build path, so the
  engine is byte-compatible with the reference for Unicode text.
* ``tokens_col`` / ``tokens_sql_expr`` — pure JVM Catalyst expressions
  (whole-stage codegen, no Python). Java regex `\\w` is ASCII while Python's
  is Unicode, so these match the pinned tokenizer only on ASCII text — used
  for the relational/driver-oracle queries over the ASCII `documents` table
  where staying JVM-side matters more.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_PUNCT = re.compile(r"[^\w\s]")
_WS = re.compile(r"\s+")


def tokenize_py(text: str) -> list[str]:
    """Single-string reference tokenizer (oracle path)."""
    text = text.lower()
    text = _PUNCT.sub(" ", text)
    text = _WS.sub(" ", text).strip()
    return text.split() if text else []


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized tokenizer: Series[str] -> Series[list[str]].

    Exactly the pinned semantics, applied with pandas ``str`` ops so the
    per-row work happens in C, not a Python loop.
    """
    t = (
        s.fillna("")
        .str.lower()
        .str.replace(_PUNCT, " ", regex=True)
        .str.replace(_WS, " ", regex=True)
        .str.strip()
    )
    out = t.str.split(" ")
    # "".split(" ") == [""] — the reference's "".split() == []
    return out.where(t != "", other=None).map(lambda x: x if x is not None else [])


# JVM-side tokenization (ASCII-compatible with the pinned tokenizer).
def tokens_col(c: Column) -> Column:
    """Single-pass form: tokens are the maximal ``\\w+`` runs of the
    lowered text — output-identical to the pinned 3-pass chain (lower →
    punct→space → collapse → split; every non-word char is a separator
    in both), and the reference's own crawler variant
    (crawler.py:420-421 ``re.findall(r"\\w+", ...)``, SURVEY §2.8 notes
    the equivalence). One regex pass instead of two rewrites + trim +
    split — measurably cheaper on wide corpus scans."""
    return F.regexp_extract_all(F.lower(c), F.lit(r"\w+"), 0)


def tokens_sql_expr(col: str = "text") -> str:
    """DuckDB-compatible ANSI SQL mirroring ``tokens_col`` (ASCII corpus)."""
    return (
        f"string_split(trim(regexp_replace(regexp_replace(lower({col}), "
        f"'[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g')), ' ')"
    )
