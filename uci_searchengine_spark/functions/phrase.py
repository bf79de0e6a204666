"""Phrase (exact token-sequence) matching expressions.

The reference has no phrase operator (its search path is a pure OR over
tokens — backend/app/api/search.py:79-82); this is the breadth extension
every fulltext engine grows next. Two forms with one semantics:

* ``phrase_count_col`` — a pure-JVM Catalyst higher-order-function
  expression (filter over candidate start offsets) counting occurrences
  of the sequence inside a token array. Whole-stage codegen, scan-side,
  zero shuffle — the 100 TB shape for "which docs contain this phrase".
* ``phrase_count_sql`` — the DuckDB list-comprehension mirror used by
  the driver-gate oracles.
* ``count_phrase_py`` — the single-list reference implementation the
  oracle and the segment-path verifier share.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def count_phrase_py(toks: list[str], seq: list[str]) -> int:
    """# of (possibly overlapping) occurrences of `seq` in `toks`."""
    n = len(seq)
    if n == 0 or len(toks) < n:
        return 0
    return sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == seq)


def phrase_count_col(toks: Column, seq: list[str]) -> Column:
    """JVM expression: occurrences of the exact token sequence `seq` in
    the array column `toks`. filter(sequence(0, size-n), i -> ∧ t[i+j]=w_j)
    — element access via 0-based `get` (null-safe out of bounds)."""
    n = len(seq)
    if n == 0:
        return F.lit(0)

    def pred(i: Column) -> Column:
        conds = [
            F.get(toks, i + F.lit(j)) == F.lit(w) for j, w in enumerate(seq)
        ]
        return reduce(lambda a, b: a & b, conds)

    starts = F.sequence(F.lit(0), F.size(toks) - F.lit(n))
    cnt = F.size(F.filter(starts, pred))
    # guard: Spark's sequence(0, negative) yields a DESCENDING range, so
    # short docs must short-circuit to 0 rather than probe bogus starts
    return F.when(F.size(toks) >= n, cnt).otherwise(F.lit(0)).cast("int")


def phrase_count_sql(seq: list[str], toks: str = "t") -> str:
    """DuckDB mirror of ``phrase_count_col`` (1-based list indexing;
    generate_series(1, 0) is already empty so no short-doc guard)."""
    n = len(seq)
    if n == 0:
        return "0"
    conds = " AND ".join(
        f"{toks}[i+{j}] = '{w}'" if j else f"{toks}[i] = '{w}'"
        for j, w in enumerate(seq)
    )
    return (
        f"len([i for i in generate_series(1, len({toks})-{n - 1}) if {conds}])"
    )
