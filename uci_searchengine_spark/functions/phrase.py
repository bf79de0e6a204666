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


# The positional predicates below probe the token array element-by-
# element (``F.get`` inside a filter lambda); when the array is a
# derived expression (the tokenizer projection), CollapseProject
# inlines that expression into every probe and interpreted HOF eval
# then re-tokenizes the document once PER PROBE — measured 2.5 s vs
# 0.25 s for span_not over 5k docs at sf0.1. ``bind_once`` makes the
# array a lambda variable: evaluated once, impossible to inline into.
from uci_searchengine_spark.functions.hof import bind_once as _bind


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

    def count(tt: Column) -> Column:
        def pred(i: Column) -> Column:
            conds = [
                F.get(tt, i + F.lit(j)) == F.lit(w)
                for j, w in enumerate(seq)
            ]
            return reduce(lambda a, b: a & b, conds)

        starts = F.sequence(F.lit(0), F.size(tt) - F.lit(n))
        cnt = F.size(F.filter(starts, pred))
        # guard: Spark's sequence(0, negative) yields a DESCENDING
        # range, so short docs must short-circuit to 0 rather than
        # probe bogus starts
        return F.when(F.size(tt) >= n, cnt).otherwise(F.lit(0)).cast("int")

    return _bind(toks, count)


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


# --------------------------------------------------------- proximity (slop)
# Ordered proximity ("sloppy phrase", Lucene PhraseQuery(slop) for
# in-order matches / ordered span_near): the sequence w_1..w_n matches at
# start position p iff positions p = p_1 < p_2 < ... < p_n exist with
# toks[p_j] = w_j and total gap (p_n - p_1) - (n-1) <= slop. n_occ = the
# number of distinct start positions that admit a match. The greedy
# earliest-next chain is optimal (it minimizes every p_j for a fixed
# p_1, hence the total gap), so existence = greedy success. slop=0 is
# exactly the phrase semantics above.


def count_near_py(toks: list[str], seq: list[str], slop: int) -> int:
    """Reference implementation: # of start positions from which `seq`
    matches in order within a total gap budget of `slop`."""
    n = len(seq)
    if n == 0 or len(toks) < n:
        return 0
    if n == 1:
        return sum(1 for t in toks if t == seq[0])
    win = n - 1 + slop  # max offset of the last term from the start
    hits = 0
    for i, t in enumerate(toks):
        if t != seq[0]:
            continue
        cur = i
        ok = True
        for w in seq[1:]:
            nxt = next(
                (
                    j
                    for j in range(cur + 1, min(i + win, len(toks) - 1) + 1)
                    if toks[j] == w
                ),
                None,
            )
            if nxt is None:
                ok = False
                break
            cur = nxt
        if ok:
            hits += 1
    return hits


def near_count_col(toks: Column, seq: list[str], slop: int) -> Column:
    """JVM expression mirror of ``count_near_py``: scan-side, zero
    shuffle, whole-stage codegen. Starts = positions of the first term;
    per start, a bounded greedy fold (``aggregate`` over the remaining
    terms) finds the earliest in-order chain inside the slop window."""
    n = len(seq)
    if slop < 0:
        raise ValueError("slop must be >= 0")
    if n == 0:
        return F.lit(0)
    if n == 1:
        return F.size(
            F.filter(toks, lambda x: x == F.lit(seq[0]))
        ).cast("int")
    win = n - 1 + slop

    def count(tt: Column) -> Column:
        last = F.size(tt) - F.lit(1)

        def chain_ok(i: Column) -> Column:
            rest = F.array(*[F.lit(w) for w in seq[1:]])

            def step(acc: Column, w: Column) -> Column:
                lo = acc + F.lit(1)
                hi = F.least(i + F.lit(win), last)
                nxt = F.when(
                    (acc >= 0) & (lo <= hi),
                    F.array_min(
                        F.filter(
                            F.sequence(lo, hi),
                            lambda j: F.get(tt, j.cast("int")) == w,
                        )
                    ),
                )
                return F.coalesce(nxt, F.lit(-1)).cast("long")

            return F.aggregate(rest, i.cast("long"), step) >= 0

        starts = F.filter(
            F.sequence(F.lit(0), last),
            lambda i: F.get(tt, i.cast("int")) == F.lit(seq[0]),
        )
        cnt = F.size(F.filter(starts, chain_ok))
        return (
            F.when(F.size(tt) >= n, cnt).otherwise(F.lit(0)).cast("int")
        )

    return _bind(toks, count)


def near_count_sql(seq: list[str], slop: int, toks: str = "t") -> str:
    """DuckDB mirror of ``near_count_col`` for two-term sequences
    (nested list comprehension, 1-based): the driver-gate oracle shape.
    Longer sequences are pinned in pytest against ``count_near_py``."""
    if len(seq) != 2:
        raise ValueError("near_count_sql covers the 2-term oracle shape")
    a, b = seq
    return (
        f"len([i for i in generate_series(1, len({toks})) if {toks}[i] = '{a}'"
        f" and len([j for j in generate_series(i+1, least(i+1+{slop},"
        f" len({toks}))) if {toks}[j] = '{b}']) > 0])"
    )


def positions_col(toks: Column, term: str) -> Column:
    """In-row ``array<int>`` of the term's 0-based positions."""
    return F.filter(
        F.sequence(F.lit(0), F.size(toks) - 1),
        lambda i: F.get(toks, i.cast("int")) == F.lit(term),
    )


def unordered_near_gap_col(toks: Column, a: str, b: str) -> Column:
    """Minimum gap between any occurrence of ``a`` and any occurrence
    of ``b`` in either order — Lucene ``span_near(in_order=false)`` for
    a two-term clause. gap = |pos_a − pos_b| − 1 (0 = adjacent); NULL
    when either term is absent. ``a`` and ``b`` must differ.

    Scan-side O(tf_a × tf_b) in-row nested HOF — bounded by the two
    term frequencies within ONE document (never corpus-sized), zero
    shuffle, composes with any filter/match pipeline as a plain
    column. The ordered variant is ``near_count_col`` above."""
    if a == b:
        raise ValueError("unordered_near_gap_col needs two distinct terms")

    def gap(tt: Column) -> Column:
        pa, pb = positions_col(tt, a), positions_col(tt, b)
        return (
            F.array_min(
                F.flatten(
                    F.transform(
                        pa,
                        lambda p: F.transform(pb, lambda q: F.abs(p - q)),
                    )
                )
            )
            - 1
        ).cast("int")

    return _bind(toks, gap)


def near_exists_data(toks: Column, seq: Column, slop: Column) -> Column:
    """Data-driven twin of ``near_count_col`` existence: ``seq`` and
    ``slop`` are COLUMNS (one registered phrase per row), not Python
    literals — the form the indexed percolator needs, where the query
    registry is a relation joined against candidates rather than a
    compiled expression chain. Same greedy earliest-next-chain
    semantics (slop = 0 degenerates to the exact-phrase match). Pure
    JVM higher-order functions; evaluates per candidate row only."""
    n = F.size(seq)

    def ex(tt: Column) -> Column:
        last = F.size(tt) - F.lit(1)
        win = (n - F.lit(1) + slop).cast("long")
        starts = F.filter(
            F.sequence(F.lit(0), F.greatest(last, F.lit(0))),
            lambda i: F.get(tt, i.cast("int")) == F.get(seq, 0),
        )

        def chain_ok(i: Column) -> Column:
            rest = F.slice(seq, 2, F.greatest(n - 1, F.lit(0)))

            def step(acc: Column, w: Column) -> Column:
                lo = acc + F.lit(1)
                hi = F.least(i.cast("long") + win, last.cast("long"))
                nxt = F.when(
                    (acc >= 0) & (lo <= hi),
                    F.array_min(
                        F.filter(
                            F.sequence(lo, hi),
                            lambda j: F.get(tt, j.cast("int")) == w,
                        )
                    ),
                )
                return F.coalesce(nxt, F.lit(-1)).cast("long")

            return F.aggregate(rest, i.cast("long"), step) >= 0

        return (
            F.when(
                (n > 0) & (F.size(tt) >= n),
                F.exists(starts, chain_ok),
            )
            .otherwise(F.lit(False))
        )

    return _bind(toks, ex)


# ------------------------------------------------- match_phrase_prefix
# ES match_phrase_prefix (the "search-as-you-type" phrase): the last
# query word is a PREFIX, every earlier word is exact, adjacency is
# positional — doc matches at start p iff toks[p..p+n-2] = seq and
# toks[p+n-1] starts with the prefix. Elasticsearch rewrites the last
# position to an OR over the first `max_expansions` (default 50)
# dictionary terms under the prefix; when the expansion set fits the
# cap — provable here against a 31-term vocab, and checkable at scale
# from the operators/prefix.py vocab plane — the rewrite is EXACTLY a
# starts-with predicate on the next position, which both engines
# evaluate scan-side with zero shuffle (no expansion list to build,
# broadcast, or cap). Reference-shape: the phrase extension of
# search.py's OR-match, same breadth step as functions/phrase.py above.


def count_phrase_prefix_py(
    toks: list[str], seq: list[str], prefix: str
) -> int:
    """Reference: # of starts where `seq` matches exactly and the next
    token starts with `prefix`. `seq` may be empty (bare prefix count)."""
    n = len(seq) + 1
    if len(toks) < n:
        return 0
    return sum(
        1
        for i in range(len(toks) - n + 1)
        if toks[i : i + n - 1] == seq and toks[i + n - 1].startswith(prefix)
    )


def phrase_prefix_count_col(
    toks: Column, seq: list[str], prefix: str
) -> Column:
    """JVM expression mirror of ``count_phrase_prefix_py`` — the same
    filter-over-candidate-starts HOF as ``phrase_count_col`` with the
    final position tested by ``startswith`` instead of equality."""
    n = len(seq) + 1

    def count(tt: Column) -> Column:
        def pred(i: Column) -> Column:
            conds = [
                F.get(tt, i + F.lit(j)) == F.lit(w)
                for j, w in enumerate(seq)
            ]
            conds.append(
                F.coalesce(
                    F.get(tt, i + F.lit(n - 1)).startswith(prefix),
                    F.lit(False),
                )
            )
            return reduce(lambda a, b: a & b, conds)

        starts = F.sequence(F.lit(0), F.size(tt) - F.lit(n))
        cnt = F.size(F.filter(starts, pred))
        return F.when(F.size(tt) >= n, cnt).otherwise(F.lit(0)).cast("int")

    return _bind(toks, count)


def phrase_prefix_count_sql(
    seq: list[str], prefix: str, toks: str = "t"
) -> str:
    """DuckDB mirror (1-based lists; prefix via ``starts_with``)."""
    n = len(seq) + 1
    conds = [
        f"{toks}[i+{j}] = '{w}'" if j else f"{toks}[i] = '{w}'"
        for j, w in enumerate(seq)
    ]
    conds.append(
        f"starts_with({toks}[i+{n - 1}], '{prefix}')"
        if n > 1
        else f"starts_with({toks}[i], '{prefix}')"
    )
    cond = " AND ".join(conds)
    return (
        f"len([i for i in generate_series(1, len({toks})-{n - 1}) if {cond}])"
    )


# ------------------------------------------------ span_first / span_not
# Lucene/ES span queries beyond span_near (covered by the slop family):
# span_first restricts matches to spans ENDING within the first `end`
# positions (title-ish boosting without a field split); span_not keeps
# include-spans that do NOT overlap any exclude-span (e.g. the term
# 'data' except where it starts the phrase "data join"). Both are pure
# counting predicates over the token array — scan-side HOFs with DuckDB
# list-comprehension mirrors, zero shuffle.


def count_span_first_py(toks: list[str], term: str, end: int) -> int:
    """# of `term` occurrences whose span end (0-based pos + 1) <= end."""
    return sum(1 for p, t in enumerate(toks[: max(end, 0)]) if t == term)


def span_first_count_col(toks: Column, term: str, end: int) -> Column:
    return (
        F.size(
            F.filter(
                F.slice(toks, 1, max(end, 0)),
                lambda x: x == F.lit(term),
            )
        )
        .cast("int")
    )


def span_first_count_sql(term: str, end: int, toks: str = "t") -> str:
    return (
        f"len(list_filter({toks}[1:{max(end, 0)}], x -> x = '{term}'))"
    )


def count_span_not_py(
    toks: list[str], term: str, exclude_seq: list[str]
) -> int:
    """# of `term` occurrences that do not START the exclude phrase
    (for a single-term include inside a multi-term exclude beginning
    with that term, span overlap reduces to phrase-start identity)."""
    n = len(exclude_seq)
    c = 0
    for p, t in enumerate(toks):
        if t != term:
            continue
        if toks[p : p + n] == exclude_seq:
            continue
        c += 1
    return c


def span_not_count_col(
    toks: Column, term: str, exclude_seq: list[str]
) -> Column:
    def count(tt: Column) -> Column:
        def pred(i: Column) -> Column:
            hit = F.get(tt, i) == F.lit(term)
            phr = reduce(
                lambda a, b: a & b,
                [
                    F.coalesce(
                        F.get(tt, i + F.lit(j)) == F.lit(w), F.lit(False)
                    )
                    for j, w in enumerate(exclude_seq)
                ],
            )
            return hit & ~phr

        starts = F.sequence(F.lit(0), F.size(tt) - F.lit(1))
        return (
            F.when(F.size(tt) > 0, F.size(F.filter(starts, pred)))
            .otherwise(F.lit(0))
            .cast("int")
        )

    return _bind(toks, count)


def span_not_count_sql(
    term: str, exclude_seq: list[str], toks: str = "t"
) -> str:
    phr = " AND ".join(
        f"coalesce({toks}[i+{j}] = '{w}', false)" if j
        else f"{toks}[i] = '{w}'"
        for j, w in enumerate(exclude_seq)
    )
    return (
        f"len([i for i in generate_series(1, len({toks})) "
        f"if {toks}[i] = '{term}' AND NOT ({phr})])"
    )
