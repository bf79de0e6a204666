"""Percolator: standing queries matched against incoming documents
(Lucene/Elasticsearch percolate — the alerting direction: queries are
stored, documents stream through).

Implementation is the INVERSE of the serving path and deliberately
index-free: each registered boolean query compiles to a pure-JVM column
predicate over the document's token array —

* MUST terms:   ``size(array_except(musts, t)) == 0``  (containment)
* any-of group: ``arrays_overlap(t, members)`` per group
* NOT terms:    ``NOT arrays_overlap(t, nots)``
* OR terms (no other positive clause): ``arrays_overlap(t, ors)``
* phrases:      ``phrase_count_col(t, seq) > 0`` (the engine's existing
  JVM HOF adjacency counter — functions/phrase.py); ``"a b"~N``
  registers as the proximity counter ``near_count_col`` instead

All Q predicates evaluate in ONE scan projection
(``array_compact(array(when(cond_q, qid)...))`` → explode), inside
whole-stage codegen, no Python anywhere. The same expression runs on a
batch frame or a readStream frame — percolation over Structured
Streaming is the identical call (pytest pins streamed ≡ batch).

Scale: expression size grows with the registry; fine for the
10^2-10^4 standing queries an alerting system holds per job. For 10^5+
the scale path is a term→query inverted index (pre-filter candidate
queries per doc by shared terms, then verify) — Lucene's percolator
does exactly this; noted, not needed at alerting sizes.

Matching semantics mirror boolean_search's RESULT SET exactly (score
ignored — percolation is boolean); `(a|b) -a -b` style contradictions
match nothing, queries with no positive clause match nothing.

Reference: none (breadth extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.phrase import (
    near_count_col,
    phrase_count_col,
)
from uci_searchengine_spark.functions.queryparse import parse_query
from uci_searchengine_spark.functions.tokenize import tokenize_py


def _query_pred(tcol: Column, bq) -> Column:
    conds: list[Column] = []
    if bq.must_terms:
        conds.append(
            F.size(
                F.array_except(
                    F.array(*[F.lit(t) for t in bq.must_terms]), tcol
                )
            )
            == 0
        )
    for g in bq.groups:
        conds.append(F.arrays_overlap(tcol, F.array(*[F.lit(t) for t in g])))
    for p, sl in zip(bq.phrases, bq.slops()):
        if sl > 0:  # '"a b"~N' registered query: ordered proximity
            conds.append(near_count_col(tcol, p, sl) > 0)
        else:
            conds.append(phrase_count_col(tcol, p) > 0)
    has_positive_clause = bool(bq.must_terms or bq.groups or bq.phrases)
    if bq.or_terms and not has_positive_clause:
        # pure-OR query: ≥1 scored term must appear (boolean_search's
        # result set is exactly the OR union there)
        conds.append(
            F.arrays_overlap(tcol, F.array(*[F.lit(t) for t in bq.or_terms]))
        )
    if not conds:
        return F.lit(False)  # no positive clause → matches nothing
    if bq.not_terms:
        conds.append(
            ~F.arrays_overlap(tcol, F.array(*[F.lit(t) for t in bq.not_terms]))
        )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def compile_queries(queries: "dict[str, str]", analyze=None):
    """Parse the registry once (driver-side; the registry is tiny by
    definition). ``analyze`` defaults to the pinned tokenizer — pass the
    index's analyzer chain for stemmed deployments.

    Wildcards are REJECTED here: percolation has no index vocabulary to
    expand ``stem*`` against (the matching direction is doc→queries),
    so the analyzer would silently reduce 'dat*' to the literal 'dat'
    and diverge from boolean_search's expansion semantics. Failing at
    registration time keeps the mirror-of-boolean_search contract
    honest."""
    analyze = analyze or tokenize_py
    compiled = {}
    for qid, q in queries.items():
        if "*" in q:
            raise ValueError(
                f"percolator query {qid!r} contains a wildcard: {q!r} — "
                "wildcards need an index vocabulary to expand against "
                "and are not supported in registered queries"
            )
        compiled[str(qid)] = parse_query(q, analyze)
    return compiled


def match_tokens(bq, toks: list[str]) -> bool:
    """Single-doc membership test — the python twin of ``_query_pred``
    (serving-side hook: one incoming doc, e.g. an HTTP alert check; the
    Spark expression handles the batch/stream direction). Equality with
    the column form is pinned by the batch tests' oracle."""
    from uci_searchengine_spark.functions.phrase import count_near_py

    ts = set(toks)
    if not bq.positive_terms:
        return False
    if any(t not in ts for t in bq.must_terms):
        return False
    if any(not (ts & set(g)) for g in bq.groups):
        return False
    if any(
        count_near_py(toks, p, sl) == 0
        for p, sl in zip(bq.phrases, bq.slops())
    ):
        return False
    if bq.or_terms and not (bq.must_terms or bq.groups or bq.phrases):
        if not (ts & set(bq.or_terms)):
            return False
    if ts & set(bq.not_terms):
        return False
    return True


def percolate_text(compiled: dict, text: str, analyze=None) -> list[str]:
    """Matching query ids for ONE document text (sorted)."""
    analyze = analyze or tokenize_py
    toks = analyze(text)
    return sorted(qid for qid, bq in compiled.items() if match_tokens(bq, toks))


def percolate(
    docs: DataFrame,
    queries: "dict[str, str]",
    id_col: str = "doc_id",
    tokens_col_name: str = "t",
    analyze=None,
) -> DataFrame:
    """(query_id, <id_col>) for every (registered query, doc) match.

    ``docs``: batch OR streaming DataFrame with an id column and an
    analyzed token-array column."""
    compiled = compile_queries(queries, analyze)
    t = F.col(tokens_col_name)
    hits = F.array_compact(
        F.array(
            *[
                F.when(_query_pred(t, bq), F.lit(qid))
                for qid, bq in sorted(compiled.items())
            ]
        )
    )
    return (
        docs.select(F.col(id_col), F.explode(hits).alias("query_id"))
        .select("query_id", id_col)
    )


def extraction_terms(bq) -> list[str]:
    """The candidate-index term set for one registered query — the
    no-false-negative guarantee Lucene's percolator extraction makes:
    every document matching ``bq`` contains at least one returned
    term. Pick the cheapest positive clause: one MUST term (a match
    contains all of them), else one word of the first phrase (a match
    contains every phrase word), else every member of the smallest
    any-of group, else every pure-OR term. No positive clause → []
    (matches nothing, index nothing)."""
    if bq.must_terms:
        return [min(bq.must_terms)]
    if bq.phrases:
        return [min(bq.phrases[0])]
    if bq.groups:
        return sorted(set(min(bq.groups, key=lambda g: (len(g), sorted(g)))))
    if bq.or_terms:
        return sorted(set(bq.or_terms))
    return []


_META_SCHEMA = (
    "query_id string, musts array<string>, groups array<array<string>>, "
    "ors array<string>, nots array<string>, "
    "phrases array<struct<words: array<string>, slop: int>>, "
    "or_req boolean"
)


def percolate_indexed(
    docs: DataFrame,
    queries: "dict[str, str]",
    id_col: str = "doc_id",
    tokens_col_name: str = "t",
    analyze=None,
) -> DataFrame:
    """The 10^5+-registered-queries scale path for ``percolate``:
    queries become DATA, not expressions. (a) a term→query inverted
    index over ``extraction_terms`` pre-filters candidates with one
    token-explode + broadcast equi-join (each doc meets only queries
    it shares an extraction term with — never |docs|×|registry|);
    (b) candidates verify against one broadcast query-metadata
    relation via per-row JVM higher-order functions (containment /
    overlap / data-driven greedy phrase chain — ``near_exists_data``),
    so plan size is CONSTANT in the registry where the expression
    path grows linearly (10^5 standing queries would blow codegen).
    Result set ≡ ``percolate`` exactly (pytest-pinned); batch frames
    only — the candidate distinct is a plain shuffle (streams keep
    the expression path, or add dropDuplicates+watermark).

    Reference-shape: the alerting inverse of the reference's search
    loop (backend/app/api/search.py:67-126), same as ``percolate``."""
    from uci_searchengine_spark.functions.phrase import near_exists_data

    compiled = compile_queries(queries, analyze)
    ext_rows: list[tuple[str, str]] = []
    meta_rows: list[tuple] = []
    for qid, bq in sorted(compiled.items()):
        ext = extraction_terms(bq)
        if not ext:
            continue
        ext_rows.extend((t, qid) for t in ext)
        has_pos = bool(bq.must_terms or bq.groups or bq.phrases)
        meta_rows.append(
            (
                qid,
                sorted(set(bq.must_terms)),
                [sorted(set(g)) for g in bq.groups],
                sorted(set(bq.or_terms)),
                sorted(set(bq.not_terms)),
                [
                    {"words": p, "slop": sl}
                    for p, sl in zip(bq.phrases, bq.slops())
                ],
                bool(bq.or_terms) and not has_pos,
            )
        )
    spark = docs.sparkSession
    if not meta_rows:
        return spark.createDataFrame([], f"query_id string, {id_col} long")
    ext_df = spark.createDataFrame(ext_rows, "term string, query_id string")
    meta_df = spark.createDataFrame(meta_rows, _META_SCHEMA)
    t = F.col(tokens_col_name)
    cand = (
        docs.select(
            F.col(id_col), F.explode(F.array_distinct(t)).alias("term")
        )
        .join(F.broadcast(ext_df), "term")
        .select("query_id", id_col)
        .distinct()
    )
    verified = (
        cand.join(docs.select(id_col, tokens_col_name), id_col)
        .join(F.broadcast(meta_df), "query_id")
        .filter(
            (F.size(F.array_except(F.col("musts"), t)) == 0)
            & F.forall("groups", lambda g: F.arrays_overlap(t, g))
            & F.forall(
                "phrases",
                lambda p: near_exists_data(t, p["words"], p["slop"]),
            )
            & (~F.col("or_req") | F.arrays_overlap(t, F.col("ors")))
            & ~F.arrays_overlap(t, F.col("nots"))
        )
    )
    return verified.select("query_id", id_col)
