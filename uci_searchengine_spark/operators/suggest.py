"""Fuzzy term suggestion ("did you mean") over the index vocabulary.

Candidate generation + ranking, all JVM expressions in ONE pass over the
vocabulary relation (term, df) derived from the segments:

1. length pruning — ``|len(t) - len(q)| <= max_dist`` (edit distance
   lower bound), pushed into the scan;
2. character trigram overlap — ``arrays_overlap(trigrams(t), lit(Q))``
   rejects almost everything cheaply before the DP;
3. exact ``levenshtein(t, q) <= max_dist`` (Spark built-in, codegen);
4. rank (distance asc, df desc, term asc) → top-k.

Scale shape: the vocabulary of even a web corpus is orders of magnitude
smaller than its postings (~10^7-10^8 terms); suggestion is one pruned
column scan with no shuffle before the final TakeOrdered. A dedicated
deletion-neighborhood table (SymSpell) would beat it at high QPS — noted
as the next step, not needed for correctness.

Reference: no spell correction exists in UCI-SearchEngine; breadth
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.index_build import load_segments


def vocab(spark: SparkSession, index_dir: str) -> DataFrame:
    """(term, df) — df summed over segment rows, correct at any
    seg_split (sum of per-bucket dfs == total doc frequency)."""
    return (
        load_segments(spark, index_dir)
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
    )


def _trigrams(c):
    return F.expr(
        f"transform(sequence(0, greatest(length({c}) - 3, 0)),"
        f" i -> substring({c}, i + 1, 3))"
    )


def suggest(
    spark: SparkSession,
    index_dir: str,
    word: str,
    k: int = 5,
    max_dist: int = 2,
) -> DataFrame:
    """Top-k (term, df, dist) corrections for ``word``."""
    w = word.lower()
    grams = sorted(
        {w[i : i + 3] for i in range(max(len(w) - 2, 1))}
    )
    v = vocab(spark, index_dir)
    out = v.filter(
        (F.length("term") >= len(w) - max_dist)
        & (F.length("term") <= len(w) + max_dist)
    )
    if len(w) >= 4:
        # trigram prefilter — a RECALL-TRADING heuristic (FIXTURES.md):
        # a shared trigram is only GUARANTEED for len(w) ≥ 3*max_dist+3
        # (9 for max_dist=2); for 4-8 char words, adversarial distance-2
        # edits (e.g. 'abcd'→'axcy') can share none and are dropped. In
        # practice typos cluster (transposition/doubling/adjacent-key)
        # and keep a trigram; words ≤3 chars skip the filter entirely
        # because misses dominate there.
        out = out.filter(
            F.arrays_overlap(
                _trigrams("term"), F.array(*[F.lit(g) for g in grams])
            )
        )
    out = out.withColumn(
        "dist", F.levenshtein(F.col("term"), F.lit(w))
    ).filter(F.col("dist") <= max_dist)
    return out.orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    ).limit(k)


def suggest_query(
    spark: SparkSession,
    index_dir: str,
    query: str,
    max_dist: int = 2,
) -> str | None:
    """Query-level "did you mean": replace each UNKNOWN analyzed term
    (df == 0 — its shard scan returns no rows) with its best vocabulary
    correction; known terms pass through. Returns the corrected query
    string, or None when every term is known or nothing is correctable.

    One pruned-shard membership probe for the whole query + one vocab
    scan per unknown term — the rare path by construction (most queries
    have no typos)."""
    from pyspark.sql import functions as F

    from uci_searchengine_spark.operators.bm25 import terms_for_index
    from uci_searchengine_spark.operators.index_build import IndexMeta
    from uci_searchengine_spark.operators.wand import pruned_segments

    meta = IndexMeta.load(index_dir)
    terms = terms_for_index(meta, query)
    if not terms:
        return None
    seen = {
        r["term"]
        for r in pruned_segments(spark, index_dir, meta, terms)
        .select("term")
        .distinct()
        .collect()
    }
    unknown = [t for t in terms if t not in seen]
    if not unknown:
        return None
    fixes: dict[str, str] = {}
    for t in unknown:
        top = suggest(spark, index_dir, t, k=1, max_dist=max_dist).collect()
        if top:
            fixes[t] = top[0]["term"]
    if not fixes:
        return None
    return " ".join(fixes.get(t, t) for t in terms)
