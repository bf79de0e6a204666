"""BPE tokenizer induction at corpus scale (Sennrich et al. 2016).

A training-data pipeline that packs token sequences (operators/
packing.py) and counts tokens (textstats) eventually needs to TRAIN
the tokenizer on its own corpus; the classic byte-pair-encoding loop
is: count adjacent symbol pairs over the word-frequency table, merge
the most frequent pair everywhere, repeat. The reference engine has no
tokenizer training (its analyzer is fixed); this is breadth for the
LLM-data surface.

Spark-first shape: the working state is the WORD-FREQUENCY relation
(word, freq, syms) — vocabulary-sized, not corpus-sized; the corpus is
touched exactly once (one explode + groupBy to build word counts). Each
merge iteration is then (a) one pair-count aggregate over the
vocabulary with map-side combine, (b) a 1-row bounded top-1
(TakeOrderedAndProject), (c) a pure-JVM ``F.aggregate`` HOF that
applies the merge greedily left-to-right inside each word — no UDF, no
window, no corpus rescan. ``localCheckpoint`` every few merges
truncates the iterative lineage exactly like operators/links.pagerank.

Determinism: ties on pair count break (a asc, b asc) — pinned against
the pure-Python reference implementation in tests/test_bpe.py (exact
merge-sequence and final-segmentation equality). The iterative loop is
not expressible as one SQL statement, so the driver gate is rows-only
(the sanctioned weaker check for iterative algorithms; pagerank got a
full oracle only because its iterations need no data rewrite).

Scale: at 10^12 documents the word-frequency table of a web corpus is
~10^8 rows (Heaps' law) — each merge iteration aggregates that, not
the corpus; num_merges is 10^4-10^5 in practice, so real runs batch
the top-K non-overlapping-prefix merges per round; this implementation
keeps the textbook 1-merge-per-round loop, which is the semantics the
batched variant must reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def word_counts(toks: DataFrame, tok_col: str = "t") -> DataFrame:
    """(word, freq) from a token-array column — the ONE corpus pass."""
    return (
        toks.select(F.explode(tok_col).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _chars(word: Column) -> Column:
    return F.filter(F.split(word, ""), lambda s: s != "")


def merge_pair_col(syms: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) -> a+b greedily left-to-right inside one
    symbol array — the exact ``merge_vocab`` semantics ("a a a" with
    merge (a,a) gives [aa, a]; a freshly merged token is NOT
    re-considered as the left element in the same pass). Pure JVM
    higher-order ``aggregate`` carrying (out, prev) — prev is the one
    pending symbol lookahead needs."""
    ab = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc: Column, s: Column) -> Column:
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("prev")),
            )
            .when(
                (acc["prev"] == a) & (s == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(ab))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(syms, acc0, step, finish)


def pair_counts(state: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair frequencies over the weighted
    vocabulary state — ALL adjacent occurrences count (the textbook
    ``get_stats``), weighted by word frequency."""
    n1 = F.greatest(F.size("syms") - 1, F.lit(0))
    return (
        state.select(
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, n1).alias("a"),
                    F.slice("syms", 2, n1).alias("b"),
                )
            ).alias("p"),
            "freq",
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    words: DataFrame, num_merges: int, min_freq: int = 2
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``num_merges`` merges from a (word, freq) relation.

    Returns (merges, final_state): merges = [(a, b, pair_count)] in
    learned order; final_state = (word, freq, syms) with every merge
    applied. Stops early when the best remaining pair occurs fewer
    than ``min_freq`` times."""
    state = words.select(
        "word", "freq", _chars(F.col("word")).alias("syms")
    )
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        top = (
            pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, c))
        state = state.withColumn(
            "syms", merge_pair_col(F.col("syms"), a, b)
        )
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint(eager=False)
    return merges, state


def segment_words(words: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply a learned merge list to a (word, ...) relation — the
    tokenizer's APPLY side (inference): same greedy per-merge order."""
    out = words.withColumn("syms", _chars(F.col("word")))
    for a, b, _c in merges:
        out = out.withColumn("syms", merge_pair_col(F.col("syms"), a, b))
    return out
