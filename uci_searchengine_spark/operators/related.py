"""Related-documents precompute: More-Like-This for EVERY document as
one declarative dataflow (the related-articles / recommend-next batch —
what a site precomputes nightly rather than serving MLT per click).

Pipeline (all Catalyst-planned JVM expressions, no Python on any path):

1. ``posts``: (doc_id, term, tf, doc_len) off the token arrays — one
   groupBy;
2. corpus stats (n_docs, avgdl) and per-term df — tiny broadcast aggs;
3. **df-cap guard** (the zipf-head rule shared with
   dedup.ngram_jaccard_pairs): terms with df > df_cap are dropped BEFORE
   selection and join — a head term would otherwise fan the candidate
   join out by df² while carrying near-zero idf signal. Recall trade is
   explicit and mirrored by the oracle;
4. selection: each doc's ``max_terms`` best terms by tf·idf (window over
   the SAME (doc_id)-keyed relation — ties (score desc, term asc));
5. candidate scoring: selection ⋈ per-(cand, term) BM25 contribution on
   term, groupBy (src, cand) sum — the one big shuffle, bounded by
   Σ_sel df(term) ≤ max_terms · df_cap rows per source doc;
6. top-k related per source (window, ties (score desc, cand asc)),
   src == cand excluded.

Scale: candidate volume is linear in corpus size with the cap on
(each doc emits ≤ max_terms · df_cap pairs); the (src, cand) aggregate
is the standard shuffle Spark map-side-combines. This is the batch
shape named in operators/mlt.py — per-doc serving MLT and this
precompute share the selection rule.

Reference: none (breadth extension; Lucene MLT semantics batched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uci_searchengine_spark import BM25_B, BM25_K1


def related_docs(
    toks: DataFrame,
    k: int = 3,
    max_terms: int = 10,
    df_cap: int = 100,
) -> DataFrame:
    """(src, cand, score): the ``k`` most similar docs per source.

    ``toks``: DataFrame(doc_id long, t array<string>) — analyzed token
    arrays (the engine's standard relational token shape)."""
    dl = toks.select("doc_id", F.size("t").alias("doc_len"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    posts = (
        toks.select(
            "doc_id",
            F.size("t").alias("doc_len"),
            F.explode("t").alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.first("doc_len").alias("doc_len"),
        )
    )
    dfs = posts.groupBy("term").agg(F.count("*").alias("df"))
    # zipf-head guard BEFORE selection and join (mirrored by the oracle)
    capped = posts.join(
        F.broadcast(dfs.filter(F.col("df") <= df_cap)), "term"
    ).crossJoin(F.broadcast(stats))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tfd = F.col("tf").cast("double")
    tf_part = tfd * (BM25_K1 + 1.0) / (
        tfd
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("doc_len") / F.col("avgdl"))
    )
    scored_posts = capped.select(
        "doc_id",
        "term",
        (tfd * idf).alias("sel_score"),  # MLT selection rank: tf·idf
        (idf * tf_part).alias("contrib"),  # BM25 contribution as CANDIDATE
    )

    w_sel = Window.partitionBy("doc_id").orderBy(
        F.desc("sel_score"), F.asc("term")
    )
    sel = (
        scored_posts.withColumn("rn", F.row_number().over(w_sel))
        .filter(F.col("rn") <= max_terms)
        .select(F.col("doc_id").alias("src"), "term")
    )

    pairs = (
        sel.join(
            scored_posts.select(
                F.col("doc_id").alias("cand"), "term", "contrib"
            ),
            "term",
        )
        .filter(F.col("src") != F.col("cand"))
        .groupBy("src", "cand")
        # rank on the ROUNDED sum: a float sum's partition order is
        # engine-dependent; 6 dp makes the ranking deterministic across
        # engines (oracle mirrors), ties broken by cand asc
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    w_top = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("cand"))
    return (
        pairs.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("src", "cand", "score")
    )
