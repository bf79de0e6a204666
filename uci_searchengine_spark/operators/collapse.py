"""Field collapsing: top-k with at most ``per_group`` results per group
(Lucene grouping / Elasticsearch ``collapse`` — the classic web-search
"one result per site" dedupe; Google's host crowding).

Physical plan: the relational full-match scoring dataflow
(``bm25.score_all`` — bounded by the MATCH SET, never the corpus),
one broadcast-friendly join to the doc store for the group key, one
window partitioned BY GROUP for the per-group rank, then the global
bounded top-k. The only shuffle beyond scoring is the window's
hash-partition on the group key over match-set rows — collapse is an
argmax per group (distributive), so at cluster scale the partial
per-partition ranks combine exactly like any map-side-combined
aggregate; AQE handles a skewed mega-host.

Reference: the reference UI returns a flat ranked list
(backend/app/api/search.py:79-126) with no grouping — breadth
extension, standard in every production search engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.bm25 import score_all
from uci_searchengine_spark.operators.index_build import load_docs


def collapsed_topk(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    per_group: int = 1,
    mode: str = "or",
    group_col=None,
) -> DataFrame:
    """(doc_id, score, group): BM25 top-k keeping at most ``per_group``
    best docs per group. Default group = the url's lowercased host
    (host-crowding collapse); pass ``group_col`` (a Column over the doc
    store's columns) for any other key. Rank contract unchanged:
    (score desc, doc_id asc), ties within a group resolved the same
    way."""
    if per_group < 1:
        raise ValueError(f"per_group must be >= 1, got {per_group}")
    scored = score_all(spark, index_dir, query, mode=mode)
    docs = load_docs(spark, index_dir)
    g = (
        group_col
        if group_col is not None
        else F.lower(F.parse_url(F.col("url"), F.lit("HOST")))
    )
    j = scored.join(docs, "doc_id").withColumn("_grp", g)
    w = Window.partitionBy("_grp").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_group)
        .select("doc_id", "score", F.col("_grp").alias("group"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
