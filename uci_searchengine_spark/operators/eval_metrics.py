"""Retrieval-quality metrics: recall/precision/MRR/nDCG@k, relational.

The reference engine ships ranking (BM25 + overlap heuristics,
reference ``backend/app/services/search_service.py``) but no way to
MEASURE it; any serious relevance work needs trec_eval-style metrics
over a run file and graded qrels. This module computes them as plain
DataFrame aggregation so a million-query evaluation (batch_eval output)
scores in one pass on the cluster — no per-query driver loop.

Inputs:
* runs  (qid, doc_id, rank)  — rank 1-based within qid (batch_eval's
  output shape; ties already broken upstream by the ranker).
* qrels (qid, doc_id, rel)   — graded relevance, rel > 0 == relevant.

Semantics follow trec_eval: only topics with at least one relevant
qrel are evaluated; unjudged retrieved docs count rel=0; DCG uses the
burst gain form (2^rel − 1)/log2(rank + 1); IDCG truncates the
rel-sorted ideal list at k; MRR is 1/rank of the first relevant hit
(0 when none).

Scale shape: one left join of the rank-filtered runs onto qrels on
(qid, doc_id) — both sides shuffle-partitioned by qid, qrels typically
the broadcast side — then a single per-qid aggregate. IDCG is a
separate per-qid aggregate over qrels whose per-key state is bounded
by the topic's judged-relevant count (qrels are human-bounded, never
corpus-sized); the k-truncation happens on the sorted array, not via a
Window. Macro averages are a second tiny aggregate. No collect, no
UDF, no Window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _idcg(qrels: DataFrame, k: int) -> DataFrame:
    """(qid, n_rel, idcg): ideal DCG@k from the rel-sorted qrels."""
    rels = (
        qrels.filter(F.col("rel") > 0)
        .groupBy("qid")
        .agg(
            F.count("*").alias("n_rel"),
            F.slice(
                F.sort_array(F.collect_list("rel"), asc=False), 1, k
            ).alias("_rels"),
        )
    )
    pos = rels.select(
        "qid", "n_rel", F.posexplode("_rels").alias("_p", "_rel")
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - 1.0) / (
        F.log2(F.col("_p") + 2.0)
    )
    return pos.groupBy("qid", "n_rel").agg(F.sum(gain).alias("idcg"))


def retrieval_metrics(
    runs: DataFrame, qrels: DataFrame, k: int = 10, digits: int = 6
) -> DataFrame:
    """Per-topic metrics: ``(qid, n_ret, n_rel, recall_k, prec_k,
    mrr_k, ndcg_k)``, one row per topic that has relevant qrels."""
    r = runs.filter(F.col("rank") <= k)
    j = r.join(
        qrels.select("qid", "doc_id", "rel"), ["qid", "doc_id"], "left"
    ).select(
        "qid", "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    hit = (F.col("rel") > 0).cast("int")
    dcg = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / (
        F.log2(F.col("rank") + 1.0)
    )
    per_q = j.groupBy("qid").agg(
        F.count("*").alias("n_ret"),
        F.sum(hit).alias("_hits"),
        F.max(
            F.when(F.col("rel") > 0, 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("_rr"),
        F.sum(dcg).alias("_dcg"),
    )
    out = per_q.join(_idcg(qrels, k), "qid")  # inner: judged topics only
    return out.select(
        "qid",
        F.col("n_ret").cast("int").alias("n_ret"),
        F.col("n_rel").cast("int").alias("n_rel"),
        F.round(F.col("_hits") / F.col("n_rel"), digits).alias(f"recall_{k}"),
        F.round(F.col("_hits") / F.lit(float(k)), digits).alias(f"prec_{k}"),
        F.round(F.col("_rr"), digits).alias(f"mrr_{k}"),
        F.round(F.col("_dcg") / F.col("idcg"), digits).alias(f"ndcg_{k}"),
    )


def macro_metrics(per_topic: DataFrame, k: int = 10, digits: int = 6) -> DataFrame:
    """Mean-over-topics summary of retrieval_metrics output."""
    return per_topic.agg(
        F.count("*").cast("int").alias("n_topics"),
        *[
            F.round(F.avg(f"{m}_{k}"), digits).alias(f"mean_{m}_{k}")
            for m in ("recall", "prec", "mrr", "ndcg")
        ],
    )


def retrieval_metrics_sql(
    runs_sql: str, qrels_sql: str, k: int = 10, digits: int = 6
) -> str:
    """DuckDB mirror of retrieval_metrics — identical gain/discount
    forms and rounding (the oracle may use a window for the ideal
    ranking; the Spark side must not)."""
    return f"""
WITH runs AS ({runs_sql}),
qrels AS ({qrels_sql}),
j AS (
  SELECT r.qid, r.rank, COALESCE(q.rel, 0) AS rel
  FROM (SELECT * FROM runs WHERE rank <= {k}) r
  LEFT JOIN qrels q ON q.qid = r.qid AND q.doc_id = r.doc_id
),
per_q AS (
  SELECT qid, count(*) AS n_ret,
         SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits,
         MAX(CASE WHEN rel > 0 THEN CAST(1.0 AS DOUBLE) / rank
                  ELSE CAST(0.0 AS DOUBLE) END) AS rr,
         SUM((pow(2.0, rel) - 1.0) / log2(rank + 1.0)) AS dcg
  FROM j GROUP BY qid
),
ideal AS (
  SELECT qid, max(n_rel) AS n_rel,
         SUM((pow(2.0, rel) - 1.0) / log2(pos + 1.0)) AS idcg
  FROM (
    SELECT qid, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC) AS pos,
           count(*) OVER (PARTITION BY qid) AS n_rel
    FROM qrels WHERE rel > 0
  ) WHERE pos <= {k} GROUP BY qid
)
SELECT p.qid, CAST(p.n_ret AS INT) AS n_ret, CAST(i.n_rel AS INT) AS n_rel,
       round(p.hits / i.n_rel, {digits}) AS recall_{k},
       round(p.hits / CAST({float(k)!r} AS DOUBLE), {digits}) AS prec_{k},
       round(p.rr, {digits}) AS mrr_{k},
       round(p.dcg / i.idcg, {digits}) AS ndcg_{k}
FROM per_q p JOIN ideal i ON i.qid = p.qid
"""


def compare_runs(
    per_topic_a: DataFrame,
    per_topic_b: DataFrame,
    metric: str,
    digits: int = 6,
) -> DataFrame:
    """Paired comparison of two retrieval runs over the SAME topics
    (the trec_eval A-vs-B workflow): per-topic metric difference →
    one-row summary (n_topics, mean_a, mean_b, mean_diff, t_stat,
    wins, losses, ties). t_stat is the paired Student's t
    (mean_diff / (sd_diff/√n), sample stddev); the reader applies
    their own significance threshold — the operator reports the
    statistic, it does not pick α.

    One inner join on qid (topics missing from either run drop — both
    runs must be evaluated on the same qrels) + one aggregate."""
    a = per_topic_a.select("qid", F.col(metric).alias("_a"))
    b = per_topic_b.select("qid", F.col(metric).alias("_b"))
    d = a.join(b, "qid").select(
        "_a", "_b", (F.col("_a") - F.col("_b")).alias("_d")
    )
    n = F.count("*")
    return d.agg(
        n.cast("int").alias("n_topics"),
        F.round(F.avg("_a"), digits).alias("mean_a"),
        F.round(F.avg("_b"), digits).alias("mean_b"),
        F.round(F.avg("_d"), digits).alias("mean_diff"),
        F.round(
            F.when(
                F.stddev_samp("_d") > 0,
                F.avg("_d")
                / (F.stddev_samp("_d") / F.sqrt(n.cast("double"))),
            ),  # zero-variance diffs (identical runs): t undefined, NULL
            digits,
        ).alias("t_stat"),
        F.sum((F.col("_d") > 0).cast("int")).cast("int").alias("wins"),
        F.sum((F.col("_d") < 0).cast("int")).cast("int").alias("losses"),
        F.sum((F.col("_d") == 0).cast("int")).cast("int").alias("ties"),
    )


def compare_runs_sql(
    per_topic_a_sql: str,
    per_topic_b_sql: str,
    metric: str,
    digits: int = 6,
) -> str:
    """DuckDB mirror of compare_runs (stddev_samp ≡ Spark)."""
    return f"""
WITH a AS ({per_topic_a_sql}), b AS ({per_topic_b_sql}),
d AS (
  SELECT a.{metric} AS va, b.{metric} AS vb, a.{metric} - b.{metric} AS dd
  FROM a JOIN b USING (qid)
)
SELECT CAST(count(*) AS INT) AS n_topics,
       round(avg(va), {digits}) AS mean_a,
       round(avg(vb), {digits}) AS mean_b,
       round(avg(dd), {digits}) AS mean_diff,
       round(CASE WHEN stddev_samp(dd) > 0
                  THEN avg(dd) / (stddev_samp(dd)
                       / sqrt(CAST(count(*) AS DOUBLE)))
             END, {digits}) AS t_stat,
       CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS INT) AS wins,
       CAST(SUM(CASE WHEN dd < 0 THEN 1 ELSE 0 END) AS INT) AS losses,
       CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS INT) AS ties
FROM d
"""
