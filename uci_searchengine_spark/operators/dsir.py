"""DSIR-style data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023): pick the raw-corpus documents whose hashed-n-gram
distribution looks most like a small TARGET corpus.

Pinned semantics (the paper's recipe, made relational):

* features: each doc's unigrams + space-joined bigrams, hashed into
  ``n_buckets`` buckets (md5-prefix bucket — the portable hash shared
  with operators/sampling.py so a DuckDB oracle reproduces it);
* bag-of-hashed-grams models with add-λ smoothing fit on the TARGET
  slice (p) and on the RAW corpus itself (q):
  p[b] = (c_target[b] + λ) / (C_target + λ·B), q likewise;
* per-doc importance log-weight
  logw(d) = Σ_b c_d[b] · (ln p[b] − ln q[b]), rounded to ``digits``;
* selection: Gumbel top-k resampling — key = logw + g where
  g = −ln(−ln(u)) and u is the deterministic md5 uniform of the doc id
  (so reruns select the SAME k docs on any partitioning, and the
  oracle reproduces the draw exactly). Ties break on doc id.

Scale shape: one explode + (id, bucket) groupBy over the raw corpus
(the only corpus-sized shuffle), a B-row aggregate for q, a target-only
pass for p (the target is small by construction — it's the trusted
slice), a broadcast join of the ≤B-row log-ratio table back onto the
doc features, and a bounded top-k. No all-pairs anything; q reuses the
same doc-feature relation the weights consume, so the corpus is
tokenized exactly once.

Reference: no data selection exists in UCI-SearchEngine — breadth
extension for the 100 TB training-data pipeline (SURVEY §6), from the
public DSIR paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.tokenize import tokens_col
from uci_searchengine_spark.operators.sampling import hash_uniform_col

DEFAULT_BUCKETS = 8192
DEFAULT_LAMBDA = 1.0

# unigrams ++ adjacent-bigram strings of the token array `t` (JVM HOFs)
_GRAMS_EXPR = (
    "concat(t, transform(slice(t, 1, greatest(size(t) - 1, 0)), "
    "(x, i) -> concat(x, ' ', element_at(t, i + 2))))"
)


def _bucket_col(g, n_buckets: int):
    """Hashed-gram bucket in [0, n_buckets): md5-prefix u32 mod B —
    DuckDB: CAST(CAST(('0x'||substr(md5(g),1,8)) AS UBIGINT) % B AS BIGINT)."""
    return (F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )


def hashed_features(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, c): per-doc hashed unigram+bigram counts. One
    explode + one groupBy — the corpus-sized shuffle of the pipeline."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    grams = toks.select("id", F.explode(F.expr(_GRAMS_EXPR)).alias("g"))
    return (
        grams.select("id", _bucket_col(F.col("g"), n_buckets))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("c"))
    )


def _smoothed_log(count_col, total_col, lam: float, n_buckets: int):
    return F.log(
        (count_col.cast("double") + F.lit(lam))
        / (total_col.cast("double") + F.lit(lam * n_buckets))
    )


def log_ratio_table(
    raw_feats: DataFrame,
    target: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    lam: float = DEFAULT_LAMBDA,
    text_col: str = "text",
) -> DataFrame:
    """(bucket, r): r = ln p[b] − ln q[b] over every bucket the raw
    corpus occupies (a doc can only carry raw-occupied buckets, so the
    table is complete for weighting; it is ≤ n_buckets rows →
    broadcast). q comes from aggregating ``raw_feats`` — the corpus is
    featurized once, not twice."""
    q = raw_feats.groupBy("bucket").agg(F.sum("c").alias("cq"))
    tt = target.select(tokens_col(F.col(text_col)).alias("t"))
    tgrams = tt.select(F.explode(F.expr(_GRAMS_EXPR)).alias("g"))
    p = (
        tgrams.select(_bucket_col(F.col("g"), n_buckets))
        .groupBy("bucket")
        .agg(F.count("*").alias("cp"))
    )
    joined = (
        q.join(p, "bucket", "left")
        .withColumn("cp", F.coalesce("cp", F.lit(0)))
        .crossJoin(F.broadcast(q.agg(F.sum("cq").alias("tq"))))
        .crossJoin(F.broadcast(p.agg(F.sum("cp").alias("tp"))))
    )
    r = _smoothed_log(F.col("cp"), F.col("tp"), lam, n_buckets) - _smoothed_log(
        F.col("cq"), F.col("tq"), lam, n_buckets
    )
    return joined.select("bucket", r.alias("r"))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    lam: float = DEFAULT_LAMBDA,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """(doc_id, logw): per-doc importance log-weight, rounded to
    ``digits`` (a doc's weight sums tens-to-hundreds of ln terms, so
    cross-engine comparisons should round coarser — the gate pins 3)."""
    feats = hashed_features(raw, n_buckets, text_col, id_col)
    ratio = log_ratio_table(raw_feats=feats, target=target, n_buckets=n_buckets,
                            lam=lam, text_col=text_col)
    return (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(F.round(F.sum(F.col("c") * F.col("r")), digits).alias("logw"))
        .select(F.col("id").alias("doc_id"), "logw")
    )


def gumbel_key(logw, doc_id, salt: str = "dsir", digits: int = 6):
    """logw + Gumbel(0,1) noise, deterministic per doc id: g =
    −ln(−ln(u)) with u the salted md5 uniform. Rounded so both engines
    agree on the sort key bit-for-bit."""
    u = hash_uniform_col(doc_id.cast("string"), salt=salt)
    return F.round(logw + (-F.log(-F.log(u))), digits)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    lam: float = DEFAULT_LAMBDA,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    digits: int = 6,
) -> DataFrame:
    """Gumbel top-k importance resample: the k raw docs with the
    largest (logw + deterministic Gumbel) key — DSIR's sampling-
    without-replacement draw as one bounded ORDER BY ... LIMIT k
    (TakeOrderedAndProject, never a full sort)."""
    w = importance_weights(raw, target, n_buckets, lam, text_col, id_col, digits)
    return (
        w.withColumn("key", gumbel_key(F.col("logw"), F.col("doc_id"), salt, digits))
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(k)
    )


def dsir_select_sql(
    raw_sql: str,
    target_where: str,
    k: int,
    tokens_expr: str,
    n_buckets: int = DEFAULT_BUCKETS,
    lam: float = DEFAULT_LAMBDA,
    id_col: str = "doc_id",
    salt: str = "dsir",
    digits: int = 6,
) -> str:
    """DuckDB oracle mirroring ``dsir_select`` exactly: same md5 bucket
    hash, same add-λ models, same rounded Gumbel keys. ``raw_sql`` must
    yield (doc_id, text); ``target_where`` filters it to the target
    slice."""
    lamr = repr(float(lam))
    u = (
        f"(CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || ':{salt}'),1,8)) "
        f"AS UBIGINT) / 4294967296.0)"
    )
    return f"""
WITH raw AS ({raw_sql}),
toks AS (SELECT {id_col} AS id, {tokens_expr} AS t FROM raw),
grams AS (
  SELECT id, unnest(list_concat(t,
    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS g
  FROM toks
),
feats AS (
  SELECT id,
         CAST(CAST(('0x' || substr(md5(g),1,8)) AS UBIGINT) % {n_buckets} AS BIGINT) AS bucket,
         count(*) AS c
  FROM grams GROUP BY id, bucket
),
q AS (SELECT bucket, sum(c) AS cq FROM feats GROUP BY bucket),
tgrams AS (
  SELECT unnest(list_concat(t,
    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS g
  FROM (SELECT {tokens_expr} AS t FROM raw WHERE {target_where})
),
p AS (
  SELECT CAST(CAST(('0x' || substr(md5(g),1,8)) AS UBIGINT) % {n_buckets} AS BIGINT) AS bucket,
         count(*) AS cp
  FROM tgrams GROUP BY bucket
),
ratio AS (
  SELECT q.bucket,
         ln((COALESCE(p.cp, 0) + {lamr}) / ((SELECT sum(cp) FROM p) + {lamr} * {n_buckets}))
       - ln((q.cq + {lamr}) / ((SELECT sum(cq) FROM q) + {lamr} * {n_buckets})) AS r
  FROM q LEFT JOIN p ON q.bucket = p.bucket
),
w AS (
  SELECT f.id, round(sum(f.c * ratio.r), {digits}) AS logw
  FROM feats f JOIN ratio ON f.bucket = ratio.bucket
  GROUP BY f.id
)
SELECT id AS doc_id, logw,
       round(logw + (-ln(-ln({u}))), {digits}) AS key
FROM w
ORDER BY key DESC, doc_id ASC LIMIT {k}
"""
