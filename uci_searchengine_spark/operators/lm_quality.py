"""Reference-LM perplexity quality filtering (the CCNet / Gopher
pipeline stage): train a bigram language model with add-α smoothing on
a trusted reference slice of the corpus, then score EVERY document by
its perplexity under that model — low perplexity ≈ fluent,
reference-like text; high perplexity ≈ boilerplate, gibberish, or
wrong-language content. CCNet does exactly this with a KenLM 5-gram
per language trained on Wikipedia; the bigram order keeps the model a
pair-count relation so both training and scoring stay fully relational.

Pinned semantics:

* model: P(w|v) = (c(v,w) + α) / (c(v) + α·V) where c are reference
  counts, V = |distinct reference unigrams| (add-α a.k.a. Lidstone;
  unseen history ⇒ P = 1/V);
* score: ppl(d) = exp(−mean ln P(w_i|w_{i−1})) over the doc's bigram
  positions; docs with < 2 tokens have no bigrams and are EXCLUDED
  (a length filter owns them, not the LM);
* determinism: pure count arithmetic — no sampling, no floats until
  the final log/exp.

Scale shape: training is one explode + groupBy over the REFERENCE
slice only (CCNet trains on Wikipedia, not the crawl). Scoring joins
each doc's bigrams against the model — broadcast when the model fits
(a top-V-vocab bigram table is ~V² bounded but Zipf-sparse; CCNet's
per-language models are a few GB), else a hash join keyed by the
bigram, still one shuffle of token-pair granularity — the same shape
as the n-gram dedup shingle join. A production deployment caps the
vocabulary (top-V by count, OOV→<unk>) to bound the model; pinned
here without the cap so the oracle stays exact, noted as the knob.

Reference: no quality filtering exists in UCI-SearchEngine; breadth
extension for the 100 TB training-data pipeline (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.tokenize import tokens_col

DEFAULT_ALPHA = 0.1


def _bigram_pairs(toks: DataFrame, *cols: str) -> DataFrame:
    """Explode (…, t) token arrays into (…, v, w) adjacent pairs —
    JVM-side transform over positions, one explode, no python."""
    pairs = F.expr(
        "transform(slice(t, 1, size(t) - 1), "
        "(x, i) -> struct(x AS v, element_at(t, i + 2) AS w))"
    )
    return (
        toks.filter(F.size("t") >= 2)
        .select(*cols, F.explode(pairs).alias("p"))
        .select(*cols, F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    )


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text"
) -> "tuple[DataFrame, DataFrame, int]":
    """(unigram_counts(v, c1), bigram_counts(v, w, c2), V) from the
    reference slice. Two groupBys over the exploded token stream of the
    REFERENCE docs only."""
    toks = ref_docs.select(tokens_col(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c1"))
    )
    big = _bigram_pairs(toks).groupBy("v", "w").agg(F.count("*").alias("c2"))
    return uni, big, uni.count()


def perplexity(
    docs: DataFrame,
    uni: DataFrame,
    big: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = DEFAULT_ALPHA,
    broadcast_model: bool = True,
    digits: int = 6,
) -> DataFrame:
    """(id, n_bigrams, ppl) for every doc with ≥ 2 tokens, ppl rounded
    to ``digits``. ``broadcast_model=False`` switches both model joins
    to hash joins for a model too large to broadcast. Cross-engine
    comparisons should round coarser (the gate pins 3): a doc's ppl
    averages hundreds of ln terms, so the last ~1e-9 depends on
    summation order."""
    toks = docs.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    pairs = _bigram_pairs(toks, "id")
    b = F.broadcast if broadcast_model else (lambda df: df)
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + alpha)
        / (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + alpha * vocab_size)
    )
    return (
        pairs.join(b(big), ["v", "w"], "left")
        .join(b(uni), "v", "left")
        .select("id", logp.alias("lp"))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.avg("lp")), digits).alias("ppl"),
        )
    )


def perplexity_sql(
    table_sql: str,
    ref_where: str,
    tokens_expr: str,
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
    digits: int = 6,
) -> str:
    """DuckDB mirror of train_bigram_lm + perplexity: reference slice =
    ``WHERE {ref_where}``; parallel unnests zip the (v, w) lists."""
    return f"""
WITH src AS (SELECT {id_col} AS id, {tokens_expr} AS t, {ref_where} AS is_ref
             FROM ({table_sql})),
ref AS (SELECT t FROM src WHERE is_ref),
uni AS (
  SELECT v, count(*) AS c1
  FROM (SELECT unnest(t) AS v FROM ref) GROUP BY v
),
vsize AS (SELECT count(*) AS V FROM uni),
big AS (
  SELECT v, w, count(*) AS c2 FROM (
    SELECT unnest(t[1:len(t)-1]) AS v, unnest(t[2:]) AS w
    FROM ref WHERE len(t) >= 2
  ) GROUP BY v, w
),
pairs AS (
  SELECT id, unnest(t[1:len(t)-1]) AS v, unnest(t[2:]) AS w
  FROM src WHERE len(t) >= 2
)
SELECT p.id, count(*) AS n_bigrams,
       round(exp(-avg(ln((coalesce(b.c2, 0) + {alpha})
                         / (coalesce(u.c1, 0) + {alpha} * s.V)))), {digits}) AS ppl
FROM pairs p
LEFT JOIN big b ON p.v = b.v AND p.w = b.w
LEFT JOIN uni u ON p.v = u.v
CROSS JOIN vsize s
GROUP BY p.id
"""
