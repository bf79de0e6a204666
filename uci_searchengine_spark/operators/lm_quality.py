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


UNK = "<unk>"


def _cap_vocab(uni: DataFrame, vocab_cap: int) -> DataFrame:
    """Top-``vocab_cap`` unigrams by (count desc, term asc) — the kept
    vocabulary relation (v). Deterministic tie-break, bounded in-plan."""
    return (
        uni.orderBy(F.desc("c1"), F.asc("v")).limit(vocab_cap).select("v")
    )


def _map_unk(df: DataFrame, vocab: DataFrame, *cols: str) -> DataFrame:
    """Replace every token column not in ``vocab`` with ``<unk>`` via
    broadcast left-semi-shaped joins (one per column) — no literal
    vocabulary array in the plan, no python."""
    for c in cols:
        kept = vocab.select(F.col("v").alias(c)).withColumn(f"_k_{c}", F.lit(1))
        df = (
            df.join(F.broadcast(kept), c, "left")
            .withColumn(
                c, F.when(F.col(f"_k_{c}").isNotNull(), F.col(c)).otherwise(F.lit(UNK))
            )
            .drop(f"_k_{c}")
        )
    return df


def train_bigram_lm(
    ref_docs: DataFrame, text_col: str = "text", vocab_cap: "int | None" = None
) -> "tuple[DataFrame, DataFrame, int]":
    """(unigram_counts(v, c1), bigram_counts(v, w, c2), V) from the
    reference slice. Two groupBys over the exploded token stream of the
    REFERENCE docs only.

    ``vocab_cap`` = the CCNet/KenLM production knob: keep the top-V
    unigrams by (count desc, term asc) and fold everything else into
    ``<unk>`` BEFORE counting, so the model is bounded at V+1 unigrams
    and the OOV uniform-1/V escape disappears (out-of-vocab mass rides
    the <unk> row's real counts instead). The same mapping must be
    applied at scoring time — ``perplexity`` takes the returned
    relations, so pass the model's vocabulary via ``vocab_from_uni``."""
    toks = ref_docs.select(tokens_col(F.col(text_col)).alias("t"))
    raw_uni = (
        toks.select(F.explode("t").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c1"))
    )
    raw_big = _bigram_pairs(toks)
    if vocab_cap is None:
        uni = raw_uni
        big = raw_big.groupBy("v", "w").agg(F.count("*").alias("c2"))
        return uni, big, uni.count()
    vocab = _cap_vocab(raw_uni, vocab_cap)
    uni = (
        _map_unk(raw_uni.select("v", "c1"), vocab, "v")
        .groupBy("v")
        .agg(F.sum("c1").alias("c1"))
    )
    big = (
        _map_unk(raw_big, vocab, "v", "w")
        .groupBy("v", "w")
        .agg(F.count("*").alias("c2"))
    )
    return uni, big, uni.count()


def vocab_from_uni(uni: DataFrame) -> DataFrame:
    """The model's vocabulary relation (v) minus the <unk> row — the
    mapping set scoring must apply when the model was capped."""
    return uni.filter(F.col("v") != UNK).select("v")


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
    vocab: "DataFrame | None" = None,
) -> DataFrame:
    """(id, n_bigrams, ppl) for every doc with ≥ 2 tokens, ppl rounded
    to ``digits``. ``broadcast_model=False`` switches both model joins
    to hash joins for a model too large to broadcast. Cross-engine
    comparisons should round coarser (the gate pins 3): a doc's ppl
    averages hundreds of ln terms, so the last ~1e-9 depends on
    summation order. For a ``vocab_cap`` model pass
    ``vocab=vocab_from_uni(uni)`` so scoring applies the SAME <unk>
    mapping the counts were trained under."""
    toks = docs.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t"))
    pairs = _bigram_pairs(toks, "id")
    if vocab is not None:
        pairs = _map_unk(pairs, vocab, "v", "w")
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


def ppl_buckets(
    scored: DataFrame,
    group_col: "str | None" = None,
    probs: "tuple[float, float]" = (1.0 / 3.0, 2.0 / 3.0),
    digits: int = 6,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket each doc by where its
    perplexity falls against the (per-``group_col``, e.g. per-language)
    interpolated quantile cuts — head = most reference-like third,
    tail = least. One tiny per-group percentile agg broadcast back; the
    cuts are rounded to ``digits`` on BOTH engines before comparison so
    the boundary predicate is deterministic cross-engine (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, pinned by gate
    match_stats)."""
    lo = F.round(F.expr(f"percentile(ppl, {probs[0]!r})"), digits).alias("cut_lo")
    hi = F.round(F.expr(f"percentile(ppl, {probs[1]!r})"), digits).alias("cut_hi")
    if group_col is not None:
        cuts = scored.groupBy(group_col).agg(lo, hi)
        j = scored.join(F.broadcast(cuts), group_col)
    else:
        j = scored.crossJoin(F.broadcast(scored.agg(lo, hi)))
    return j.withColumn(
        "bucket",
        F.when(F.col("ppl") <= F.col("cut_lo"), F.lit("head"))
        .when(F.col("ppl") <= F.col("cut_hi"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("cut_lo", "cut_hi")


KN_DISCOUNT = 0.75


def train_kn_bigram(
    ref_docs: DataFrame,
    text_col: str = "text",
    vocab_cap: "int | None" = None,
) -> "tuple[DataFrame, DataFrame, DataFrame, int, int]":
    """Interpolated Kneser-Ney bigram relations (Kneser & Ney 1995, in
    Chen & Goodman 1999's interpolated form — the KenLM default, i.e.
    what CCNet's published pipeline actually ships, where the add-α
    sibling above is the pedagogical baseline). Everything is exact
    count arithmetic until scoring:

    * ``hist(v, cv, n1h)`` — cv = Σ_w c(v,w), the KN history
      denominator (NOT the unigram count: a doc-final token is no
      history); n1h = \\|{w : c(v,w) > 0}\\| drives the backoff weight
      λ(v) = D·n1h/cv.
    * ``big(v, w, c2)`` — bigram counts.
    * ``cont(w, n1c)`` — n1c = \\|{v : c(v,w) > 0}\\|, the CONTINUATION
      count: how many distinct histories w completes ("Francisco" is
      frequent but only ever follows "San", so its continuation mass
      is tiny — the insight the method is named for).
    * ``n_types`` = Σ_w n1c = \\|distinct bigram types\\|.
    * ``vocab_size`` = \\|distinct training unigrams\\| (post-cap).

    Pinned smoothing of the continuation distribution (covers OOV and
    never-seen-as-continuation words with no special casing):
    P_cont(w) = (n1c(w) + 1) / (n_types + vocab_size + 1).

    ``vocab_cap`` folds tail tokens into ``<unk>`` before counting,
    exactly as in :func:`train_bigram_lm`; apply the same mapping at
    scoring via ``kn_perplexity(..., vocab=...)``."""
    # ``big`` is read FIVE times (n_types count, the big/hist/cont
    # branches of the scoring plan, and vocab counting shares its token
    # scan); without a persist every branch re-tokenizes the reference
    # corpus and re-aggregates the bigrams. The bigram-type relation is
    # vocabulary-bounded (|types| ≪ corpus), so caching it is the
    # metadata-sized persist the KenLM shape assumes — the corpus scan
    # itself happens once per training call.
    toks = ref_docs.select(tokens_col(F.col(text_col)).alias("t"))
    raw_uni = (
        toks.select(F.explode("t").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c1"))
    )
    raw_big = _bigram_pairs(toks)
    if vocab_cap is None:
        vocab_size = raw_uni.count()
        big = raw_big.groupBy("v", "w").agg(F.count("*").alias("c2")).cache()
    else:
        vocab = _cap_vocab(raw_uni, vocab_cap)
        big = (
            _map_unk(raw_big, vocab, "v", "w")
            .groupBy("v", "w")
            .agg(F.count("*").alias("c2"))
            .cache()
        )
        vocab_size = (
            _map_unk(raw_uni.select("v"), vocab, "v").distinct().count()
        )
    hist = big.groupBy("v").agg(
        F.sum("c2").alias("cv"), F.count("*").alias("n1h")
    )
    cont = big.groupBy("w").agg(F.count("*").alias("n1c"))
    n_types = big.count()
    return hist, big, cont, n_types, vocab_size


def kn_perplexity(
    docs: DataFrame,
    hist: DataFrame,
    big: DataFrame,
    cont: DataFrame,
    n_types: int,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = KN_DISCOUNT,
    broadcast_model: bool = True,
    digits: int = 6,
    vocab: "DataFrame | None" = None,
) -> DataFrame:
    """(id, n_bigrams, ppl) under the interpolated-KN model:

    P(w|v) = max(c(v,w) − D, 0)/cv + (D·n1h(v)/cv)·P_cont(w) when
    cv > 0, else P_cont(w) (unseen history ⇒ pure continuation).
    Same dataflow as :func:`perplexity` plus one more broadcast join
    (the continuation relation is \\|vocab\\|-sized)."""
    toks = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("t")
    )
    pairs = _bigram_pairs(toks, "id")
    if vocab is not None:
        pairs = _map_unk(pairs, vocab, "v", "w")
    b = F.broadcast if broadcast_model else (lambda df: df)
    dd = F.lit(float(discount))
    denom = F.lit(float(n_types + vocab_size + 1))
    pcont = (
        F.coalesce(F.col("n1c"), F.lit(0)).cast("double") + F.lit(1.0)
    ) / denom
    p = F.when(
        F.col("cv").isNotNull() & (F.col("cv") > 0),
        F.greatest(
            F.coalesce(F.col("c2"), F.lit(0)).cast("double") - dd,
            F.lit(0.0),
        )
        / F.col("cv")
        + dd * F.col("n1h") / F.col("cv") * pcont,
    ).otherwise(pcont)
    return (
        pairs.join(b(big), ["v", "w"], "left")
        .join(b(hist), "v", "left")
        .join(b(cont), "w", "left")
        .select("id", F.log(p).alias("lp"))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.exp(-F.avg("lp")), digits).alias("ppl"),
        )
    )


def kn_perplexity_sql(
    table_sql: str,
    ref_where: str,
    tokens_expr: str,
    id_col: str = "doc_id",
    discount: float = KN_DISCOUNT,
    digits: int = 6,
) -> str:
    """DuckDB mirror of train_kn_bigram + kn_perplexity (uncapped)."""
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
hist AS (SELECT v, sum(c2) AS cv, count(*) AS n1h FROM big GROUP BY v),
cont AS (SELECT w, count(*) AS n1c FROM big GROUP BY w),
tot AS (SELECT count(*) AS nt FROM big),
pairs AS (
  SELECT id, unnest(t[1:len(t)-1]) AS v, unnest(t[2:]) AS w
  FROM src WHERE len(t) >= 2
)
SELECT p.id, count(*) AS n_bigrams,
       round(exp(-avg(ln(
         CASE WHEN coalesce(h.cv, 0) > 0 THEN
           greatest(coalesce(b.c2, 0) - {discount}, 0.0) / h.cv
           + {discount} * h.n1h / h.cv
             * ((coalesce(c.n1c, 0) + 1.0) / (t.nt + s.V + 1))
         ELSE (coalesce(c.n1c, 0) + 1.0) / (t.nt + s.V + 1)
         END))), {digits}) AS ppl
FROM pairs p
LEFT JOIN big b ON p.v = b.v AND p.w = b.w
LEFT JOIN hist h ON p.v = h.v
LEFT JOIN cont c ON p.w = c.w
CROSS JOIN tot t
CROSS JOIN vsize s
GROUP BY p.id
"""
