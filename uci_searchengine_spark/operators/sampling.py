"""Deterministic (hash-based) sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning and row order, which
makes pipeline reruns non-reproducible at scale; every sampler here
derives its keep/split decision from a content hash of a key column, so
the SAME rows are selected regardless of partition count, executor
count, or row order — and a DuckDB oracle can reproduce the exact
selection (the md5-prefix trick shared with operators/dedup.py).

All expressions are pure JVM (md5 + conv + comparison) and fold into the
scan as ordinary filters: at 100 TB a 1% stratified sample is one
predicate-pushed pass, zero shuffles, no driver involvement.

Reference: no sampling exists in UCI-SearchEngine — breadth extension
for the LLM-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2^32 — the md5-prefix u32 is uniform on [0, 2^32)
_U32_SPAN = float(1 << 32)


def hash_uniform_col(key: Column, salt: str | None = None) -> Column:
    """Deterministic uniform [0,1) per key: first 8 hex chars of
    md5(key) as u32 / 2^32. Portable — DuckDB:
    CAST(('0x' || substr(md5(k),1,8)) AS UBIGINT) / 4294967296.0

    ``salt`` hashes ``key || ':' || salt`` instead — an INDEPENDENT
    uniform stream per decision. A pipeline that samples, splits,
    rebalances, and shards off the SAME unsalted md5(key) correlates
    every stage (e.g. after a ``u < 0.5`` sample, an unsalted 8-way
    shard assignment would leave shards 4-7 empty); give each composed
    decision its own salt."""
    k = key.cast("string")
    if salt:
        k = F.concat(k, F.lit(":" + salt))
    return (
        F.conv(F.substring(F.md5(k), 1, 8), 16, 10).cast("double") / _U32_SPAN
    )


def hash_uniform_sql(key: str, salt: str | None = None) -> str:
    """DuckDB mirror of ``hash_uniform_col``."""
    k = f"CAST({key} AS VARCHAR)"
    if salt:
        k = f"({k} || ':{salt}')"
    return (
        f"(CAST(('0x' || substr(md5({k}),1,8)) AS UBIGINT)"
        f" / 4294967296.0)"
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep rows whose hash-uniform falls below `fraction` — the
    deterministic analog of df.sample(fraction)."""
    return df.filter(hash_uniform_col(F.col(key_col)) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample head
    languages, keep tail languages whole). Strata missing from
    `fractions` keep `default`. One scan-side predicate, no shuffle."""
    frac = F.lit(float(default))
    for v, f in fractions.items():
        frac = F.when(F.col(strata_col) == v, F.lit(float(f))).otherwise(frac)
    return df.filter(hash_uniform_col(F.col(key_col)) < frac)


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float
) -> DataFrame:
    """Adds a deterministic `split` column ('test' below the threshold,
    'train' otherwise). Stable across reruns/partitionings — the property
    that matters for leakage-free splits of a growing corpus."""
    return df.withColumn(
        "split",
        F.when(
            hash_uniform_col(F.col(key_col)) < F.lit(float(test_fraction)),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def mixture_weights(
    df: DataFrame,
    domain_col: str,
    tok_col: str,
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain keep fractions that reshape the corpus token mix to a
    TARGET distribution by downsampling only (DoReMi/The-Pile-style
    domain mixing, applied at the data-prep stage).

    ``target`` maps domain → desired token share (need not sum to 1 —
    it is renormalized); ``None`` means uniform over observed domains.
    frac_d = (target_d / actual_share_d), rescaled so the binding
    (most-underrepresented-in-target) domain keeps fraction 1.0 — the
    sampled corpus then matches the target mix in expectation while
    discarding as little data as possible.

    Scale shape: ONE groupBy-sum over the big table; everything after
    runs on the #domains-row aggregate (the unpartitioned window is
    over that tiny relation, never the corpus).
    """
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tok_col)).alias("tokens")
    )
    if target is None:
        tgt = F.lit(1.0)
    else:
        tgt = F.lit(0.0)
        for d, w in target.items():
            tgt = F.when(F.col("domain") == d, F.lit(float(w))).otherwise(tgt)
    w_all = Window.partitionBy()
    weighted = totals.withColumn("_tgt", tgt).withColumn(
        "_ratio",
        (F.col("_tgt") / F.sum("_tgt").over(w_all))
        / (F.col("tokens") / F.sum("tokens").over(w_all)),
    )
    return weighted.select(
        "domain",
        "tokens",
        (F.col("_ratio") / F.max("_ratio").over(w_all)).alias("sample_frac"),
    )


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    tok_col: str,
    tau: float = 2.0,
) -> DataFrame:
    """Temperature-scaled mixture (the multilingual-pretraining
    convention — mT5/XLM-R style, UNIMAX's baseline): target share
    ∝ tokens_d^(1/τ), so τ=1 reproduces the corpus as-is and τ→∞
    flattens to uniform — the knob that keeps low-resource domains
    from vanishing under natural-size sampling. Same downsample-only
    normalization as :func:`mixture_weights` (the binding domain keeps
    1.0), same scale shape: ONE groupBy-sum over the big table, the
    rest on the #domains-row aggregate."""
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tok_col)).alias("tokens")
    )
    w_all = Window.partitionBy()
    tgt = F.pow(F.col("tokens").cast("double"), F.lit(1.0 / tau))
    weighted = totals.withColumn("_tgt", tgt).withColumn(
        "_ratio",
        (F.col("_tgt") / F.sum("_tgt").over(w_all))
        / (F.col("tokens") / F.sum("tokens").over(w_all)),
    )
    return weighted.select(
        "domain",
        "tokens",
        (F.col("_ratio") / F.max("_ratio").over(w_all)).alias("sample_frac"),
    )


def apply_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: DataFrame,
    salt: str = "mix",
) -> DataFrame:
    """Filter ``df`` to the mixture: broadcast the tiny per-domain
    fraction table and keep rows whose hash-uniform falls below their
    domain's fraction — deterministic, one scan, no extra shuffle.
    Salted by default so the keep decision is independent of any other
    hash-of-key decision upstream (sampling, splitting)."""
    w = weights.select(
        F.col("domain").alias(domain_col), "sample_frac"
    )
    return (
        df.join(F.broadcast(w), domain_col, "left")
        .filter(
            hash_uniform_col(F.col(key_col), salt)
            < F.coalesce("sample_frac", F.lit(0.0))
        )
        .drop("sample_frac")
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    salt: str = "strat",
    slack: float = 4.0,
) -> DataFrame:
    """EXACTLY ``min(n, |stratum|)`` rows per stratum — the trainer
    quota shape ("exactly 1M docs per language") that fractional
    sampling cannot give. The result is VALUE-DETERMINED independent
    of execution path: per stratum, the rows with the ``n`` smallest
    ``(hash_uniform(key), key)`` pairs win.

    Scale-honest two-phase plan (`df.sampleBy` is approximate;
    ranking a whole 10^10-row stratum in one sorted partition is the
    window anti-pattern this repo avoids):

    1. threshold prune — per-stratum counts (one tiny aggregate,
       broadcast back) turn the quota into a hash threshold
       ``slack·n/count``, a scan-side predicate that keeps an expected
       ``slack·n`` rows per stratum (strata at or under quota skip
       straight through);
    2. exact trim — a per-stratum rank over the SURVIVORS only
       (bounded ≈ slack·n rows per stratum, never corpus-sized).

    A driver check re-runs with doubled slack for any stratum whose
    survivor count fell under quota (probability ~e^{-Θ(n)} at
    slack 4, but the loop makes exactness total, and the winner set is
    threshold-invariant so the retry cannot change the answer)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if slack <= 1.0:
        raise ValueError("slack must be > 1")
    from pyspark.sql import Window

    u = hash_uniform_col(F.col(key_col).cast("string"), salt=salt)
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_cnt"))
    base = df.withColumn("_u", u).join(F.broadcast(counts), strata_col)
    cur_slack = float(slack)
    while True:
        thr = F.when(F.col("_cnt") <= F.lit(n), F.lit(2.0)).otherwise(
            F.least(
                F.lit(1.0000001),
                F.lit(cur_slack) * F.lit(float(n)) / F.col("_cnt"),
            )
        )
        cand = base.filter(F.col("_u") < thr)
        short = (
            cand.groupBy(strata_col)
            .agg(F.count("*").alias("_got"), F.first("_cnt").alias("_c"))
            .filter(
                (F.col("_got") < F.lit(n)) & (F.col("_c") > F.col("_got"))
            )
            .count()
        )
        if short == 0:
            break
        cur_slack *= 2.0  # deterministic widen; winner set unchanged
    w = Window.partitionBy(strata_col).orderBy(
        F.col("_u").asc(), F.col(key_col).asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.lit(n))
        .drop("_u", "_cnt", "_rk")
        .select(*df.columns)
    )


def unimax_allocation(
    df: DataFrame,
    domain_col: str,
    tok_col: str,
    budget: float,
    epoch_cap: float = 4.0,
) -> DataFrame:
    """UNIMAX language/domain sampling (Chung et al. 2023 — the
    successor to temperature scaling that `temperature_weights` names
    as its baseline): spend a total token ``budget`` as UNIFORMLY as
    possible across domains, but never repeat a domain more than
    ``epoch_cap`` epochs — low-resource domains saturate at their cap
    instead of being oversampled into memorization, and the freed
    budget waterfills the rest.

    Closed-form waterfilling, fully relational: caps = epoch_cap·c_d;
    sort ascending, a domain SATURATES when its cap fits the
    even-share test cum_prev + cap·(m−i+1) ≤ B; the waterline w =
    (B − cum_prev)/(m−i+1) at the FIRST unsaturated row; allocation
    b_d = cap_d if saturated else w; epochs e_d = b_d/c_d. One
    groupBy-sum over the corpus — every window here runs over the
    #domains-row aggregate (the `mixture_weights` scale contract),
    never the corpus. Budget beyond Σcaps allocates every cap (the
    documented exhaustion case). Returns
    (domain, tokens, alloc_tokens, epochs), floats rounded to 6."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if epoch_cap <= 0:
        raise ValueError("epoch_cap must be positive")
    totals = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.sum(F.col(tok_col)).alias("tokens")
    )
    w_ord = Window.orderBy(F.col("_cap").asc(), F.col("domain").asc())
    w_all = Window.partitionBy()
    d = (
        totals.withColumn(
            "_cap", F.col("tokens").cast("double") * F.lit(float(epoch_cap))
        )
        .withColumn("_i", F.row_number().over(w_ord))
        .withColumn(
            "_cum_prev",
            F.coalesce(
                F.sum("_cap").over(
                    w_ord.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0.0),
            ),
        )
        .withColumn("_m", F.count("*").over(w_all))
        .withColumn(
            "_sat",
            F.col("_cum_prev")
            + F.col("_cap") * (F.col("_m") - F.col("_i") + 1)
            <= F.lit(float(budget)),
        )
        .withColumn(
            "_wrow",
            (F.lit(float(budget)) - F.col("_cum_prev"))
            / (F.col("_m") - F.col("_i") + 1),
        )
    )
    wl = F.min(
        F.when(~F.col("_sat"), F.struct(F.col("_i"), F.col("_wrow")))
    ).over(w_all)["_wrow"]
    alloc = F.when(F.col("_sat"), F.col("_cap")).otherwise(
        F.coalesce(wl, F.col("_cap"))
    )
    return d.select(
        "domain",
        "tokens",
        F.round(alloc, 6).alias("alloc_tokens"),
        F.round(alloc / F.col("tokens").cast("double"), 6).alias("epochs"),
    )
