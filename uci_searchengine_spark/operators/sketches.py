"""Mergeable sketches: deterministic HyperLogLog (cardinality),
count-min (frequency), and a theta-style hash-sample quantile sketch.

The reference engine counts distincts exactly (``COUNT(DISTINCT ...)``
over its SQLite tables — e.g. the crawler-statistics distinct-domain
count behind ``/api/crawler/statistics``, reference
``backend/app/services/statistics_service.py``). Exact distinct is a
full shuffle of every key; at 10^12 documents the distinct-URL /
distinct-domain questions need a sketch. This module implements
classic HyperLogLog (Flajolet et al. 2007) as pure relational
DataFrame ops, deterministic and engine-portable:

* hash = the md5-prefix trick shared with operators/sampling.py — two
  u32 words (hex chars 1-8 and 9-16) give a 64-bit hash, so registers
  don't saturate at corpus scale (a 32-bit hash space collapses past
  ~10^9 keys; 64-bit is the HLL++ fix).
* rho (leading-zero rank) is computed with integer/string ops only
  (``length(bin(w))``), never floating log2 — bit-exact in both Spark
  and DuckDB, which is what makes the correctness gate hashable.
* registers (bucket → max rho) are a plain grouped aggregate: they ARE
  the sketch, they merge by ``max`` (union = element-wise max), and a
  grouped variant gives per-group sketches that roll up without
  rescanning data — the property that matters on a cluster.

Scale shape: one narrow projection + one (group, bucket)-keyed
aggregate with map-side combine — 2^p rows per group out, never a
distinct-key shuffle. The estimate is a second tiny aggregate over
registers. No collect, no UDF, no window.

Float caveat (documented, not hand-waved): the estimator's
``sum(pow(2,-rho))`` is order-dependent in the last ulp, so the BIGINT
estimate could in principle differ across engines if it landed within
one ulp of a .5 rounding boundary; registers and all other gate
columns are integer-exact. The small-range (linear-counting) branch
uses ``ln`` and is only taken when there are empty registers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def cms_table(
    counts: DataFrame,
    key: str = "term",
    cnt: str = "cnt",
    width: int = 1 << 14,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a keyed count
    table: ``depth`` salted md5 hash rows × ``width`` buckets, each cell
    the sum of counts hashing there. Columns: ``r, bucket, c``.

    depth×width cells bound the state no matter how many distinct keys
    exist — the frequency-estimation analog of the HLL registers above:
    at 10^12 documents the exact term-frequency table is billions of
    rows; the sketch is ``depth*width`` and merges by cell-wise sum
    (union → groupBy(r, bucket).sum). Everything is integer arithmetic,
    so estimates are bit-identical across engines by construction.

    Scale shape: input is an already-aggregated (key, count) table (one
    shuffle to build, shared with any df/tf computation); the sketch
    adds one ``depth``-way projection fan-out and one (r, bucket)
    aggregate with map-side combine — output rows ≤ depth×width.
    """
    rows = [
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(str(r)), F.col(key))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(width),
            )
            .cast("int")
            .alias("bucket"),
        )
        for r in range(depth)
    ]
    return (
        counts.select(
            F.explode(F.array(*rows)).alias("rb"), F.col(cnt).alias("_c")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key: str = "term",
    width: int = 1 << 14,
    depth: int = 4,
    est_col: str = "n_cms",
) -> DataFrame:
    """Point-estimate counts for ``queries[key]`` from a cms_table
    sketch: min over the ``depth`` cells each key hashes to (an
    over-estimate by construction — collisions only ever add). The
    sketch side is ≤ depth×width rows, so Spark broadcasts it; the
    probe is a map-side join however large the query set is."""
    probes = queries.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.pmod(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":", F.lit(str(r)), F.col(key)
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("long"),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key, F.col("rb.r").alias("r"), F.col("rb.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["r", "bucket"], "left").select(
        key, F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy(key).agg(F.min("c").alias(est_col))


def cms_sql(
    counts_sql: str,
    queries_sql: str,
    key: str = "term",
    cnt: str = "cnt",
    width: int = 1 << 14,
    depth: int = 4,
    est_col: str = "n_cms",
) -> str:
    """DuckDB mirror of cms_table + cms_estimate: identical salted
    hash, identical integer cells."""
    h = (
        f"CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || {key}),"
        f" 1, 8)) AS UBIGINT) % {width}"
    )
    return f"""
WITH kc AS ({counts_sql}),
cells AS (
  SELECT r, CAST({h} AS INT) AS bucket, SUM({cnt}) AS c
  FROM kc, range(0, {depth}) t(r)
  GROUP BY 1, 2
),
q AS ({queries_sql}),
probe AS (
  SELECT q.{key}, t.r, CAST({h} AS INT) AS bucket
  FROM q, range(0, {depth}) t(r)
)
SELECT p.{key},
       CAST(MIN(COALESCE(c.c, 0)) AS BIGINT) AS {est_col}
FROM probe p LEFT JOIN cells c ON p.r = c.r AND p.bucket = c.bucket
GROUP BY p.{key}
"""


def quantile_sample(
    df: DataFrame,
    val: str,
    key: str,
    theta: float = 1.0 / 16,
    salt: str = "qsk",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The quantile sketch itself: a theta-style deterministic hash
    sample — rows whose salted md5-uniform of ``key`` falls below
    ``theta``, projected to ``(*group_cols, u, v)``.

    Why this shape (vs t-digest/KLL): the sample IS the sketch, and it
    has the two properties that matter on a cluster, *exactly*, not
    approximately — (1) union of two sketches = sketch of the union
    (hash selection is row-local, so partial sketches from different
    tables/partitions/days concatenate), and (2) down-merge: tightening
    to theta' < theta is a plain ``u < theta'`` filter, no rescan of
    the base data. Both engines reproduce the identical sample, which
    is what makes the estimate cross-engine hashable — a t-digest's
    centroids are merge-order-dependent and could never gate.

    Scale shape: the keep decision folds into the scan as a pushed
    predicate (zero shuffle to build); expected sketch size is
    theta×N rows per group — pick theta so that fits one task (1e-6 at
    10^12 rows → ~10^6 sampled values), giving ±O(1/sqrt(theta·N))
    rank error (Vapnik–Chervonenkis sampling bound), e.g. ~1e-3 rank
    error at 10^6 samples."""
    from uci_searchengine_spark.operators.sampling import hash_uniform_col

    groups = list(group_cols or [])
    u = hash_uniform_col(F.col(key), salt)
    return df.select(
        *groups, u.alias("u"), F.col(val).cast("double").alias("v")
    ).filter(F.col("u") < F.lit(float(theta)))


def _prob_name(p: float) -> str:
    return "p" + format(p * 100, "g").replace(".", "_")


def quantile_estimate(
    sample: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    group_cols: list[str] | None = None,
    digits: int = 6,
) -> DataFrame:
    """Interpolated quantiles of a quantile_sample sketch [per group]:
    one grouped aggregate over theta×N rows. Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation convention
    (pinned by the ppl_buckets gate); ``digits`` rounding absorbs the
    last-ulp summation differences."""
    groups = list(group_cols or [])
    return sample.groupBy(*groups).agg(
        F.count("*").alias("n_sample"),
        *[
            F.round(F.percentile("v", F.lit(p)), digits).alias(_prob_name(p))
            for p in probs
        ],
    )


def sampled_quantiles(
    df: DataFrame,
    val: str,
    key: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    theta: float = 1.0 / 16,
    salt: str = "qsk",
    group_cols: list[str] | None = None,
    digits: int = 6,
) -> DataFrame:
    """One-shot scalable percentiles: sketch + estimate. The 100 TB
    path for ES ``percentiles`` aggregations — the exact per-group
    ``percentile`` used on bounded match sets (match_stats) gathers
    every value of a group into one task and cannot run corpus-wide."""
    return quantile_estimate(
        quantile_sample(df, val, key, theta, salt, group_cols),
        probs,
        group_cols,
        digits,
    )


def sampled_quantiles_sql(
    table_sql: str,
    val: str,
    key: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    theta: float = 1.0 / 16,
    salt: str = "qsk",
    group_cols: list[str] | None = None,
    digits: int = 6,
) -> str:
    """DuckDB mirror of sampled_quantiles: identical salted hash
    selection, quantile_cont ≡ Spark percentile, identical rounding."""
    from uci_searchengine_spark.operators.sampling import hash_uniform_sql

    groups = list(group_cols or [])
    gsel = "".join(g + ", " for g in groups)
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    qs = ", ".join(
        f"round(quantile_cont(v, {p!r}), {digits}) AS {_prob_name(p)}"
        for p in probs
    )
    return f"""
WITH s AS (
  SELECT {gsel}CAST({val} AS DOUBLE) AS v
  FROM ({table_sql})
  WHERE {hash_uniform_sql(key, salt)} < {float(theta)!r}
)
SELECT {gsel}count(*) AS n_sample, {qs} FROM s {gby}
"""


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709340954839503
    return 0.7213 / (1.0 + 1.079 / m)


def _hll_cols(key: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) from the 64-bit md5-prefix hash of ``key``.

    bucket = top p bits of the high u32; rho = 1 + leading zeros of
    the remaining 64-p bits (high remainder ‖ low u32), capped at
    64-p+1 when the remainder is all zero.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    hi = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    w_hi = 32 - p  # bits of hi left after the bucket index
    bucket = F.shiftright(hi, w_hi).cast("int")
    rem = hi.bitwiseAND(F.lit((1 << w_hi) - 1))
    rho = (
        F.when(rem > 0, F.lit(w_hi + 1) - F.length(F.bin(rem)))
        .when(lo > 0, F.lit(w_hi + 32 + 1) - F.length(F.bin(lo)))
        .otherwise(F.lit(64 - p + 1))
        .cast("int")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    key: Column,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The sketch itself: one row per (group, bucket) with the max
    rank. Columns: ``*group_cols, bucket, rho``. Merge two sketches
    (or roll sub-group sketches up to a coarser grouping) with
    ``union → groupBy(bucket).agg(max(rho))`` — no data rescan."""
    bucket, rho = _hll_cols(key, p)
    groups = list(group_cols or [])
    return (
        df.select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 12,
    group_cols: list[str] | None = None,
    est_col: str = "n_est",
) -> DataFrame:
    """Cardinality estimate from a register table (per group if
    ``group_cols``). Raw HLL estimate with the standard small-range
    linear-counting correction when empty registers exist."""
    m = 1 << p
    alpha = _alpha(m)
    groups = list(group_cols or [])
    agg = registers.groupBy(*groups).agg(
        F.count("*").alias("_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s"),
        F.max("rho").alias("max_rho"),
    )
    empty = F.lit(m) - F.col("_used")
    e_raw = F.lit(alpha * m * m) / (F.col("_s") + empty.cast("double"))
    # linear counting when the raw estimate is small AND empties exist
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *groups,
        F.round(est).cast("long").alias(est_col),
        F.col("_used").cast("int").alias("n_buckets"),
        "max_rho",
    )


def hll_distinct(
    df: DataFrame,
    key: Column,
    p: int = 12,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-shot approximate COUNT(DISTINCT key) [per group]."""
    return hll_estimate(
        hll_registers(df, key, p, group_cols), p, group_cols
    )


def hll_sql(
    key_expr: str,
    table_sql: str,
    p: int = 12,
    group_cols: list[str] | None = None,
    est_col: str = "n_est",
) -> str:
    """The DuckDB mirror of hll_distinct — same hash, same integer
    rho, same constants (alpha embedded via repr so both engines parse
    the identical double literal)."""
    m = 1 << p
    # precomputed in Python exactly like the Spark side's
    # F.lit(alpha*m*m), then CAST AS DOUBLE: a bare decimal literal is
    # DECIMAL in DuckDB and overflows on multiplication
    amm = f"CAST({_alpha(m) * m * m!r} AS DOUBLE)"
    w_hi = 32 - p
    mask = (1 << w_hi) - 1
    groups = list(group_cols or [])
    gsel = "".join(g + ", " for g in groups)
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    gby_b = "GROUP BY " + gsel + "bucket"
    return f"""
WITH h AS (
  SELECT {gsel}
         CAST(('0x' || substr(md5({key_expr}), 1, 8)) AS UBIGINT) AS hi,
         CAST(('0x' || substr(md5({key_expr}), 9, 8)) AS UBIGINT) AS lo
  FROM {table_sql}
), b AS (
  SELECT {gsel}
         CAST(hi // {mask + 1} AS INT) AS bucket,
         CASE WHEN hi % {mask + 1} > 0
                THEN {w_hi + 1} - length(bin(hi % {mask + 1}))
              WHEN lo > 0 THEN {w_hi + 32 + 1} - length(bin(lo))
              ELSE {64 - p + 1} END AS rho
  FROM h
), regs AS (
  SELECT {gsel}bucket, CAST(MAX(rho) AS INT) AS rho FROM b {gby_b}
), agg AS (
  SELECT {gsel}count(*) AS used, SUM(pow(2.0, -rho)) AS s,
         MAX(rho) AS max_rho
  FROM regs {gby}
)
SELECT {gsel}
       CAST(round(CASE WHEN {amm} / (s + ({m} - used))
                         <= CAST({2.5 * m!r} AS DOUBLE) AND used < {m}
                  THEN CAST({float(m)!r} AS DOUBLE)
                       * ln(CAST({float(m)!r} AS DOUBLE) / ({m} - used))
                  ELSE {amm} / (s + ({m} - used)) END)
            AS BIGINT) AS {est_col},
       CAST(used AS INT) AS n_buckets, max_rho
FROM agg
"""


# ---------------------------------------------------------------------------
# Bloom filter: set-membership sketch + broadcast semi-join pre-filter
# ---------------------------------------------------------------------------


def _bloom_bits(key: Column, m_bits: int, k: int) -> Column:
    """Array of the ``k`` bit indices ``key`` hashes to — the salted
    md5-prefix hash family shared with cms_table above, so DuckDB can
    mirror it bit-for-bit. Bit ``b`` of the filter lives at word
    ``b // 64``, position ``b % 64`` (1<<63 goes negative as a signed
    long; bit_or/& don't care)."""
    return F.array(
        *[
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws(":", F.lit(str(r)), key)), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(m_bits),
            )
            for r in range(k)
        ]
    )


# shiftleft by a column needs the SQL form (the Python wrapper takes a
# literal shift only); operates on a column literally named ``bit``
_MASK_EXPR = "shiftleft(CAST(1 AS BIGINT), CAST(pmod(bit, 64) AS INT))"


def bloom_words(
    keys: DataFrame,
    key: str,
    m_bits: int = 1 << 12,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter (Bloom 1970) of ``keys[key]`` as a word
    table ``(wi int, wv long)`` — at most ``m_bits/64`` rows however
    many keys go in. This is the runtime-filter shape Spark itself
    uses for its InjectRuntimeFilter bloom: the build side collapses
    to a constant-size bitmap via an associative ``bit_or`` aggregate
    (map-side combine free — partial filters OR together), which then
    broadcasts to every scan task of the probe side.

    Reference parity: the reference checks crawl-frontier membership
    row-at-a-time against SQLite unique indexes
    (backend/app/api/crawler.py:271-294 discovered-URL dedup); at
    10^12 URLs the exact membership relation is the largest table in
    the system, while this sketch is ``m_bits/64`` longs with a
    tunable false-positive rate and zero false negatives.
    """
    return (
        keys.select(F.explode(_bloom_bits(F.col(key), m_bits, k)).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("int").alias("wi"),
            F.expr(_MASK_EXPR).alias("mask"),
        )
        .groupBy("wi")
        .agg(F.expr("bit_or(mask)").alias("wv"))
    )


def bloom_hit(
    probe: DataFrame,
    key: str,
    words: DataFrame,
    m_bits: int = 1 << 12,
    k: int = 3,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Annotate ``probe`` with membership in the filter: true iff all
    ``k`` hashed bits are set. The word table is ≤ m_bits/64 rows and
    broadcast, so the probe is a map-side join at any probe size —
    no shuffle of the (possibly 100 TB) probe relation. Guaranteed
    no-false-negative: a key that went into the filter always hits."""
    exploded = probe.select(
        key, F.explode(_bloom_bits(F.col(key), m_bits, k)).alias("bit")
    ).select(
        key,
        (F.col("bit") / 64).cast("int").alias("wi"),
        F.expr(_MASK_EXPR).alias("mask"),
    )
    joined = exploded.join(F.broadcast(words), "wi", "left")
    per_hash = joined.select(
        key,
        (
            F.coalesce(F.col("wv"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
        ).alias("h"),
    )
    return per_hash.groupBy(key).agg(F.expr("bool_and(h)").alias(hit_col))


def bloom_sql(
    keys_sql: str,
    probe_sql: str,
    build_key: str,
    probe_key: str,
    m_bits: int = 1 << 12,
    k: int = 3,
    hit_col: str = "bloom_hit",
) -> str:
    """DuckDB mirror of bloom_words + bloom_hit: identical salted
    md5-prefix hash, identical word/mask layout, bit_or aggregate.
    DuckDB's signed << raises on bit 63, so its words live in UBIGINT —
    the bit patterns match Spark's signed longs and the gate columns
    are booleans, so signedness never surfaces."""
    bit = (
        f"CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || KEY), 1, 8))"
        f" AS UBIGINT)::BIGINT % {m_bits}"
    )
    b_bit = bit.replace("KEY", f"CAST(b.{build_key} AS VARCHAR)")
    p_bit = bit.replace("KEY", f"CAST(p.{probe_key} AS VARCHAR)")
    return f"""
WITH bbits AS (
  SELECT CAST(({b_bit}) // 64 AS INT) AS wi,
         (1::UBIGINT << CAST(({b_bit}) % 64 AS INT)) AS mask
  FROM ({keys_sql}) b, range(0, {k}) t(r)
),
words AS (SELECT wi, bit_or(mask) AS wv FROM bbits GROUP BY wi),
pbits AS (
  SELECT p.{probe_key},
         CAST(({p_bit}) // 64 AS INT) AS wi,
         (1::UBIGINT << CAST(({p_bit}) % 64 AS INT)) AS mask
  FROM ({probe_sql}) p, range(0, {k}) t(r)
)
SELECT pb.{probe_key},
       bool_and((COALESCE(w.wv, 0::UBIGINT) & pb.mask) <> 0) AS {hit_col}
FROM pbits pb LEFT JOIN words w ON pb.wi = w.wi
GROUP BY pb.{probe_key}
"""


# ---------------------------------------------------------------------------
# KMV / bottom-k theta sketch: distinct counts AND set intersections
# ---------------------------------------------------------------------------


def kmv_hash(key: Column) -> Column:
    """Deterministic uniform [0,1) with ~53 effective bits: the two
    md5-prefix u32s combined as ``(hi + lo/2^32) / 2^32``. Both terms
    are exact in IEEE double and the same two operations run in DuckDB,
    so the streams are bit-identical cross-engine (the u32-only stream
    used by operators/sampling.py starts colliding around 2^16 distinct
    keys, which a cardinality sketch can't tolerate)."""
    s = key.cast("string")
    hi = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("double")
    lo = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("double")
    return (hi + lo / F.lit(4294967296.0)) / F.lit(4294967296.0)


def kmv_hash_sql(key_expr: str) -> str:
    """DuckDB mirror of kmv_hash."""
    k = f"CAST({key_expr} AS VARCHAR)"
    hi = f"CAST(CAST(('0x' || substr(md5({k}),1,8)) AS UBIGINT) AS DOUBLE)"
    lo = f"CAST(CAST(('0x' || substr(md5({k}),9,8)) AS UBIGINT) AS DOUBLE)"
    return f"(({hi} + {lo} / 4294967296.0) / 4294967296.0)"


def kmv_sketch(
    df: DataFrame,
    key: Column,
    k: int = 256,
    group_cols: list[str] | None = None,
    theta: float | None = None,
) -> DataFrame:
    """The k-minimum-values (bottom-k / theta) sketch of Bar-Yossef et
    al. 2002, the DataSketches/Druid workhorse: per group, the ``k``
    smallest DISTINCT hash values of ``key`` as an ascending
    ``kmins: array<double>``. What HLL cannot do and this can: two
    sketches intersect (kmv_jaccard_cols), because the sketch IS a
    uniform sample of the distinct-key hash space below a threshold.

    Merge/rollup without rescanning data: union two kmins arrays and
    re-take the bottom k (kmv_merge_col) — associative and lossless,
    exactly like HLL's max-register merge.

    Scale path (100 TB): pass ``theta`` — hashes are uniform, so the
    k-th smallest of n distinct sits near k/n, and any theta
    comfortably above that (say 8k/n_rough from a cheap row-count
    bound) lets the filter fold into the SCAN: (1-theta) of the corpus
    is dropped before the aggregate, and every partial collect_set
    holds at most ~theta·n_distinct values instead of its whole
    partition's key set. theta=None keeps the exact-bottom-k semantics
    with unbounded partials — fine at gate scale, not at corpus scale.

    Reference analog: the reference counts distinct discovered URLs /
    domains by full SQLite ``COUNT(DISTINCT …)`` scans
    (backend/app/api/crawler.py statistics endpoints); this answers
    the same questions in k doubles per group, mergeable across
    segments."""
    groups = list(group_cols or [])
    h = kmv_hash(key)
    rows = df.select(*groups, h.alias("h"))
    if theta is not None:
        rows = rows.filter(F.col("h") < F.lit(float(theta)))
    return rows.groupBy(*groups).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("kmins")
    )


def kmv_merge_col(a: Column, b: Column, k: int) -> Column:
    """Union of two sketches: bottom k of the merged distinct values.
    array_union dedups, so merging a sketch with itself is identity."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def _kmv_est(kmins: Column, k: int) -> Column:
    """(k-1)/h_k when the sketch is full (the classic unbiased KMV
    estimator), else the sketch holds EVERY distinct hash and its size
    is the exact count."""
    return (
        F.when(
            F.size(kmins) < k, F.size(kmins).cast("double")
        ).otherwise(F.lit(float(k - 1)) / F.element_at(kmins, k))
    )


def kmv_estimate(
    sketch: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    est_col: str = "n_est",
) -> DataFrame:
    """Distinct-count estimate per group from a kmins table."""
    groups = list(group_cols or [])
    return sketch.select(
        *groups,
        F.round(_kmv_est(F.col("kmins"), k)).cast("long").alias(est_col),
        F.size("kmins").cast("int").alias("n_kept"),
    )


def kmv_jaccard_cols(a: Column, b: Column, k: int) -> dict[str, Column]:
    """Set-expression estimates from two same-k sketches: the union
    sketch's members below ITS threshold are a uniform sample of
    A ∪ B, so the fraction of them present in both input sketches
    estimates Jaccard, and |A∩B| ≈ J · |A∪B|. Returns columns
    ``union_est / inter_est / jaccard_est`` (Beyer et al. 2007)."""
    u = kmv_merge_col(a, b, k)
    matched = F.size(F.array_intersect(F.array_intersect(u, a), b))
    jac = matched.cast("double") / F.size(u).cast("double")
    union_est = _kmv_est(u, k)
    return {
        "union_est": F.round(union_est).cast("long"),
        "inter_est": F.round(jac * union_est).cast("long"),
        "jaccard_est": F.round(jac, 6),
    }


def kmv_sql(
    key_expr: str,
    table_sql: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    est_col: str = "n_est",
) -> str:
    """DuckDB mirror of kmv_sketch → kmv_estimate: same hash, same
    bottom-k (row_number over distinct hashes), same estimator."""
    groups = list(group_cols or [])
    gsel = "".join(g + ", " for g in groups)
    part = ("PARTITION BY " + ", ".join(groups)) if groups else ""
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    return f"""
WITH d AS (
  SELECT DISTINCT {gsel}{kmv_hash_sql(key_expr)} AS h FROM {table_sql}
), r AS (
  SELECT {gsel}h, row_number() OVER ({part} ORDER BY h) AS rn FROM d
)
SELECT {gsel}
       CAST(round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE {float(k - 1)!r} / max(CASE WHEN rn = {k} THEN h END)
                  END) AS BIGINT) AS {est_col},
       CAST(LEAST(count(*), {k}) AS INT) AS n_kept
FROM r {gby}
"""


def kmv_kmins_sql(key_expr: str, table_sql: str, k: int) -> str:
    """DuckDB: one row holding the ungrouped kmins list (for the
    set-expression mirror)."""
    return f"""
SELECT list(h ORDER BY h) AS kmins FROM (
  SELECT DISTINCT {kmv_hash_sql(key_expr)} AS h FROM {table_sql}
  ORDER BY h LIMIT {k}
)
"""
