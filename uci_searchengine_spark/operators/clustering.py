"""Distributed k-means (Lloyd's) over embedding columns + SemDeDup
(cluster-then-dedup, Abbas et al. 2023) — the clustering layer a
100 TB training-data curation pipeline needs.

``similarity.ivf_centroids`` trains its coarse quantizer on a bounded
driver-side sample — right for IVF (centroids are routing metadata),
wrong when the clustering itself is the product: semantic dedup,
corpus cartography, and per-cluster quality triage need every vector
assigned and every vector contributing to the update step. This
module is the full-corpus shape:

* assignment = broadcast the k centroids, score each vector against
  all k in one scan-side projection, keep the argmax by a map-combined
  ``max(struct(dot, -cid, qv))`` aggregate — no Window, no Python, one
  exchange keyed by vec id (and that exchange disappears entirely when
  the per-row argmax is computed inline; the aggregate form exists so
  the same code path works when a vector's features arrive in pieces).
* update = one ``groupBy(cell)`` aggregate producing component-wise
  SUMS and counts (map-side combined; k×dim output rows — tiny).
  Means are taken driver-side on the collected k×dim table, exactly
  like every production Lloyd implementation (the centroid table is
  metadata, the corpus is not).
* iteration = a driver loop of those two jobs. At 100 TB each pass is
  one scan + one tiny-output aggregate; centroids travel by broadcast.

Determinism / cross-engine exactness: vectors are quantized to int64
(``floor(x * scale)``) before any arithmetic, so dots and sums are
exact integer math — bit-identical in Spark and DuckDB, independent of
partitioning and row order. That is what makes the correctness gate
hashable (float dot products are exact too at these magnitudes —
|dot| < 2^53 — but integer quantization removes the question). Seeds
are the k lowest-xxhash64(id) vectors — a content-independent uniform
draw, stable across reruns (same trick as ``ivf_centroids``).

SemDeDup: assign → self-join WITHIN each cell (the cluster bounds the
candidate blowup — this is the published algorithm's entire point:
k ≈ n/1000 cells turn an O(n²) dedup into n × cell-size) → exact
cosine on the survivors → drop every vector with a smaller-id
duplicate above the threshold. ``cell_cap`` guards the degenerate
giant-cell case the same way ``dedup.lsh_candidate_pairs`` guards hot
LSH buckets.

Reference parity note: the reference has no clustering at all — its
dedup is the SQLite unique-url index (``backend/app/models/page.py``).
This module is part of the beyond-reference training-data suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEFAULT_SCALE = 1000


def quantize_vec(vec: Column, scale: int = DEFAULT_SCALE) -> Column:
    """float array → int64 array via ``floor(x * scale)``. Floor (not
    round) because floor of a double is unambiguous across engines;
    round-half rules differ in edge ulps."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def quantize_vec_sql(expr: str, scale: int = DEFAULT_SCALE) -> str:
    """DuckDB mirror of :func:`quantize_vec`."""
    return (
        f"list_transform({expr}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {float(scale)}) AS BIGINT))"
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors — pure JVM
    fold, deterministic regardless of evaluation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def int_dot_lit(a: Column, coeffs: "list[int]") -> Column:
    """Exact int64 dot against a LITERAL centroid vector — the same
    zip_with/aggregate fold as :func:`int_dot` (measured faster than a
    flat unrolled a[0]*c0 + ... chain, which falls out of codegen into
    per-node interpreted eval)."""
    return int_dot(a, F.array(*[F.lit(int(c)).cast("long") for c in coeffs]))


INLINE_K_MAX = 64  # small-k inline-argmax cutoff (expression-size bound)


def kmeans_assign(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    inline: "bool | str" = "auto",
) -> DataFrame:
    """One Lloyd assignment pass: ``emb`` (id, quantized vector) ×
    ``cents`` (cid, cv) → (id, cell, qv). Ties break to the smallest
    centroid id.

    Two physically different, value-identical paths:

    * ``inline`` (default "auto": when k ≤ ``INLINE_K_MAX``): the k
      centroids are collected (k×dim int64s — metadata) and the argmax
      becomes one scan-side projection — k literal-dot scores in an
      ARRAY, cell = array_position(array_max) (first-occurrence =
      smallest cid, the same tie rule as the max-struct) — ZERO
      exchange: the k-fold row blowup, the qv-carrying shuffle and the
      max-struct aggregate all disappear.
    * broadcast path (``inline=False``, or k above the cutoff): the
      previous shape — broadcast cross join + map-combined max-struct
      aggregate. At k = 10^5, dim = 1024 the centroid relation is
      still < 1 GB broadcast, which is why Lloyd scales where
      all-pairs methods do not; a literal expression does not reach
      that regime, hence the cutoff."""
    # true Lloyd: argmin ||x - c||² = argmax (2·x·c − |c|²) since |x|²
    # is constant per row — exact int64 throughout (no sqrt, no floats)
    if inline == "auto" or inline is True:
        probe = (
            cents.collect()
            if inline is True
            else cents.limit(INLINE_K_MAX + 1).collect()
        )
        if probe and (inline is True or len(probe) <= INLINE_K_MAX):
            rows = sorted(
                (int(r["cid"]), [int(x) for x in r["cv"]]) for r in probe
            )
            scores = F.array(
                *[
                    F.lit(2) * int_dot_lit(F.col(qvec_col), cv)
                    - F.lit(int(sum(c * c for c in cv)))
                    for _cid, cv in rows
                ]
            )
            cid_arr = F.array(*[F.lit(int(cid)) for cid, _cv in rows])
            return emb.select(
                F.col(id_col),
                F.element_at(
                    cid_arr, F.array_position(scores, F.array_max(scores)).cast("int")
                )
                .cast("long")
                .alias("cell"),
                F.col(qvec_col),
            )
    scored = emb.join(F.broadcast(cents), how="cross").withColumn(
        "_score",
        F.lit(2) * int_dot(F.col(qvec_col), F.col("cv"))
        - int_dot(F.col("cv"), F.col("cv")),
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("_score").alias("d"),
                (-F.col("cid")).alias("nc"),
                F.col(qvec_col).alias("q"),
            )
        ).alias("b")
    )
    return best.select(
        F.col(id_col),
        (-F.col("b.nc")).cast("long").alias("cell"),
        F.col("b.q").alias(qvec_col),
    )


def kmeans_update(
    assigned: DataFrame, dim: int, qvec_col: str = "qv"
) -> DataFrame:
    """The update-step aggregate: per cell, the member count and the
    EXACT component-wise int64 sums. One map-combined exchange; output
    is k rows × (dim + 2) columns. Means are the caller's division —
    kept out of SQL so no engine's integer-division semantics are in
    the hash path."""
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for i in range(dim):
        aggs.append(F.sum(F.col(qvec_col)[i]).alias(f"s{i}"))
    return assigned.groupBy("cell").agg(*aggs)


def seed_centroids(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
) -> DataFrame:
    """Deterministic seeds: the k lowest-xxhash64(id) vectors — a
    content-independent uniform draw, stable across reruns and
    partitionings (per-partition heap + tiny merge, never a full
    sort)."""
    rows = (
        emb.select(F.col(id_col).alias("cid"), F.col(qvec_col).alias("cv"))
        .orderBy(F.xxhash64(F.col("cid")), F.col("cid"))
        .limit(k)
    )
    return rows.select(
        (F.row_number().over(_seed_window()) - 1).cast("long").alias("cid"),
        "cv",
    )


def _seed_window():
    from pyspark.sql import Window

    # k rows total — the single-partition window is O(k), driver-tiny
    return Window.orderBy("cid")


def kmeans_fit(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
) -> tuple[DataFrame, list[list[int]]]:
    """Full-corpus Lloyd: seed → (assign → update → collect k×dim sums
    → integer means) × iters. Returns (final assignment DataFrame,
    final centroid list). Each iteration is one scan + one tiny
    aggregate; the only driver-side data is the k×(dim+2) sums table.
    Empty cells keep their previous centroid (standard Lloyd fix)."""
    cents_rows = [
        (int(r["cid"]), list(r["cv"]))
        for r in seed_centroids(emb, k, id_col, qvec_col).collect()
    ]
    cents = {cid: cv for cid, cv in cents_rows}
    assigned = None
    for _ in range(iters):
        cdf = spark.createDataFrame(
            sorted(cents.items()), "cid: long, cv: array<long>"
        )
        assigned = kmeans_assign(emb, cdf, id_col, qvec_col)
        sums = kmeans_update(assigned, dim, qvec_col).collect()
        for r in sums:
            cnt = r["cnt"]
            if cnt:
                cents[int(r["cell"])] = [
                    int(r[f"s{i}"]) // cnt for i in range(dim)
                ]
    return assigned, [cents[c] for c in sorted(cents)]


def semdedup_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    cell_cap: int | None = None,
) -> DataFrame:
    """Within-cluster duplicate pairs (ia < ib, cosine ≥ threshold).
    The self-join key is the CELL — candidate count is Σ cell², bounded
    by the clustering instead of n² (SemDeDup's core trick). Cosine is
    computed in double from the quantized vectors; both engines fold
    the same integer products, so rounding to 6 dp is stable.
    ``cell_cap`` (optional) drops cells larger than the cap from pair
    generation — the hot-cell star guard for adversarial corpora.

    Per-vector norms are computed ONCE in the pre-join projection (the
    self-join fans every vector out to its cell size, so a per-pair
    norm fold would triple the dominant per-pair work — the
    reciprocal_knn precedent); sqrt of the same exact integer dot →
    identical doubles."""
    idot = int_dot
    a = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("ia"),
        F.col(qvec_col).alias("va"),
    ).withColumn("na", F.sqrt(idot(F.col("va"), F.col("va")).cast("double")))
    b = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("ib"),
        F.col(qvec_col).alias("vb"),
    ).withColumn("nb", F.sqrt(idot(F.col("vb"), F.col("vb")).cast("double")))
    if cell_cap is not None:
        sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
        keep = sizes.filter(F.col("_n") <= cell_cap).select("cell")
        a = a.join(F.broadcast(keep), "cell", "left_semi")
        b = b.join(F.broadcast(keep), "cell", "left_semi")
    dot = idot(F.col("va"), F.col("vb")).cast("double")
    return (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("cos", F.round(dot / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("cell", "ia", "ib", "cos")
    )


def semdedup_drop(pairs: DataFrame) -> DataFrame:
    """The drop list: every vector with a smaller-id duplicate in its
    cell (keep-min-id representative). One distinct projection."""
    return pairs.select(F.col("ib").alias("vec_id")).distinct()
