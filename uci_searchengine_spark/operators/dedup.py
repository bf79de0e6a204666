"""Deduplication operators for web-scale training-data pipelines.

Five flavors, each expressed Spark-first:

* exact        — hash-groupBy on a normalized content fingerprint.
* MinHash+LSH  — shingle → minhash signatures → band buckets → bucket join.
* SimHash      — 64-bit simhash + Hamming-ball banding.
* n-gram Jaccard — exact Jaccard over shingle sets via explode + self-join
                 (the verifier for the approximate methods).
* embedding cosine — near-dup by cosine over an embedding column.

Scale notes: every method avoids the O(n²) cross join — candidate pairs
come from equi-joins on bucket keys (LSH bands / simhash bands / shared
shingles), which Catalyst executes as shuffle hash joins on the bucket key.
MinHash permutations use the universal-hash family (a*x+b) mod p over
md5-derived shingle ids, so signatures are deterministic and portable
across engines (the DuckDB oracle can reproduce them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.textstats import fingerprint_md5

# universal-hash parameters for minhash permutations (deterministic).
# p = 2^31-1 (Mersenne) keeps a*x+b < 2^62 — pure BIGINT arithmetic that
# both Spark longs and the DuckDB oracle evaluate identically, no overflow.
MERSENNE_P = (1 << 31) - 1


def minhash_params(n_perm: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via an LCG scramble of the seed."""
    params = []
    x = seed & 0xFFFFFFFFFFFFFFFF
    for _ in range(n_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        a = (x % (MERSENNE_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        b = x % MERSENNE_P
        params.append((a, b))
    return params


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle_id long) — distinct word n-gram ids per doc.

    Shingle id = first 8 hex chars of md5 of the space-joined n-gram
    (32-bit; portable — Spark conv(md5) == DuckDB hex-cast of the same
    md5). Tokens are the whitespace split of lowercased text — JVM-side.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .select(
            "id",
            F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
            .cast("long")
            .alias("shingle_id"),
        )
        .distinct()
    )


def shingle_ids_col(text_col: str, n: int = 3):
    """In-row `array<long>` of md5-derived shingle ids for one doc —
    the same ids as `shingles()` but WITHOUT the explode/distinct
    shuffle (duplicates retained; min-based consumers are unaffected)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
    )


def minhash_signatures_inrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 32,
    seed: int = 7,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<long>) minhash signatures as a PURE PROJECTION.

    min((a·x+b) mod p) over the doc's own shingle array — the signature
    never leaves the row, so the whole stage is shuffle-free and fuses
    into the scan (vs `shingles()` → `minhash_signatures()`, which
    shuffles every (id, shingle) pair to group them back together).
    Identical values: min over the multiset equals min over the
    distinct set (pytest-pinned against `minhash_signatures`). This
    removes the largest exchange of the MinHash pipeline; only the
    band-bucket join shuffles — the right trade when the signature
    shuffle is network-bound (wide clusters, big corpora). On a single
    node it measures ~1.6× SLOWER than the explode+groupBy path (the
    32-permutation lambda chain evaluates outside whole-stage codegen,
    while the shuffle it avoids runs at RAM speed), so the default
    pipeline and the gate keep the aggregate formulation.

    The shingle-id array is materialized in its OWN projection and the
    32 permutation mins reference that column: inlining the md5-based
    id expression into every permutation (one flat select) makes
    Catalyst evaluate md5 per gram 32× — measured 60× slower. With 32
    references to a non-cheap alias, CollapseProject keeps the
    projection barrier and md5 runs once per gram."""
    params = minhash_params(n_perm, seed)
    with_ids = df.select(
        F.col(id_col).alias("id"), shingle_ids_col(text_col, n).alias("_ids")
    )
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_ids"),
                    lambda x: ((x % MERSENNE_P) * F.lit(a) + F.lit(b)) % MERSENNE_P,
                )
            )
            for a, b in params
        ]
    )
    return with_ids.select("id", sig.alias("sig"))


def minhash_signatures(
    sh: DataFrame, n_perm: int = 32, seed: int = 7
) -> DataFrame:
    """(id, sig array<long>) minhash signature per doc.

    min over ((a*x+b) mod p) per permutation — expressed as one groupBy
    with n_perm min() aggregates (single shuffle, map-side partial agg).
    """
    params = minhash_params(n_perm, seed)
    aggs = [
        F.min(
            ((F.col("shingle_id") % MERSENNE_P) * F.lit(a) + F.lit(b)) % MERSENNE_P
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = sh.groupBy("id").agg(*aggs)
    return sigs.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(n_perm)]).alias("sig")
    )


def band_rows(
    sigs: DataFrame, n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bh) LSH band keys from a signature relation —
    md5 of the comma-joined slice (engine-portable). Shared by the
    self-join (lsh_candidate_pairs) and the cross-relation incremental
    path; at production scale this IS the relation an ingest pipeline
    persists per batch so later batches never recompute the corpus
    side."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    n_bands: int = 8,
    rows_per_band: int = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """(id_a, id_b) candidate pairs: equal signature slice in ≥1 band.

    Self-equi-join on (band, band_key) — never a cross join. id_a < id_b.
    Band key = md5 of the comma-joined signature slice (portable across
    engines, unlike xxhash64).

    ``bucket_cap`` is the hot-bucket skew guard for corpus scale: an
    m-member bucket emits m(m-1)/2 pairs, and the common web failure
    mode — a boilerplate cluster of thousands of near-identical pages —
    lands them all in ONE bucket, making that join task quadratic.
    Buckets larger than ``bucket_cap`` switch to STAR emission: every
    member pairs with the bucket's min-id representative only (m-1
    pairs). For the dedup pipeline's consumer (connected components →
    canonical per cluster) this is LOSSLESS — a star spans exactly the
    same vertex set as the clique, so the components (and therefore the
    keep/drop decisions) are identical to all-pairs mode. What it does
    cost: the pair LIST within a hot bucket is no longer all-pairs, so
    a pipeline that pairwise-verifies candidates (e.g. exact-Jaccard
    confirmation) only verifies the star edges there — members similar
    to each other but not to the representative can drop out of the
    verified set (they remain CC-connected through the rep if the rep
    matches either). ``None`` (default) = exact all-pairs, the
    small-corpus / gate-verification mode.
    """
    assert n_bands * rows_per_band <= 256
    bands = band_rows(sigs, n_bands, rows_per_band)
    if bucket_cap is None:
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    # one extra groupBy on the SAME (band, bh) keys classifies buckets;
    # both joins below are equi-joins co-partitioned with it (no new
    # shuffle key anywhere)
    counts = bands.groupBy("band", "bh").agg(
        F.count("*").alias("_m"), F.min("id").alias("_rep")
    )
    tagged = bands.join(counts, ["band", "bh"])
    small = tagged.filter(F.col("_m") <= bucket_cap)
    a = small.alias("a")
    b = small.alias("b")
    pairs_small = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    pairs_hot = (
        tagged.filter((F.col("_m") > bucket_cap) & (F.col("id") != F.col("_rep")))
        .select(
            F.least("_rep", "id").alias("id_a"),
            F.greatest("_rep", "id").alias("id_b"),
        )
    )
    return pairs_small.unionByName(pairs_hot).distinct()


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: keep min-id representative per normalized-content hash.
    Returns (id, keep boolean, group_size)."""
    fp = df.select(F.col(id_col).alias("id"), fingerprint_md5(F.col(text_col)).alias("fp"))
    grp = fp.groupBy("fp").agg(
        F.min("id").alias("rep_id"), F.count("*").alias("group_size")
    )
    return (
        fp.join(grp, "fp")
        .select(
            "id",
            (F.col("id") == F.col("rep_id")).alias("keep"),
            "group_size",
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold pairs (id_a < id_b, jaccard).

    Candidate generation via shared-shingle equi-join (docs sharing zero
    shingles can't pass any threshold > 0), then |∩|/|∪|. The
    shared-shingle join is the classic inverted-index join: explode →
    self-join on shingle_id → count.

    ``df_cap`` is the skew guard: shingles appearing in more than
    ``df_cap`` docs are dropped BEFORE the self-join — a shingle shared by
    k docs contributes k² join rows, so one boilerplate shingle at corpus
    scale otherwise explodes the join. Doc sizes stay computed on the
    UNCAPPED shingle sets, so the reported Jaccard is exact when no shared
    shingle of the pair was pruned and a conservative lower bound
    otherwise (intersection undercounted, union exact) — pairs never
    appear with an inflated score. With ``df_cap=None`` the result is
    exact Jaccard (small-corpus / verification mode).
    """
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle_id")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > df_cap)
            .select("shingle_id")
        )
        # broadcast anti-join: the hot set is tiny by construction
        # (shingle df follows a zipf head — few shingles exceed any
        # reasonable cap even at 10^12 docs)
        joinable = sh.join(F.broadcast(hot), "shingle_id", "left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, "shingle_id")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    method: str = "minlabel",
    stats: dict | None = None,
) -> DataFrame:
    """Near-dup pairs → duplicate CLUSTERS: (id, comp) where comp is the
    minimum member id of the node's connected component — the
    keep-one-per-cluster step every dedup pipeline runs after pair
    generation (the pairwise ops above only PROPOSE edges).

    Two interchangeable engines (identical output, tests assert it):

    * ``method="minlabel"`` (default): each round every node adopts the
      smallest label among itself and its neighbors; O(diameter) rounds,
      one shuffle each. Dup clusters are shallow (near-dups of a common
      source), so this exits after 2-4 rounds on real data.
    * ``method="star"``: alternating large-star/small-star rounds
      (Kiveris et al., "Connected Components in MapReduce and Beyond") —
      O(log n) rounds regardless of diameter; the scale-safe choice when
      adversarially long chains are possible (e.g. template-drift chains
      where A≈B≈C≈… without A≈C).

    ``stats``: pass a dict to receive {"rounds": n} (round-count
    assertions / telemetry).
    """
    if method == "star":
        return _connected_components_star(pairs, id_a, id_b, max_iter, stats)
    if method != "minlabel":
        raise ValueError(f"method must be 'minlabel' or 'star', got {method!r}")
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().cache()
    # localCheckpoint each round: iterative DataFrames otherwise nest the
    # whole previous plan per iteration and the LOGICAL plan grows
    # exponentially (driver OOMs stringifying it long before any data
    # size matters). On a production cluster prefer a reliable
    # checkpoint dir (spark.sparkContext.setCheckpointDir + .checkpoint)
    # so executor loss stays recoverable.
    labels = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        prop = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(prop, labels["id"] == prop["a"], "left")
            .select(
                labels["id"],
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    edges.unpersist()
    return labels


def _connected_components_star(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int,
    stats: dict | None = None,
) -> DataFrame:
    """Large-star/small-star rounds (Kiveris et al. 2014): O(log n)
    rounds on any graph shape.

    Per round, two grouped passes over the edge list:

    * LARGE-STAR: per node u with neighborhood Γ(u), m = min(Γ(u) ∪ {u});
      re-point every STRICTLY LARGER neighbor at m — emit (v, m) for
      v ∈ Γ(u), v > u. Halves long chains' height.
    * SMALL-STAR: per node u, re-point u and every ≤-neighbor at m —
      emit (v, m) for v ∈ Γ(u) ∪ {u}, v ≤ u. Flattens local stars.

    Each pass is one shuffle (groupBy u + min + re-join); edges stay
    bounded (≤ input edges after dedup). Converged when the edge multiset
    stops changing (count + order-insensitive xxhash signature — one tiny
    agg per round). Final state: every node points at its component min.
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(e):  # both directions: neighborhoods
        return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))

    def _sig(e) -> tuple[int, int]:
        # bit_xor: order-insensitive, overflow-free (edges are distinct,
        # so XOR cancellation can't collide two different sets cheaply)
        r = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(r["n"]), int(r["h"])

    def _star(e, keep_cond):
        """One star pass: for each u, m = min(Γ(u) ∪ {u}); emit (v, m)
        for neighbors v satisfying keep_cond(v, u)."""
        nbrs = _sym(e)
        mins = nbrs.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        out = (
            nbrs.filter(keep_cond(F.col("b"), F.col("a")))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        return out

    sig = _sig(edges)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        large = _star(edges, lambda v, u: v > u)
        # small-star over the large-star output (the paper's alternation)
        e2 = large.localCheckpoint(eager=True)
        nbrs = _sym(e2)
        mins = nbrs.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        small = (
            nbrs.filter(F.col("b") <= F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(mins.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        edges = small.localCheckpoint(eager=True)
        new_sig = _sig(edges)
        if new_sig == sig:
            break
        sig = new_sig
    if stats is not None:
        stats["rounds"] = rounds
    # converged: edges point nodes at their component min; roots (the
    # mins themselves) label themselves
    labels = (
        all_nodes.join(edges, all_nodes["id"] == edges["a"], "left")
        .groupBy("id")
        .agg(F.coalesce(F.min("b"), F.min("id")).alias("comp"))
    )
    return labels


N_SIMHASH_BITS = 60


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash long): 60-bit SimHash over whitespace tokens.

    Bit-majority over token hashes, fully JVM-side: explode tokens →
    60-bit md5-derived hash (portable: DuckDB reproduces it) → per-bit ±1
    contributions via bitwise ops → groupBy sum → reassemble. One shuffle
    (the groupBy), map-side combined. 60 bits so the value stays a
    positive BIGINT in every engine.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
    )
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(N_SIMHASH_BITS)
    ]
    bits = toks.groupBy("id").agg(*aggs)
    expr = F.lit(0).cast("long")
    for i in range(N_SIMHASH_BITS):
        expr = expr + F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bits.select("id", expr.alias("simhash"))


def simhash_near_pairs(sh_df: DataFrame, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs: equal 15-bit simhash band in ≥1 of 4 bands
    (guarantees recall for Hamming distance ≤ 3). Returns pairs + hamming."""
    width = N_SIMHASH_BITS // bands
    banded = sh_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs


def derive_srp_planes(n_rows: int, target_bucket_rows: int = 1024) -> int:
    """Plane count so the EXPECTED bucket population stays ~target:
    2^planes buckets must grow with n or the within-bucket self-join
    degrades toward all-pairs (at 10^9 vectors, 8 fixed planes leave ~4M
    vectors per bucket → O(n²/256)). Clamped to [8, 30]."""
    import math

    if n_rows <= target_bucket_rows:
        return 8
    return max(8, min(30, math.ceil(math.log2(n_rows / target_bucket_rows)) + 8))


def embedding_near_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int | None = None,
    n_tables: int = 1,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Near-dup pairs by cosine ≥ threshold over an embedding column.

    Candidates via sign-random-projection LSH buckets (deterministic
    pseudo-random hyperplanes), exact cosine on candidates. At 100 TB this
    is the standard two-stage ANN-dedup shape; brute force is O(n²) and
    exists only in similarity.ann_bruteforce.

    Scale knobs:
    * ``n_planes`` — bucket count = 2^n_planes. Defaults to
      ``derive_srp_planes(emb.count())`` so buckets GROW with the corpus
      and the within-bucket join stays near-linear.
    * ``n_tables`` — band-OR over independent plane tables (seeds
      seed..seed+n_tables-1): a pair is a candidate if it collides in ANY
      table. More tables buy recall (near-dups split by one table's
      hyperplane collide in another) at proportional candidate cost.
    """
    from uci_searchengine_spark.operators.similarity import cosine_expr, srp_bucket

    if n_planes is None:
        n_planes = derive_srp_planes(emb.count())
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    buckets = base.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        srp_bucket(F.col("vec"), n_planes, dim, seed + t).alias("bkt"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "vec", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))
    x, y = buckets.alias("x"), buckets.alias("y")
    return (
        x.join(y, (F.col("x.tbl") == F.col("y.tbl")) & (F.col("x.bkt") == F.col("y.bkt")))
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            cosine_expr(F.col("x.vec"), F.col("y.vec")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 4,
) -> DataFrame:
    """(id, n_shared) — training docs sharing ≥1 word n-gram with an
    eval/benchmark set, with the count of distinct shared shingles.

    The standard pre-training decontamination pass (GPT-3 appendix C
    shape: drop training docs that overlap the eval suite). Candidates
    via the same md5 shingle ids as the dedup family; the eval side of a
    100 TB run is benchmark-sized (10³–10⁶ docs), so its distinct
    shingle set is broadcast and the scan stays one-pass with no
    shuffle on the training side — the aggregation shuffles only the
    contaminated subset's (id, shingle) pairs.
    """
    tr = shingles(df, id_col, text_col, n)
    ev = shingles(eval_df, id_col, text_col, n).select("shingle_id").distinct()
    return (
        tr.join(F.broadcast(ev), "shingle_id")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN detection — the substring-level dedup of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (suffix-array dedup), re-expressed as the Spark-practical
    n-token-window equivalent: an n-token span is DUPLICATED when its
    exact text occurs ≥ ``min_count`` times corpus-wide (within-doc
    repeats count — boilerplate repeats inside one page are the common
    web case). Returns per-doc
    ``(id, total_tokens, dup_tokens, dup_frac)`` for docs holding at
    least one duplicated span, where dup_tokens is the UNION length of
    the doc's duplicated windows.

    Dataflow (every step relational, no all-pairs anything):

    1. positional n-gram hashes per doc — in-row JVM transform, md5-
       derived 32-bit ids (portable: the DuckDB oracle reproduces them);
    2. one explode to (hash) granularity → global occurrence counts —
       the ONLY heavy shuffle, same shape as minhash shingling; the
       shuffled row is (8-byte hash, id, int start);
    3. duplicated hashes join back (shuffle hash join on the hash);
    4. per-doc span-union via sorted starts and the exact identity
       ``union = n + Σ min(n, s_i − s_{i−1})`` — one JVM aggregate
       fold, no python.

    At 100 TB step 2's count can swap to a count-min sketch /
    frequent-hash broadcast for the >=2 filter; the exact groupBy is
    the pinned-correct default. Docs shorter than ``n`` tokens hold no
    span and never match."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("t"),
    ).select("id", "t", F.size("t").alias("total_tokens"))
    grams = F.when(
        F.size("t") < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
        )
    )
    pos = (
        base.select(
            "id",
            "total_tokens",
            F.posexplode(grams).alias("start", "gram"),
        )
        .select(
            "id",
            "total_tokens",
            "start",
            F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    dup_h = (
        pos.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("h")
    )
    starts = (
        pos.join(dup_h, "h")
        .groupBy("id", "total_tokens")
        .agg(F.array_sort(F.collect_set("start")).alias("ss"))
    )
    # union length of [s, s+n) windows over sorted distinct starts:
    # n for the first + min(n, gap) for each later start
    gaps = F.aggregate(
        F.sequence(F.lit(1), F.size("ss") - 1),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.least(
            F.lit(n).cast("long"),
            (
                F.get(F.col("ss"), i.cast("int"))
                - F.get(F.col("ss"), (i - 1).cast("int"))
            ).cast("long"),
        ),
    )
    dup_tokens = F.when(F.size("ss") == 0, F.lit(0).cast("long")).otherwise(
        F.lit(n).cast("long")
        + F.when(F.size("ss") > 1, gaps).otherwise(F.lit(0).cast("long"))
    )
    return starts.select(
        "id",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        dup_tokens.alias("dup_tokens"),
        F.round(
            dup_tokens.cast("double") / F.col("total_tokens"), 6
        ).alias("dup_frac"),
    )


def paragraph_dedup(
    docs: DataFrame,
    paragraphs,
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's paragraph-level dedup: hash every paragraph, keep only
    the FIRST occurrence corpus-wide (min (doc_id, position) per hash —
    later repeats are dropped even inside the same doc), and rebuild
    each doc's text from its surviving paragraphs in original order.

    ``paragraphs`` is a Column producing ``array<string>`` — the split
    rule is the caller's (CCNet splits on newlines; a corpus without
    newline structure can chunk its token stream). Empty paragraphs are
    ignored. Docs whose every paragraph was dropped disappear from the
    output (they carry no surviving text).

    Scale shape: one posexplode + one (hash) min-aggregate + one
    equi-join back on (hash, doc, pos) + one per-doc re-aggregate — two
    content-sized shuffles, no window sort inside a hash group (a
    boilerplate paragraph repeated millions of times becomes ONE
    min-aggregate row, not a million-row sort partition; the same skew
    reasoning as the LSH bucket cap).
    """
    paras = (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(paragraphs).alias("pos", "para"),
        )
        .filter(F.col("para") != "")
        .withColumn("h", F.md5("para"))
    )
    # (id, pos) uniquely addresses a paragraph, so the winner set joins
    # back as a plain left-semi on those two keys — no self-join lineage
    # ambiguity on h, and the semi join dedupes for free.
    winners = (
        paras.groupBy("h")
        .agg(F.min(F.struct("id", "pos")).alias("w"))
        .select(F.col("w.id").alias("id"), F.col("w.pos").alias("pos"))
    )
    kept = paras.join(winners, ["id", "pos"], "left_semi").select(
        "id", "pos", "para"
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "para"))),
        lambda x: x["para"],
    )
    return kept.groupBy("id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(" ", ordered).alias("text_dedup"),
    ).select(F.col("id").alias(id_col), "n_kept", "text_dedup")


def token_chunks_col(tokens, width: int):
    """``array<string>`` of space-joined ``width``-token chunks of a
    token-array column — the deterministic paragraph rule for corpora
    without newline structure (gate + oracle share it). DuckDB mirror:
    list_transform(range(0, ceil(len(t)/w)), i ->
    array_to_string(t[i*w+1 : i*w+w], ' '))."""
    n_chunks = F.ceil(F.size(tokens) / F.lit(width)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(tokens, i * width + 1, width)),
    )
    # sequence(0, -1) DESCENDS in Spark — empty docs must yield [] not
    # a bogus negative-index chunk
    return F.when(n_chunks > 0, chunks).otherwise(
        F.array().cast("array<string>")
    )


def incremental_dedup(
    new_docs: DataFrame,
    store_docs: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = 32,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Batch-vs-corpus dedup — the PRODUCTION shape: dedup runs per
    ingest batch against everything already accepted, not corpus-wide
    per run. Verdict per NEW doc: ``exact_dup`` (md5(text) already in
    the store), else ``near_dup`` (shares ≥1 LSH band bucket with a
    store doc — same bands/permutations as lsh_candidate_pairs), else
    ``keep``. Returns (id, verdict).

    Scale shape: both checks are left-semi joins of the (small) batch
    against store-side relations — md5 fingerprints and (band, bh)
    keys — that an ingest pipeline PERSISTS (band_rows above is
    exactly that relation), so the corpus side is a pre-bucketed scan,
    never recomputed; here both sides derive from docs so the gate is
    self-contained. No pair materialization at all: the batch never
    joins store×store."""
    fp_new = new_docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("fp")
    )
    fp_store = store_docs.select(F.md5(F.col(text_col)).alias("fp")).distinct()
    exact_ids = fp_new.join(fp_store, "fp", "left_semi").select("id")
    sig_new = minhash_signatures(
        shingles(new_docs, id_col, text_col, shingle_n), n_perm
    )
    sig_store = minhash_signatures(
        shingles(store_docs, id_col, text_col, shingle_n), n_perm
    )
    near_ids = (
        band_rows(sig_new, n_bands, rows_per_band)
        .join(
            band_rows(sig_store, n_bands, rows_per_band).select("band", "bh"),
            ["band", "bh"],
            "left_semi",
        )
        .select("id")
        .distinct()
    )
    ex = exact_ids.withColumn("_e", F.lit(1))
    nr = near_ids.withColumn("_n", F.lit(1))
    return (
        new_docs.select(F.col(id_col).alias("id"))
        .join(ex, "id", "left")
        .join(nr, "id", "left")
        .select(
            "id",
            F.when(F.col("_e") == 1, F.lit("exact_dup"))
            .when(F.col("_n") == 1, F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )


def cdc_chunks_col(tokens, mask: int = 16):
    """``array<string>`` of CONTENT-DEFINED chunks of a token-array
    column — the dedup-friendly paragraph rule: a chunk boundary falls
    AFTER any token whose 32-bit md5-prefix id ≡ 0 (mod ``mask``), so
    expected chunk length is ``mask`` tokens but boundaries move with
    content, not position. Why it matters vs ``token_chunks_col``: an
    insertion early in a doc shifts every later fixed-width frame (all
    downstream chunk hashes change — chunk dedup finds nothing), while
    CDC boundaries re-synchronize right after the edit and only the
    containing chunk's hash changes (the rsync/LBFS property).
    In-row ``F.aggregate`` fold (a runtime HOF, not an unrolled
    expression tree) — no window, no shuffle; oracle mirror uses an
    ordinality cumsum (see the gate)."""

    def is_b(t):
        return (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % mask
            == 0
        )

    acc0 = F.struct(
        F.array().cast("array<string>").alias("chunks"),
        F.array().cast("array<string>").alias("cur"),
    )

    def step(acc, t):
        cur2 = F.concat(acc["cur"], F.array(t))
        return F.when(
            is_b(t),
            F.struct(
                F.concat(
                    acc["chunks"], F.array(F.concat_ws(" ", cur2))
                ).alias("chunks"),
                F.array().cast("array<string>").alias("cur"),
            ),
        ).otherwise(
            F.struct(acc["chunks"].alias("chunks"), cur2.alias("cur"))
        )

    def finish(acc):
        return F.when(
            F.size(acc["cur"]) > 0,
            F.concat(acc["chunks"], F.array(F.concat_ws(" ", acc["cur"]))),
        ).otherwise(acc["chunks"])

    return F.aggregate(tokens, acc0, step, finish)


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment(A in B) = |A∩B| / |A| ≥
    threshold — catches excerpts and quotations (a small doc wholly
    contained in a large one scores ~1.0 here but a tiny Jaccard, so
    ``ngram_jaccard_pairs`` misses it; containment is the standard
    quote/boilerplate-inclusion detector for training corpora).
    Directed pairs (id_small, id_big, containment): the CONTAINED
    doc's shingles are the denominator.

    Same inverted-index equi-join and ``df_cap`` skew guard as the
    Jaccard variant (capped mode: intersection undercounted, never
    inflated)."""
    sh = shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = sh
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle_id")
            .agg(F.count("*").alias("sdf"))
            .filter(F.col("sdf") > df_cap)
            .select("shingle_id")
        )
        joinable = sh.join(F.broadcast(hot), "shingle_id", "left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, "shingle_id")
        .filter(F.col("a.id") != F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_small"), F.col("b.id").alias("id_big"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.withColumnRenamed("id", "id_small").withColumnRenamed(
                "sz", "sz_small"
            ),
            "id_small",
        )
        .withColumn(
            "containment", F.col("inter") / F.col("sz_small")
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_small", "id_big", F.round("containment", 6).alias("containment")
        )
    )


# ---------------------------------------------------------- winnowing
# Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
# Document Fingerprinting" (SIGMOD 2003) — the MOSS fingerprint
# selector. Over the sequence of k-gram hashes, slide a window of w
# consecutive hashes and select each window's MINIMUM (rightmost
# occurrence on ties — the paper's density-reducing rule). Guarantees:
# (1) any shared substring of >= w + k - 1 tokens yields at least one
# shared selected hash in both docs, and (2) expected density of
# selected positions is 2/(w+1) — a principled, position-robust
# down-sampling of the gram stream that a plain "keep every j-th gram"
# scheme cannot match (it breaks under single-token insertions).
# Reference-shape: the span-dedup family's candidate generator
# (duplicate_span_stats finds spans exactly; winnowing is the sublinear
# fingerprint index MOSS builds for the same question at corpus scale).
# Everything below the pair join is IN-ROW (zero shuffle): grams,
# hashes, window minima, selected positions are JVM HOF expressions
# over the token array.


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """(id, n_grams, n_fp, fps array<long>) — winnowing-selected
    fingerprints per doc. ``n_fp`` counts DISTINCT SELECTED POSITIONS
    (the paper's density measure, rightmost-min rule); ``fps`` is the
    distinct selected hash set (== distinct window minima — the
    tie-break changes which position is recorded, never which value).
    Docs with fewer than w grams winnow a single window of all their
    grams, so every doc with >= 1 gram keeps >= 1 fingerprint.

    The hash array is bound as a LAMBDA VARIABLE (the whole selection
    runs inside transform(array(h), hh -> ...)) so the md5/gram chain
    is evaluated exactly once per row NO MATTER what the optimizer does
    to projections. A plain aliased-column barrier (the
    minhash_signatures_inrow CollapseProject trick) is NOT enough here:
    downstream column pruning (winnowing_pairs keeps only `fps`)
    collapses the projections and inlines the hash expression into the
    per-window filter lambdas — interpreted HOF eval then recomputes
    every gram hash once PER WINDOW PROBE, O(m^2) tokenize+md5 per doc
    (observed as a multi-minute stall at sf0.1 in bench suite_v2,
    jstack showing StringSplit under ArrayFilter). Lambda-bound
    variables are evaluated once by construction and can never be
    inlined into."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")

    def winnow(hh):
        m = F.size(hh)
        we = F.least(F.lit(w), m)  # short docs: one window over all

        # rightmost argmin of each window [i, i+we) (0-based)
        def sel_pos(i):
            mn = F.array_min(F.slice(hh, i + 1, we))
            return F.array_max(
                F.filter(
                    F.sequence(i, i + we - 1),
                    lambda j: F.get(hh, j) == mn,
                )
            )

        sel = F.when(
            m > 0,
            F.array_distinct(
                F.transform(F.sequence(F.lit(0), m - we), sel_pos)
            ),
        ).otherwise(F.array().cast("array<int>"))
        return F.struct(
            m.cast("long").alias("n_grams"),
            F.size(sel).cast("long").alias("n_fp"),
            F.array_distinct(
                F.transform(sel, lambda p: F.get(hh, p))
            ).alias("fps"),
        )

    # inline() is a generator: the 1-element struct array is evaluated
    # exactly once per row and explodes into the three output columns
    # (three field projections of a shared struct alias could each
    # re-inline the whole expression; a generator cannot).
    return df.select(
        F.col(id_col).alias("id"),
        F.inline(F.transform(F.array(shingle_ids_col(text_col, k)), winnow)),
    )


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    fp_cap: int = 50,
) -> DataFrame:
    """(a, b, shared_fp) — candidate near-duplicate pairs sharing at
    least ``min_shared`` winnowing fingerprints (a < b). The join is
    keyed on the selected-hash inverted index, so each doc contributes
    ~2/(w+1) of its grams instead of all of them; fingerprints present
    in more than ``fp_cap`` docs (boilerplate — MOSS drops these too)
    are excluded BEFORE the pair blowup, the same hot-key guard as
    lsh_candidate_pairs' bucket_cap / ngram_containment's df_cap."""
    fp = winnow_fingerprints(df, id_col, text_col, k=k, w=w).select(
        "id", F.explode("fps").alias("fp")
    )
    # ONE groupBy(fp) gathers each fingerprint's (distinct) doc set;
    # oversize sets are the hot/boilerplate fingerprints and drop here
    # (same nd > fp_cap rule as before — per-doc fps are distinct, so
    # row count per fp == set size). The a<b pairs are then generated
    # IN-ROW from the bounded set (≤ fp_cap members → ≤ C(cap,2) pairs)
    # instead of a fp-keyed self-join: the expensive winnow projection
    # is evaluated once rather than three times (hot-count branch plus
    # both join sides), and two aggregations replace agg + join + agg.
    groups = fp.groupBy("fp").agg(F.collect_set("id").alias("ids"))
    pairs_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        groups.filter(F.size("ids") <= fp_cap)
        .select(F.explode(pairs_arr).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("shared_fp"))
        .filter(F.col("shared_fp") >= min_shared)
    )
