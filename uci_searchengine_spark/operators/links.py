"""Web-graph operators over extracted links.

Reference analogs:
* edge extraction + placeholder docs (crawler.py:240-296) → ``links_table``
* Document ⋈ relationships joins (crawler.py:511-539, J1/J2) → degree joins
* frontier reconstruction discovered−crawled (crawler.py:541-546, J6/U2)
  → ``frontier`` left-anti join
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.extract import extract_html
from uci_searchengine_spark.functions.tokenize import tokens_col


def links_table(pages: DataFrame) -> DataFrame:
    """pages → (src_url, dst_url) edges, normalized, distinct (U4)."""
    ex = F.col("_ex")
    return (
        pages.withColumn("_ex", extract_html(F.col("html"), F.col("url")))
        .select(F.col("url").alias("src_url"), F.explode(ex["links"]).alias("dst_url"))
        .filter(F.col("dst_url") != F.col("src_url"))
        .distinct()
    )


def out_degrees(links: DataFrame) -> DataFrame:
    """J1 analog: pages joined to their outgoing edges."""
    return links.groupBy("src_url").agg(F.count("*").alias("out_degree"))


def in_degrees(links: DataFrame) -> DataFrame:
    """J2 analog: pages joined to their incoming edges."""
    return links.groupBy("dst_url").agg(F.count("*").alias("in_degree"))


def frontier(links: DataFrame, pages: DataFrame) -> DataFrame:
    """Discovered-but-not-crawled urls (J6/U2): link targets with no page."""
    crawled = pages.select(F.col("url").alias("dst_url")).distinct()
    return (
        links.select("dst_url")
        .distinct()
        .join(crawled, "dst_url", "left_anti")
        .select(F.col("dst_url").alias("url"))
    )


def pagerank(
    links: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank (original-paper simplified form:
    rank = (1-d) + d·Σ rank_in/out_deg; dangling mass evaporates).

    Deterministic by construction — a FIXED iteration count, no
    convergence test — so a SQL oracle can unroll the exact same
    computation. Each iteration is one join + one aggregate (both on the
    edge key, AQE-planned); `localCheckpoint` every 3 rounds truncates
    the lineage that iterative Spark plans otherwise accumulate.
    Returns (node, rank).
    """
    nodes = (
        links.select(F.col(src).alias("node"))
        .unionByName(links.select(F.col(dst).alias("node")))
        .distinct()
    )
    out = links.groupBy(src).agg(F.count("*").alias("_od"))
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for i in range(iterations):
        contribs = (
            links.join(ranks.withColumnRenamed("node", src), src)
            .join(out, src)
            .select(F.col(dst).alias("node"), (F.col("rank") / F.col("_od")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def anchor_edges(pages: DataFrame) -> DataFrame:
    """pages → (src_url, dst_url, anchor) — the anchor-text edge table.
    Same skip/normalize rules as ``links_table`` but keeps multiplicity
    and the <a> element's text (functions/extract.py:extract_anchors):
    anchor text is the classic external relevance signal web ranking
    adds on top of body BM25 (it describes the TARGET, written by a
    third party). Arrow-batched parse, one explode — no shuffle."""
    from uci_searchengine_spark.functions.extract import extract_anchors

    pair = F.explode(extract_anchors(F.col("html"), F.col("url"))).alias("p")
    return (
        pages.select(F.col("url").alias("src_url"), pair)
        .select(
            "src_url",
            F.col("p.href").alias("dst_url"),
            F.col("p.anchor").alias("anchor"),
        )
        .filter(F.col("dst_url") != F.col("src_url"))
    )


def anchor_plane(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    k: int = 8,
    min_count: int = 1,
) -> DataFrame:
    """Per-target anchor-text rollup: ``(dst, n_inlinks, anchors)``
    where ``anchors`` is the top-``k`` anchor terms by count
    ("term:count term:count ..." — count desc, term asc), the field a
    serving index ingests as an extra ranking plane (BM25F treats it
    like title).

    Scale shape — the skew question is THE question here (popular pages
    have millions of inlinks): term counting is a (dst, term) grouped
    aggregate with map-side combine, so per-key state after the shuffle
    is the target's distinct anchor VOCABULARY (anchors are repetitive
    — orders of magnitude below its inlink count); the top-k slice then
    caps carried state at k terms via sort_array+slice on the counted
    rows, never a per-inlink sort. ``min_count`` drops singleton terms
    before the collect for mega-targets. Inlink count is a separate
    two-level count-distinct aggregate. No window, no UDF."""
    toks = edges.select(
        F.col(src).alias("_s"),
        F.col(dst).alias("_d"),
        F.explode(tokens_col(F.col("anchor"))).alias("term"),
    ).filter(F.col("term") != "")
    tc = (
        toks.groupBy("_d", "term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    topk = tc.groupBy("_d").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                (-F.col("cnt")).alias("nc"),
                                F.col("term").alias("term"),
                            )
                        )
                    ),
                    1,
                    k,
                ),
                lambda s: F.concat_ws(":", s["term"], (-s["nc"]).cast("string")),
            ),
        ).alias("anchors")
    )
    inl = edges.groupBy(F.col(dst).alias("_d")).agg(
        F.countDistinct(F.col(src)).alias("n_inlinks")
    )
    return inl.join(topk, "_d", "left").select(
        F.col("_d").alias(dst),
        "n_inlinks",
        F.coalesce("anchors", F.lit("")).alias("anchors"),
    )


def hits(
    links: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg 1999): hub/authority scores by mutual
    reinforcement — auth(i) = Σ hub(j) over inlinks j→i, hub(i) =
    Σ auth(j) over outlinks i→j, each L2-normalized per iteration.
    The companion to ``pagerank`` above: PageRank measures endorsement
    flow, HITS separates directories (hubs) from endorsed content
    (authorities) — the classic webtext pair.

    Deterministic by construction (FIXED iteration count, no
    convergence test) so the SQL oracle unrolls the identical rounds;
    scores rounded downstream absorb last-ulp summation order. Each
    iteration = two edge-keyed join+aggregate passes plus two scalar
    L2 norms broadcast back (one-row cross joins); lineage truncated
    every 2 rounds like pagerank. Returns (node, hub, auth) over all
    nodes (sources and targets), zeros where a side has no edges."""
    # the edge and node relations are loop-invariant but feed every
    # one of the ~4 joins per iteration — without pinning them, each
    # stage re-derives the distinct(union) lineage from scratch
    links = links.localCheckpoint(eager=False)
    nodes = (
        links.select(F.col(src).alias("node"))
        .unionByName(links.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hubs = nodes.withColumn("hub", F.lit(1.0))
    auths = nodes.withColumn("auth", F.lit(1.0))
    for i in range(iterations):
        a_raw = (
            links.join(
                hubs.select(F.col("node").alias(src), "hub"), src
            )
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum("hub").alias("_s"))
        )
        a_n = a_raw.agg(F.sqrt(F.sum(F.col("_s") * F.col("_s"))).alias("_n"))
        auths = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(F.broadcast(a_n))
            .select(
                "node",
                (F.coalesce("_s", F.lit(0.0)) / F.col("_n")).alias("auth"),
            )
        )
        h_raw = (
            links.join(
                auths.select(F.col("node").alias(dst), "auth"), dst
            )
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum("auth").alias("_s"))
        )
        h_n = h_raw.agg(F.sqrt(F.sum(F.col("_s") * F.col("_s"))).alias("_n"))
        hubs = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(F.broadcast(h_n))
            .select(
                "node",
                (F.coalesce("_s", F.lit(0.0)) / F.col("_n")).alias("hub"),
            )
        )
        if (i + 1) % 2 == 0:
            hubs = hubs.localCheckpoint(eager=False)
            auths = auths.localCheckpoint(eager=False)
    return hubs.join(auths, "node")


def frontier_prioritized(
    links: DataFrame,
    crawled: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int | None = None,
) -> DataFrame:
    """Crawl scheduling: the frontier (discovered − crawled, the same
    left-anti shape as ``frontier``) ranked by in-degree FROM CRAWLED
    PAGES — the classic breadth-quality policy (an OPIC/PageRank
    prior without the iteration): a url linked from many already-
    crawled pages is fetched first. One anti join + one counted
    aggregate + a bounded top-k when ``k`` is given; composes with
    ``pagerank``/``hits`` scores by joining on the node instead.
    Returns (url, n_refs) ordered n_refs desc, url asc."""
    cr = crawled.select(F.col(crawled.columns[0]).alias("_c")).distinct()
    cand = (
        links.join(cr, links[src] == F.col("_c"), "left_semi")
        .select(F.col(src).alias("_s"), F.col(dst).alias("url"))
        .join(cr, F.col("url") == F.col("_c"), "left_anti")
        .groupBy("url")
        .agg(F.count("*").alias("n_refs"))
        .orderBy(F.desc("n_refs"), F.asc("url"))
    )
    return cand.limit(k) if k else cand


def frontier_schedule(
    frontier: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
    rank_col: str = "n_refs",
    slots_per_round: int = 1,
) -> DataFrame:
    """Politeness scheduling: assign every frontier url a FETCH ROUND
    such that no domain is hit more than ``slots_per_round`` times per
    round — the per-host rate limit every production crawler enforces
    (the reference fetches serially with a sleep between requests,
    backend/app/services/crawler; this is the distributed form: the
    limit becomes an explicit schedule instead of an emergent property
    of one thread). Within a domain, higher-priority urls (rank desc,
    url asc) take earlier rounds.

    Plan shape: ONE window partitioned by domain — the domain is the
    politeness unit, so per-domain sequential numbering is exactly the
    state the operator models; partitions are domain-sized, never
    corpus-sized. A pathologically hot domain makes a long partition,
    but that domain's schedule is inherently serial (that is the
    constraint being computed) — the rest of the frontier
    parallelizes around it. Returns the frontier plus ``fetch_round``
    (0-based)."""
    if slots_per_round <= 0:
        raise ValueError(
            f"slots_per_round must be positive, got {slots_per_round}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(
        F.desc(rank_col), F.asc(url_col)
    )
    rn = F.row_number().over(w) - F.lit(1)
    return frontier.withColumn(
        "fetch_round", (rn - (rn % slots_per_round)) / slots_per_round
    ).withColumn("fetch_round", F.col("fetch_round").cast("long"))


def triangle_count(
    links: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts on the UNDIRECTED graph — the local
    clustering signal webspam/community detection uses (link farms are
    triangle-dense). Classic ordered-edge join: canonicalize each edge
    to (lo, hi), then triangles = e(a,b) ⋈ e(b,c) ⋈ e(a,c) with
    a < b < c — every triangle found exactly once, never an open-wedge
    explosion beyond the degree-bounded middle join. Two equi-joins +
    one per-node aggregate; returns (node, n_tri) for nodes in ≥1
    triangle."""
    e = (
        links.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    ab = e.alias("ab")
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c")).alias("bc")
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2")).alias("ac")
    tris = (
        ab.join(bc, "b")
        .join(
            ac,
            (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
            "left_semi",
        )
        .select("a", "b", "c")
    )
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return per_node


def label_propagation(
    links: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al.
    2007), determinized: labels start as node ids; each round EVERY
    node simultaneously takes the most frequent label among its
    (undirected) neighbors, ties broken by SMALLEST label; isolated
    update steps never consult the node's own label. Fixed iteration
    count (no convergence test) so the SQL oracle unrolls identical
    rounds — synchronous LP can oscillate, which is fine for a pinned
    round count. Communities segment a connected graph where
    connected-components necessarily returns one blob.

    Each round = one edge⋈label join + one (node, label) count + one
    max-struct argmax per node — all aggregates, no window, the same
    skew argument as the training pipeline's canonicalization (a
    mega-community label is one counted row per node, never a sorted
    partition). Returns (node, label)."""
    und = (
        links.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            links.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for i in range(iterations):
        nbr = (
            und.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label").alias("nl")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), F.col("nl").alias("cand"))
            .agg(F.count("*").alias("cnt"))
        )
        # Tie-break = "most frequent, then smallest label" as ONE
        # min-struct aggregate: the COUNT is always numeric (negating
        # it is safe whatever the label type — the thing that may be a
        # string/url is ``cand``, which rides the struct unnegated), so
        # min(struct(-cnt, cand)) picks max cnt then min cand exactly.
        # The old shape (per-node max cnt, join back on (node, cnt),
        # min(cand)) paid an extra aggregate + join — two more
        # exchanges per round for the same deterministic result.
        labels = (
            nbr.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("cand").alias("cand"),
                    )
                ).alias("w")
            )
            .select("node", F.col("w.cand").alias("label"))
        )
        if (i + 1) % 2 == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def personalized_pagerank(
    links: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Personalized/topic-sensitive PageRank (Haveliwala 2002): the
    teleport mass returns to the SEED set only — rank(v) = (1−d)·s(v)
    + d·Σ rank_in/out_deg with s uniform over seeds, so scores measure
    proximity-of-endorsement to the seeds (trusted-site propagation /
    TrustRank shape). Same fixed-iteration join+aggregate rounds as
    ``pagerank`` (SQL-unrollable); ``seeds`` is a one-column relation,
    broadcast into the teleport term. Returns (node, rank)."""
    nodes = (
        links.select(F.col(src).alias("node"))
        .unionByName(links.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seed = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    n_seeds = seed.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    base = 1.0 / float(n_seeds)
    nodes_t = nodes.join(
        seed.withColumn("_s", F.lit(1)), "node", "left"
    ).select(
        "node",
        F.when(F.col("_s") == 1, F.lit(base)).otherwise(F.lit(0.0)).alias(
            "tele"
        ),
    ).localCheckpoint(eager=False)
    links = links.localCheckpoint(eager=False)
    out = links.groupBy(src).agg(F.count("*").alias("_od"))
    ranks = nodes_t.select("node", F.col("tele").alias("rank"))
    for i in range(iterations):
        contribs = (
            links.join(ranks.withColumnRenamed("node", src), src)
            .join(out, src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("_od")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("_in"))
        )
        ranks = nodes_t.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(1.0 - damping) * F.col("tele")
                + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % 3 == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
