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
