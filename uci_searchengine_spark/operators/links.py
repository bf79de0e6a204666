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
