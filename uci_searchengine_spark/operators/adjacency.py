"""ES ``adjacency_matrix`` aggregation: given named filters, one
bucket per filter (doc_count of matching docs) and one per filter PAIR
``a&b`` (docs matching both) — the co-occurrence matrix ES serves for
graph/Venn UIs (reference shape: the alerting/analytics inverse of
`backend/app/services/search.py`'s filter surface, like percolate).

Dataflow: ONE pass, zero joins — each row computes its sorted matched-
name list in-row (a chain of conditional array concats), the singleton
and pair KEYS are generated in-row from that list (nested transform +
flatten — at most m + m(m−1)/2 keys for m matched filters, ES caps m
at 100 for the same quadratic reason, exposed here as ``max_filters``),
then one explode feeds one map-combined groupBy count. Empty buckets
are not emitted, matching ES.

The intersection semantics are exact, not sketched: a pair bucket is
counted from the SAME row that matched both filters, so there is no
inclusion-exclusion error — the reason ES offers this agg instead of
telling users to multiply `terms` agg counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ES_SEPARATOR = "&"
MAX_FILTERS = 100  # ES's own cap — the key count is quadratic in m


def adjacency_matrix(
    df: DataFrame,
    filters: "dict[str, Column]",
    separator: str = ES_SEPARATOR,
) -> DataFrame:
    """(key, doc_count) for every non-empty filter and filter-pair
    bucket. ``filters`` maps bucket name → boolean Column; pair keys
    join the two names in sorted-name order with ``separator``, as ES
    does. Names may not contain the separator (ES rejects this too)."""
    if not filters:
        raise ValueError("at least one named filter is required")
    if len(filters) > MAX_FILTERS:
        raise ValueError(f"more than {MAX_FILTERS} filters (ES cap)")
    for name in filters:
        if separator in name:
            raise ValueError(
                f"filter name {name!r} contains separator {separator!r}"
            )
    matched = F.concat(
        *[
            F.when(pred, F.array(F.lit(name))).otherwise(
                F.array().cast("array<string>")
            )
            for name, pred in sorted(filters.items())
        ]
    )
    m = F.col("_m")
    pairs = F.flatten(
        F.transform(
            m,
            lambda x, i: F.transform(
                F.slice(m, i + F.lit(2), F.size(m)),
                lambda y: F.concat(x, F.lit(separator), y),
            ),
        )
    )
    keys = F.concat(m, pairs)
    return (
        df.select(matched.alias("_m"))
        .select(F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("doc_count"))
    )


def adjacency_matrix_sql(
    table_sql: str,
    filters: "dict[str, str]",
    separator: str = ES_SEPARATOR,
) -> str:
    """DuckDB mirror: same in-row matched list, same generated keys."""
    names = sorted(filters)
    parts = " || ".join(
        f"(CASE WHEN {filters[n]} THEN ['{n}'] ELSE [] END)" for n in names
    )
    return f"""
WITH rows_m AS (
  SELECT ({parts}) AS m FROM ({table_sql})
),
keys AS (
  SELECT unnest(list_concat(m, flatten(list_transform(m, (x, i) ->
           list_transform(m[i+1:], y -> x || '{separator}' || y)))))
         AS key
  FROM rows_m
)
SELECT key, count(*) AS doc_count FROM keys GROUP BY key
"""
