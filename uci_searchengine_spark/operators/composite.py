"""ES ``composite`` aggregation: resumable bucket pagination.

Elasticsearch's composite agg enumerates the buckets of a multi-source
grouping in key order, ``size`` at a time, resuming from an ``after``
key — the only ES agg designed to page through an UNBOUNDED bucket
space (every (lang, domain) pair of a web corpus) without holding it in
memory. The reference engine has the same need in its statistics
surfaces (per-domain rollups behind ``/api/crawler/statistics``,
reference ``backend/app/services/statistics_service.py``) but pages in
the application layer; here the page is computed in-plan.

Spark-first shape: the ``after`` cursor is a row-level tuple predicate
(``(k1,..,kn) > after`` lexicographically), applied BEFORE the groupBy —
so it prunes at the scan (partition pruning when the leading key is a
partition column, min/max row-group skipping otherwise), the partial
(map-side) aggregate only sees surviving rows, and the final ``ORDER BY
keys LIMIT size`` is a bounded TakeOrderedAndProject, never a full
sort. Paging through all B buckets costs B/size bounded jobs with
monotonically shrinking scans — memory is O(size) per page regardless
of B.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _after_pred(keys: list[str], after: tuple) -> Column:
    """Lexicographic (k1..kn) > (a1..an) as a flat boolean tree —
    plain comparisons on orderable columns, codegen-friendly in both
    engines (no struct construction in the hot predicate)."""
    if len(after) != len(keys):
        raise ValueError(f"after must have {len(keys)} values, got {after}")
    pred = None
    for i, (k, a) in enumerate(zip(keys, after)):
        eq_prefix = None
        for pk, pa in zip(keys[:i], after[:i]):
            e = F.col(pk) == F.lit(pa)
            eq_prefix = e if eq_prefix is None else (eq_prefix & e)
        gt = F.col(k) > F.lit(a)
        term = gt if eq_prefix is None else (eq_prefix & gt)
        pred = term if pred is None else (pred | term)
    return pred


def composite_agg(
    df: DataFrame,
    keys: list[str],
    metrics: list[Column],
    size: int = 10,
    after: tuple | None = None,
) -> DataFrame:
    """One page of bucket enumeration: buckets strictly after the
    ``after`` key tuple, in ascending key order, with ``metrics``
    aggregated per bucket. The last row's key tuple is the next page's
    ``after`` cursor (ES's ``after_key``)."""
    src = df.filter(_after_pred(keys, after)) if after is not None else df
    return src.groupBy(*keys).agg(*metrics).orderBy(*keys).limit(size)


def composite_pages(
    df: DataFrame,
    keys: list[str],
    metrics: list[Column],
    size: int = 10,
    max_pages: int | None = None,
):
    """Driver-side page iterator (the ES scroll loop): yields collected
    page row-lists until the bucket space is exhausted. Each page is one
    bounded job; only O(size) rows ever reach the driver per step."""
    after = None
    pages = 0
    while max_pages is None or pages < max_pages:
        rows = composite_agg(df, keys, metrics, size, after).collect()
        if not rows:
            return
        yield rows
        if len(rows) < size:
            return
        after = tuple(rows[-1][k] for k in keys)
        pages += 1


def composite_sql(
    table_sql: str,
    keys: list[str],
    metrics_sql: str,
    size: int = 10,
    after: tuple | None = None,
) -> str:
    """DuckDB mirror: identical row-level tuple predicate (expanded to
    the same flat boolean form), GROUP BY, ORDER BY keys, LIMIT."""

    def lit(v) -> str:
        # Quote-escape string cursors ("o'neil" is a plausible domain)
        # and reject anything that is not a plain str/int/float — the
        # cursor value is spliced into SQL text, so an unvetted repr()
        # would be an injection surface.
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise TypeError(
                f"composite cursor values must be str/int/float, got {v!r}"
            )
        return repr(v)

    where = ""
    if after is not None:
        terms = []
        for i, (k, a) in enumerate(zip(keys, after)):
            prefix = " AND ".join(
                f"{pk} = {lit(pa)}" for pk, pa in zip(keys[:i], after[:i])
            )
            gt = f"{k} > {lit(a)}"
            terms.append(f"({prefix + ' AND ' if prefix else ''}{gt})")
        where = "WHERE " + " OR ".join(terms)
    ks = ", ".join(keys)
    return f"""
SELECT {ks}, {metrics_sql}
FROM ({table_sql}) {where}
GROUP BY {ks} ORDER BY {ks} LIMIT {size}
"""
