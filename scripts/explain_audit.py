"""Plan audit: verify predicate pushdown, partition pruning, broadcast
joins, and whole-stage codegen on the hot paths. Prints the formatted
plans plus PASS/FAIL assertions on the plan features that matter at scale."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from uci_searchengine_spark.session import get_spark  # noqa: E402

IDX = "/root/repo/_data/audit_index"


def main() -> None:
    from uci_searchengine_spark.operators.index_build import build_index, load_segments
    from uci_searchengine_spark.operators.bm25 import score_naive
    from uci_searchengine_spark.operators.wand import score_wand
    from uci_searchengine_spark.sources.synth import synth_pages
    from uci_searchengine_spark.entry_queries import q_revenue_topk, q_pricing_summary

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    if not os.path.exists(os.path.join(IDX, "meta.json")):
        shutil.rmtree(IDX, ignore_errors=True)
        build_index(
            spark,
            synth_pages(spark, 500, 1337, partitions=8),
            IDX,
            num_shards=8,
            n_buckets=4,
            input_snapshot="audit",
        )

    checks: list[tuple[str, bool, str]] = []

    # 1) segment scan for a query term must prune partitions on shard
    seg = load_segments(spark, IDX).filter(
        (F.col("shard") == 3) & (F.col("term") == "stop0")
    )
    plan = seg._sc._jvm.PythonSQLUtils.explainString(
        seg._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "segment scan: partition pruning on shard",
            "PartitionFilters: [isnotnull(shard" in plan and "(shard" in plan,
            plan,
        )
    )
    checks.append(
        (
            "segment scan: term filter pushed to parquet",
            "PushedFilters: [IsNotNull(term), EqualTo(term,stop0)]" in plan,
            plan,
        )
    )

    # 1b) relational BM25 gate: fully in-plan — no cache, corpus stats
    # broadcast via a cross join, bounded top-k
    from uci_searchengine_spark.entry_queries import QUERIES as _GATES

    rel = _GATES["bm25_topk"][0](spark, "/root/testdata/sf0.001")
    plan = rel._sc._jvm.PythonSQLUtils.explainString(
        rel._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "relational bm25: in-plan broadcast stats (no driver collect)",
            "BroadcastNestedLoopJoin" in plan and "BroadcastExchange" in plan,
            plan,
        )
    )
    checks.append(
        (
            "relational bm25: no cached token relation",
            "InMemoryTableScan" not in plan,
            plan,
        )
    )
    checks.append(
        (
            "relational bm25: bounded top-k (TakeOrderedAndProject)",
            "TakeOrderedAndProject" in plan,
            plan,
        )
    )

    # 1c) sequence packing: the ONLY data-sized exchange is the window's
    # hash partitioning on shard — per-shard parallel cumsum, no global
    # ordering (a rangepartitioning exchange here would be the
    # single-stream bottleneck the operator exists to avoid)
    from uci_searchengine_spark.operators.packing import pack_sequences

    docs01 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(
        docs01.select("doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("tok")),
        "doc_id",
        "tok",
        512,
        8,
    )
    plan = packed._sc._jvm.PythonSQLUtils.explainString(
        packed._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "packing: single shard-hash exchange, window cumsum",
            plan.count("Arguments: hashpartitioning(shard") == 1
            and "Window" in plan,
            plan,
        )
    )
    checks.append(
        (
            "packing: no global range exchange",
            "rangepartitioning" not in plan,
            plan,
        )
    )

    # 1d) mixture application: per-domain fractions arrive by broadcast —
    # the corpus side is filtered in place, no corpus-sized join shuffle
    from uci_searchengine_spark.operators.sampling import (
        apply_mixture,
        mixture_weights,
    )

    mw = mixture_weights(
        docs01.select("doc_id", "source", F.lit(1).alias("tok")), "source", "tok"
    )
    applied = apply_mixture(
        docs01.select("doc_id", "source"), "source", "doc_id", mw
    )
    plan = applied._sc._jvm.PythonSQLUtils.explainString(
        applied._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "mixture: weights broadcast-joined onto the scan",
            "BroadcastHashJoin" in plan,
            plan,
        )
    )

    # 2) naive scorer: broadcast of the tiny df side + TakeOrderedAndProject
    topk = score_naive(spark, IDX, "stop0 arbak", 10)
    plan = topk._sc._jvm.PythonSQLUtils.explainString(
        topk._jdf.queryExecution(), "formatted"
    )
    checks.append(("naive: TakeOrderedAndProject", "TakeOrderedAndProject" in plan, plan))
    checks.append(("naive: broadcast join for term dfs", "BroadcastHashJoin" in plan, plan))
    checks.append(
        (
            "naive: term IN filter pushed to flat postings scan",
            "PushedFilters: [In(term" in plan,
            plan,
        )
    )
    # under AQE the formatted plan tags codegen stages as "[codegen id : N]"
    # only once final; check the executed plan's simple string instead
    topk.collect()
    executed = topk._jdf.queryExecution().executedPlan().toString()
    checks.append(
        ("naive: whole-stage codegen present", "*(" in executed, executed)
    )

    # 3) WAND path: pruned segment scan feeding cogroup
    wq = score_wand(spark, IDX, "stop0 arbak", 10)
    plan = wq._sc._jvm.PythonSQLUtils.explainString(
        wq._jdf.queryExecution(), "formatted"
    )
    checks.append(
        ("wand: partition pruning on shard set", "PartitionFilters: [shard" in plan or "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan and "IN" in plan, plan)
    )
    checks.append(("wand: per-bucket FlatMapGroupsInPandas", "FlatMapGroupsInPandas" in plan, plan))

    # 4) TPC-H-ish joins: broadcast for the small build side, pushdown
    rev = q_revenue_topk(spark, "/root/testdata/sf0.001")
    plan = rev._sc._jvm.PythonSQLUtils.explainString(
        rev._jdf.queryExecution(), "formatted"
    )
    checks.append(("revenue: broadcast hash join", "BroadcastHashJoin" in plan, plan))
    checks.append(
        (
            "revenue: mktsegment filter pushed",
            "EqualTo(c_mktsegment,BUILDING)" in plan,
            plan,
        )
    )

    ps = q_pricing_summary(spark, "/root/testdata/sf0.001")
    plan = ps._sc._jvm.PythonSQLUtils.explainString(
        ps._jdf.queryExecution(), "formatted"
    )
    checks.append(
        ("pricing: shipdate pushed", "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan)
    )
    checks.append(
        ("pricing: column-pruned scan (no l_comment-ish extras)", "ReadSchema" in plan, plan)
    )

    # 5) round-2 surfaces: suggest's vocab scan must column-prune the
    # heavy segment columns (postings/blocks), and a positional index's
    # BM25 plan must not read the positional plane
    from uci_searchengine_spark.operators.suggest import suggest

    sg = suggest(spark, IDX, "stop0x")
    plan = sg._sc._jvm.PythonSQLUtils.explainString(
        sg._jdf.queryExecution(), "formatted"
    )
    import re as _re

    rs = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = rs.group(1) if rs else ""
    checks.append(
        (
            "suggest: vocab scan column-prunes postings/blocks",
            "postings" not in read_cols and "block_max" not in read_cols,
            plan,
        )
    )

    PIDX = "/root/repo/_data/audit_index_pos"
    if not os.path.exists(os.path.join(PIDX, "meta.json")):
        shutil.rmtree(PIDX, ignore_errors=True)
        build_index(
            spark,
            synth_pages(spark, 300, 1337, partitions=4),
            PIDX,
            num_shards=4,
            n_buckets=4,
            input_snapshot="audit-pos",
            positions=True,
        )
    sw = score_wand(spark, PIDX, "stop0 arbak")
    plan = sw._sc._jvm.PythonSQLUtils.explainString(
        sw._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "wand on positional index: positions plane pruned from scan",
            "positions" not in plan,
            plan,
        )
    )

    # 6) round-3 query surfaces
    # prefix expansion: one vocab scan, heavy planes pruned, in-plan cap
    from uci_searchengine_spark.operators.suggest import vocab as _vocab

    ex = (
        _vocab(spark, IDX)
        .filter(F.col("term").startswith("arb"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(50)
    )
    plan = ex._sc._jvm.PythonSQLUtils.explainString(
        ex._jdf.queryExecution(), "formatted"
    )
    rs = _re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = rs.group(1) if rs else ""
    checks.append(
        (
            "prefix expansion: vocab scan prunes postings planes",
            "postings" not in read_cols and "block_max" not in read_cols,
            plan,
        )
    )
    checks.append(
        (
            "prefix expansion: cap applied in-plan (TakeOrderedAndProject)",
            "TakeOrderedAndProject" in plan,
            plan,
        )
    )

    # sorted terms-dictionary plane: the prefix predicate must reach the
    # parquet reader (StringStartsWith pushed -> row-group pruning on
    # the sorted term column)
    from uci_searchengine_spark.operators.prefix import (
        vocab_relation,
        write_vocab_plane,
    )

    write_vocab_plane(spark, IDX)
    vp = vocab_relation(spark, IDX).filter(F.col("term").startswith("arb"))
    plan = vp._sc._jvm.PythonSQLUtils.explainString(
        vp._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "vocab plane: StringStartsWith pushed to parquet",
            "StringStartsWith(term,arb)" in plan,
            plan,
        )
    )

    # fuzzy expansion: the length window reaches the dictionary scan as
    # pushed filters and the cap is in-plan (TakeOrderedAndProject), so
    # at most max_expansions rows reach the driver
    from uci_searchengine_spark.operators.fuzzy import MAX_EXPANSIONS

    fv = (
        vocab_relation(spark, IDX)
        .filter(
            (F.length("term") >= 4) & (F.length("term") <= 6)
        )
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit("arbak"), 1))
        .filter(F.col("dist") >= 0)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(MAX_EXPANSIONS)
    )
    plan = fv._sc._jvm.PythonSQLUtils.explainString(
        fv._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "fuzzy expansion: in-plan cap (TakeOrderedAndProject)",
            "TakeOrderedAndProject" in plan,
            plan,
        )
    )
    checks.append(
        (
            "fuzzy expansion: length window pushed to parquet",
            "GreaterThanOrEqual(length(term" in plan
            or "PushedFilters:" in plan,
            plan,
        )
    )

    # regex expansion: the literal prefix is pushed as StringStartsWith
    # ahead of the anchored rlike (row-group pruning on the sorted plane)
    rv = (
        vocab_relation(spark, IDX)
        .filter(F.col("term").startswith("arb"))
        .filter(F.col("term").rlike("^(?:arb[a-z]*)$"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(MAX_EXPANSIONS)
    )
    plan = rv._sc._jvm.PythonSQLUtils.explainString(
        rv._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "regex expansion: literal prefix pushed (StringStartsWith)",
            "StringStartsWith(term,arb)" in plan
            and "TakeOrderedAndProject" in plan,
            plan,
        )
    )

    # batch eval: ONE pruned scan for the whole query batch (scan count)
    from uci_searchengine_spark.operators.batch_eval import batch_topk

    bt = batch_topk(
        spark, IDX, {"q1": "stop0 arbak", "q2": "arbak stop1"}, k=5
    )
    plan = bt._sc._jvm.PythonSQLUtils.explainString(
        bt._jdf.queryExecution(), "formatted"
    )
    # count scan NODES (the formatted plan repeats each node in the
    # detail section — match the "(N) Scan parquet" detail headers)
    n_seg_scans = len(_re.findall(r"\(\d+\) Scan parquet", plan))
    checks.append(
        (
            "batch eval: one segment scan for the whole batch",
            n_seg_scans == 1 and "PartitionFilters: [" in plan,
            plan,
        )
    )

    # related_docs: stats + dfs broadcast, no cache, bounded final window
    from uci_searchengine_spark.functions.tokenize import tokens_col
    from uci_searchengine_spark.operators.related import related_docs

    toks = synth_pages(spark, 100, 1337, partitions=4).select(
        F.xxhash64("url").alias("doc_id"),
        tokens_col(F.decode("html", "utf-8")).alias("t"),
    )
    rd = related_docs(toks, k=3, max_terms=5, df_cap=50)
    plan = rd._sc._jvm.PythonSQLUtils.explainString(
        rd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "related_docs: df-cap + stats joined via broadcast",
            plan.count("BroadcastHashJoin") >= 1
            and "BroadcastNestedLoopJoin" in plan,
            plan,
        )
    )
    checks.append(
        (
            "related_docs: no cached relation (recomputable lineage)",
            "InMemoryTableScan" not in plan,
            plan,
        )
    )

    # multi-field ranking: the titleplane scan must receive the query's
    # term IN (...) as pushed parquet filters (row-group pruning on the
    # term-sorted plane), the per-term df agg must broadcast back, and
    # the bounded top-k must be in-plan
    from uci_searchengine_spark.operators.multifield import (
        score_fields,
        write_title_plane,
    )

    write_title_plane(spark, IDX)
    mfd = score_fields(spark, IDX, "arbak stop1", variant="bm25f", k=10)
    plan = mfd._sc._jvm.PythonSQLUtils.explainString(
        mfd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "multifield: term IN pushed to the titleplane scan",
            "In(term, [arbak,stop1])" in plan,
            plan,
        )
    )
    checks.append(
        (
            "multifield: df agg broadcast + in-plan top-k",
            "BroadcastHashJoin" in plan and "TakeOrderedAndProject" in plan,
            plan,
        )
    )

    # DSIR: the ≤B-row log-ratio table must broadcast onto the doc
    # features (never shuffle the corpus against it) and the Gumbel
    # top-k draw must be the bounded TakeOrderedAndProject, not a sort
    from uci_searchengine_spark.operators.dsir import dsir_select

    raw = synth_pages(spark, 100, 1337, partitions=4).select(
        F.xxhash64("url").alias("doc_id"),
        F.decode("html", "utf-8").alias("text"),
    )
    ds = dsir_select(raw, raw.limit(20), k=10, n_buckets=64)
    plan = ds._sc._jvm.PythonSQLUtils.explainString(
        ds._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "dsir: ratio table broadcast onto doc features",
            "BroadcastHashJoin" in plan,
            plan,
        )
    )
    checks.append(
        (
            "dsir: Gumbel top-k is bounded (TakeOrderedAndProject)",
            "TakeOrderedAndProject" in plan,
            plan,
        )
    )

    # sketches: one partial-aggregated shuffle each, no UDF, no window.
    # HLL registers must show map-side partial aggregation (the whole
    # point of the register representation at corpus scale).
    from uci_searchengine_spark.operators.sketches import (
        cms_table,
        hll_registers,
    )

    docs100 = synth_pages(spark, 100, 1337, partitions=4).select(
        F.decode("html", "utf-8").alias("text")
    )
    regs = hll_registers(docs100, F.col("text"), p=8)
    plan = regs._sc._jvm.PythonSQLUtils.explainString(
        regs._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "hll: partial (map-side) aggregate before the exchange",
            "partial_max" in plan and "FlatMapGroupsInPandas" not in plan,
            plan,
        )
    )
    regs.collect()
    executed = regs._jdf.queryExecution().executedPlan().toString()
    checks.append(
        ("hll: whole-stage codegen on the hash projection",
         "*(" in executed, executed)
    )
    counts100 = docs100.groupBy(F.col("text").alias("term")).agg(
        F.count("*").alias("cnt")
    )
    cms = cms_table(counts100, width=256, depth=4)
    plan = cms._sc._jvm.PythonSQLUtils.explainString(
        cms._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "cms: partial (map-side) cell sums, no UDF",
            "partial_sum" in plan and "FlatMapGroupsInPandas" not in plan,
            plan,
        )
    )

    # paragraph dedup: the first-occurrence winner must be a MIN
    # aggregate (skew-safe), never a per-hash window sort
    from uci_searchengine_spark.operators.dedup import (
        paragraph_dedup,
        token_chunks_col,
    )
    from uci_searchengine_spark.functions.tokenize import tokens_col

    pd_docs = synth_pages(spark, 100, 1337, partitions=4).select(
        F.xxhash64("url").alias("doc_id"),
        F.decode("html", "utf-8").alias("text"),
    )
    pdd = paragraph_dedup(
        pd_docs, token_chunks_col(tokens_col(F.col("text")), 12)
    )
    plan = pdd._sc._jvm.PythonSQLUtils.explainString(
        pdd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "paragraph dedup: min-aggregate winners, no Window sort",
            "partial_min" in plan and "Window" not in plan,
            plan,
        )
    )

    # training pipeline: every first-occurrence / keep-best step must
    # be an aggregate, never a per-key Window sort (the skew class a
    # mass-duplicate fingerprint or cluster would explode at 100 TB)
    from uci_searchengine_spark.entry_queries import (
        q_canonical_docs,
        q_training_prep_v2,
    )

    for nm, qf in (
        ("training_prep_v2", q_training_prep_v2),
        ("canonical_docs", q_canonical_docs),
    ):
        qd = qf(spark, "/root/testdata/sf0.001")
        plan = qd._sc._jvm.PythonSQLUtils.explainString(
            qd._jdf.queryExecution(), "formatted"
        )
        checks.append(
            (f"{nm}: aggregate canonicalization, no Window sort",
             "Window" not in plan, plan)
        )

    # federation: the member scans must keep shard partition-pruning
    # and term pushdown THROUGH the global-df override projection, and
    # the per-bucket scorer must be the same FlatMapGroupsInPandas the
    # single-index path uses
    from uci_searchengine_spark.operators.federate import federated_topk

    fed = federated_topk(spark, [IDX], "stop0 arbak", k=5)
    plan = fed._sc._jvm.PythonSQLUtils.explainString(
        fed._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "federate: shard partition pruning survives the df override",
            "PartitionFilters: [shard" in plan and " IN (" in plan,
            plan,
        )
    )
    checks.append(
        (
            "federate: term IN pushdown + per-bucket scorer",
            "PushedFilters: [In(term" in plan
            and "FlatMapGroupsInPandas" in plan,
            plan,
        )
    )

    # quantile sketch: the hash-sample keep decision must fold into the
    # scan as a pushed filter (zero-shuffle sketch build), and the
    # estimate must be a plain grouped aggregate — no UDF, no Window
    from uci_searchengine_spark.entry_queries import (
        q_composite_agg,
        q_sampled_quantiles,
    )

    qd = q_sampled_quantiles(spark, "/root/testdata/sf0.001")
    plan = qd._sc._jvm.PythonSQLUtils.explainString(
        qd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "quantile sketch: sample filter at the scan, no UDF/Window",
            "Filter" in plan
            and "HashAggregate" in plan
            and "Window" not in plan
            and "Python" not in plan,
            plan,
        )
    )
    checks.append(
        (
            "quantile sketch: pruned read schema (doc_id, lang, n_chars)",
            "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:200],
            plan,
        )
    )

    # composite agg: the after-cursor is a ROW-level predicate pushed
    # to the parquet scan (pre-aggregate pruning), the page a bounded
    # TakeOrderedAndProject, aggregation map-side partial
    qd = q_composite_agg(spark, "/root/testdata/sf0.001")
    plan = qd._sc._jvm.PythonSQLUtils.explainString(
        qd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "composite: cursor predicate pushed to scan",
            "PushedFilters:" in plan
            and "GreaterThan(lang" in plan,
            plan,
        )
    )
    checks.append(
        (
            "composite: bounded page (TakeOrderedAndProject) + partial agg",
            "TakeOrderedAndProject" in plan
            and "partial_count" in plan.lower(),
            plan,
        )
    )

    # anchor plane: term counting must be a (dst, term) grouped
    # aggregate with a map-side partial, the top-k a post-aggregate
    # slice — never a per-inlink Window sort (mega-target skew class)
    from uci_searchengine_spark.entry_queries import q_anchor_plane

    qd = q_anchor_plane(spark, "/root/testdata/sf0.001")
    plan = qd._sc._jvm.PythonSQLUtils.explainString(
        qd._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "anchor plane: partial aggregates, no Window, no Python UDF",
            "partial_count" in plan.lower()
            and "Window" not in plan
            and "Python" not in plan,
            plan,
        )
    )

    # 7) round-5 surfaces
    # reciprocal k-NN through the LSH candidate join: the whole point of
    # the candidate path is that NOTHING in the plan is n² — every join
    # must be an equi-join (bucket, ia, ib), never a cartesian / nested-
    # loop product (the exact all-pairs fallback is the oracle role only)
    from uci_searchengine_spark.operators.similarity import (
        knn_candidate_pairs,
        reciprocal_knn,
    )

    emb01 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cand = knn_candidate_pairs(emb01)
    rk = reciprocal_knn(emb01, k=5, candidates=cand)
    plan = rk._sc._jvm.PythonSQLUtils.explainString(
        rk._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "reciprocal knn (candidate path): no cartesian / nested-loop join",
            "CartesianProduct" not in plan
            and "BroadcastNestedLoopJoin" not in plan,
            plan,
        )
    )
    checks.append(
        (
            "knn candidates: explode -> bucket equi-join (Generate + hash/merge join)",
            "Generate" in plan
            and (
                "SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan
            ),
            plan,
        )
    )

    # percolate_indexed: queries are DATA — the plan must stay constant
    # as the registry grows (the expression path grows linearly and
    # blows codegen at 10^5 standing queries), and the candidate
    # pre-filter must arrive by broadcast with no Python anywhere
    from uci_searchengine_spark.operators.percolate import percolate_indexed

    docs_t = docs01.select(
        "doc_id", tokens_col(F.col("text")).alias("t")
    )
    reg_small = {f"q{i}": f"stop{i % 7} +arbak" for i in range(5)}
    reg_big = {f"q{i}": f"stop{i % 7} +arbak" for i in range(120)}
    p_small = percolate_indexed(docs_t, reg_small)
    p_big = percolate_indexed(docs_t, reg_big)
    plan_s = p_small._sc._jvm.PythonSQLUtils.explainString(
        p_small._jdf.queryExecution(), "formatted"
    )
    plan_b = p_big._sc._jvm.PythonSQLUtils.explainString(
        p_big._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "percolate_indexed: plan size constant in registry size (24x queries)",
            len(plan_b) < 1.5 * len(plan_s),
            f"plan chars: 5 queries={len(plan_s)}, 120 queries={len(plan_b)}",
        )
    )
    checks.append(
        (
            "percolate_indexed: broadcast candidate index, no Python UDF",
            # "Python" alone would false-positive on the literal query
            # relations (createDataFrame -> "applySchemaToPythonRDD" in
            # the ExistingRDD scan description) — that's driver-side
            # literal materialization, not per-row Python in the flow
            "BroadcastHashJoin" in plan_b
            and "BatchEvalPython" not in plan_b
            and "ArrowEvalPython" not in plan_b
            and "MapInPandas" not in plan_b
            and "PythonUDF" not in plan_b,
            plan_b,
        )
    )

    # incremental (batch-vs-store) dedup: both probes must be left-semi
    # joins of the batch against store relations — the store is never
    # self-joined and no per-key Window appears anywhere
    from uci_searchengine_spark.operators.dedup import incremental_dedup

    inc = incremental_dedup(
        docs01.limit(50), docs01, "doc_id", "text"
    )
    plan = inc._sc._jvm.PythonSQLUtils.explainString(
        inc._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "incremental dedup: left-semi store probes, no Window",
            "LeftSemi" in plan and "Window" not in plan,
            plan,
        )
    )

    # C4 line cleaning: the whole rule set must fold into the scan-side
    # projection — ZERO exchanges of any kind, zero Python eval
    # operators (HOF filter over the lines array + doc-level
    # predicates); audited on the raw parquet read (the gate adds a
    # presentation orderBy + the documents-table scan rebalance, which
    # are gate furniture, not operator cost)
    from uci_searchengine_spark.functions.tokenize import tokens_col
    from uci_searchengine_spark.operators.clean import c4_clean
    from uci_searchengine_spark.operators.dedup import token_chunks_col

    c4 = c4_clean(
        docs01,
        token_chunks_col(tokens_col(F.col("text")), 12),
        require_terminal_punct=False,
        line_bad_words=("slow",),
    )
    plan = c4._sc._jvm.PythonSQLUtils.explainString(
        c4._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "c4_clean: scan-side HOF rules, zero exchange, no Python",
            "Exchange" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan
            and "PythonUDF" not in plan,
            plan,
        )
    )

    # 53) KMV theta sketch: the theta prune must sit BELOW the aggregate
    # (scan-stage filter — at 100 TB it drops (1-theta) of rows before
    # any exchange), the collect_set must map-side combine
    # (partial_collect_set), and the whole plan is one shuffle, zero
    # Python.
    from uci_searchengine_spark.operators.sketches import kmv_sketch

    orders01 = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    kmv = kmv_sketch(
        orders01,
        F.col("o_custkey"),
        k=64,
        group_cols=["o_orderstatus"],
        theta=0.25,
    )
    plan = kmv._sc._jvm.PythonSQLUtils.explainString(
        kmv._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "kmv: theta filter pre-shuffle, partial collect_set, one exchange",
            plan.count("+- Exchange") == 1
            and "partial_collect_set" in plan
            and "< 0.25" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan,
            plan,
        )
    )

    # Z-order layout: the Morton-code projection must be scan-side
    # (zero Exchange before the stats aggregate's own shuffle — the
    # aggregate is map-combined so exactly one Exchange total), all
    # integer JVM arithmetic (zero Python eval operators), and the
    # physical rewrite must plan exactly one range shuffle.
    from uci_searchengine_spark.operators.layout import (
        cell_stats as _zo_stats,
        zorder_cells as _zo_cells,
        zorder_layout as _zo_layout,
    )

    orders_zo = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders_zo = orders_zo.withColumn(
        "okday", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    )
    zo_specs = [("o_custkey", 0, 14), ("okday", 0, 12)]
    zst = _zo_stats(
        _zo_cells(orders_zo, zo_specs, bits=8, cell_shift=8),
        ["o_custkey", "okday"],
    )
    plan = zst._sc._jvm.PythonSQLUtils.explainString(
        zst._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "zorder: scan-side zval, one map-combined exchange, no Python",
            plan.count("+- Exchange") == 1
            and "partial_count" in plan
            and "shiftleft" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan,
            plan,
        )
    )
    zlay = _zo_layout(orders_zo, zo_specs, bits=8, num_partitions=8)
    plan = zlay._sc._jvm.PythonSQLUtils.explainString(
        zlay._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "zorder layout: exactly one range shuffle, in-partition sort",
            plan.count("+- Exchange") == 1
            and "rangepartitioning" in plan
            and "Sort" in plan
            and ", false, 0" in plan,  # sortWithinPartitions: global=false
            plan,
        )
    )

    # Distributed Lloyd k-means: centroid side broadcast (the corpus
    # is never shuffled against k), the update step's sums partially
    # aggregated map-side, zero Python eval.
    from uci_searchengine_spark.operators.clustering import (
        kmeans_assign as _km_assign,
        kmeans_update as _km_update,
        quantize_vec as _km_quant,
        semdedup_pairs as _km_pairs,
    )

    emb_km = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", _km_quant(F.col("embedding")).alias("qv"))
    cents_km = emb_km.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    km_assigned = _km_assign(emb_km, cents_km)
    kmu = _km_update(km_assigned, 8)
    plan = kmu._sc._jvm.PythonSQLUtils.explainString(
        kmu._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "kmeans: literal-inlined assign (no join), partial-combined sums, no Python",
            # r6: the small-k assignment inlines collected centroid
            # literals into the scan projection — the update plan has
            # NO join of any kind (stronger than the old broadcast
            # assertion: the corpus is never joined against k at all)
            "Join" not in plan
            and "CartesianProduct" not in plan
            and "partial_sum" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan
            and "MapInPandas" not in plan,
            plan,
        )
    )
    # SemDeDup: the pair join must be keyed on the CELL (equi-join) —
    # the whole point is that clustering bounds the candidate set, so
    # a cartesian/nested-loop join here would be the O(n²) failure.
    kmp = _km_pairs(km_assigned, 0.4)
    plan = kmp._sc._jvm.PythonSQLUtils.explainString(
        kmp._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "semdedup: cell-keyed equi-join, no cartesian product",
            # the upstream assignment's k-row centroid broadcast is a
            # legitimate BroadcastNestedLoopJoin; the PAIR join must be
            # an equi-join (hash or sort-merge) and nothing cartesian
            "CartesianProduct" not in plan
            and (
                "SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan
            )
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # Trigram wildcard expansion: the candidate probe over the
    # persisted plane must push the gram IN(...) filter into the
    # parquet reader (the gram-sorted plane prunes row groups on gram
    # min/max), AND the exact LIKE verify must run on the aggregated
    # candidate set, not the full dictionary — i.e. the scan's pushed
    # filters mention gram, not a Contains over every term.
    from uci_searchengine_spark.operators.trigram import (
        required_trigrams as _tri_req,
        trigram_plane_fresh as _tri_fresh,
        write_trigram_plane as _tri_write,
    )
    from uci_searchengine_spark.operators.index_build import (
        IndexMeta as _IdxMeta,
    )

    if not _tri_fresh(IDX, _IdxMeta.load(IDX)):
        _tri_write(spark, IDX)
    _grams = _tri_req("*versit*")  # multi-gram: forces In(gram, ...)
    tri_plane = spark.read.parquet(os.path.join(IDX, "trigramplane"))
    tri_cand = (
        tri_plane.filter(F.col("gram").isin(_grams))
        .groupBy("term", "df")
        .agg(F.count("*").alias("ng"))
        .filter(F.col("ng") == len(_grams))
        .select("term", "df")
        .filter(F.col("term").like("%versit%"))
    )
    plan = tri_cand._sc._jvm.PythonSQLUtils.explainString(
        tri_cand._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "trigram wildcard: gram IN pushed to plane scan, no Python",
            ("In(gram" in plan or "EqualTo(gram" in plan)
            and "partial_count" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # Interval range join: the BETWEEN predicate must run as a bucket
    # equi-join (the operator's whole point) — a CartesianProduct or
    # BroadcastNestedLoopJoin here is the O(points × intervals) failure
    # the bucketization exists to avoid — with the aggregate partially
    # combined map-side.
    from uci_searchengine_spark.entry_queries import q_range_join

    rj = q_range_join(spark, "/root/testdata/sf0.001")
    plan = rj._sc._jvm.PythonSQLUtils.explainString(
        rj._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "range join: bucket equi-join, no nested loop, partial agg",
            "CartesianProduct" not in plan
            and "BroadcastNestedLoopJoin" not in plan
            and (
                "SortMergeJoin" in plan
                or "ShuffledHashJoin" in plan
                or "BroadcastHashJoin" in plan
            )
            and "partial_count" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # MaxSim late interaction: the whole score is one in-row integer
    # projection — scan → TakeOrdered, zero Exchange, zero Python.
    from uci_searchengine_spark.operators.lateinteraction import (
        maxsim_topk as _ms_topk,
        tokens_from_vec as _ms_toks,
    )

    emb_ms = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    toks_ms = _ms_toks(emb_ms, "embedding", "vec_id", 8, 8)
    q_ms = [
        [int(x) for x in t]
        for t in toks_ms.filter(F.col("vec_id") == 0).collect()[0]["toks"]
    ]
    ms = _ms_topk(toks_ms, q_ms, k=10)
    plan = ms._sc._jvm.PythonSQLUtils.explainString(
        ms._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "maxsim: in-row scoring, scan->TakeOrdered, no shuffle/Python",
            "TakeOrderedAndProject" in plan
            and "Exchange" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # T5 span corruption: one in-row fold — no explode (Generate), no
    # window, no shuffle, no Python. The trainer-prep stage must stay
    # a scan projection.
    from uci_searchengine_spark.operators.denoise import (
        denoiser_prep as _dn_prep,
    )

    dn_df = spark.createDataFrame(
        [(1, ["a", "b", "c"])], "doc_id long, t array<string>"
    )
    dn = _dn_prep(dn_df)
    plan = dn._sc._jvm.PythonSQLUtils.explainString(
        dn._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "span corruption: in-row fold, no Generate/Exchange/Python",
            "Generate" not in plan
            and "Exchange" not in plan
            and "Window" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # KN perplexity: the three model relations join BROADCAST (the
    # scoring pass must stream the corpus once — no shuffle of the
    # doc-bigram stream against the model), and no Python anywhere.
    from uci_searchengine_spark.operators.lm_quality import (
        kn_perplexity as _knp,
        train_kn_bigram as _knt,
    )

    kn_ref = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog sat on the rug",)],
        "text string",
    )
    kn_docs = spark.createDataFrame(
        [(1, "the cat sat")], "doc_id long, text string"
    )
    _h, _b, _c, _nt, _v = _knt(kn_ref)
    kn = _knp(kn_docs, _h, _b, _c, _nt, _v)
    plan = kn._sc._jvm.PythonSQLUtils.explainString(
        kn._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "kn_ppl: 3 broadcast model joins, no shuffle-join, no Python",
            plan.count("BroadcastHashJoin") >= 3
            and "SortMergeJoin" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # Suffix-array excision: the per-doc rebuild is one in-row fold
    # over collected intervals — the final stage (given intervals and
    # docs) must contain no Python eval and no nested-loop join.
    from uci_searchengine_spark.operators.suffixarray import (
        drop_duplicate_spans as _dds,
    )

    sa_docs = spark.createDataFrame(
        [(0, "aaa qwzxvkjbpmdyfgu bbb"), (1, "ccc qwzxvkjbpmdyfgu ddd")],
        "doc_id long, text string",
    )
    sa = _dds(sa_docs, min_len=12, partitions=2)
    plan = sa._sc._jvm.PythonSQLUtils.explainString(
        sa._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "span removal: no Python eval, no cartesian/nested-loop join",
            "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan
            and "CartesianProduct" not in plan
            and "BroadcastNestedLoopJoin" not in plan,
            plan,
        )
    )

    # SymSpell lookup: the delete-probe must push an In/isin filter
    # into the plane scan (never a full-plane levenshtein pass) and
    # contain no Python.
    from uci_searchengine_spark.operators.suggest import (
        suggest_symspell as _ssym,
        symspell_plane as _spl,
    )

    sv = spark.createDataFrame(
        [("scan", 3), ("sort", 2)], "term string, df long"
    )
    spl = _spl(sv, max_dist=2)
    ss = _ssym(spl, "scrn", k=3)
    plan = ss._sc._jvm.PythonSQLUtils.explainString(
        ss._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "symspell: IN-probe filter present, no Python",
            (" IN (" in plan or "INSET" in plan or " IN [" in plan)
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # Bitext mining: aggregates only — no Window, no Python; with a
    # candidate relation no cartesian product either.
    from uci_searchengine_spark.operators.similarity import (
        mine_bitext as _mbt,
    )

    ea = spark.createDataFrame(
        [(1, [0.1] * 4), (2, [0.2] * 4)], "vec_id long, embedding array<float>"
    )
    eb = spark.createDataFrame(
        [(11, [0.3] * 4)], "vec_id long, embedding array<float>"
    )
    cnd = spark.createDataFrame([(1, 11), (2, 11)], "ia long, ib long")
    mb = _mbt(ea, eb, k=2, threshold=0.0, candidates=cnd)
    plan = mb._sc._jvm.PythonSQLUtils.explainString(
        mb._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "bitext: no Window / Python / cartesian with candidates",
            "Window" not in plan
            and "CartesianProduct" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # ES-DSL closure wave: all four gates must stay scan-side relational
    # dataflows — no Window, no Python anywhere; the two BM25 compounds
    # (terms_set, boosting) broadcast their df/stats sides; the two
    # scan-only gates (match_phrase_prefix, random_score) must add no
    # join at all, and random_score must bound its result with
    # TakeOrderedAndProject rather than a global sort.
    for g in ("terms_set", "boosting_search"):
        d = _GATES[g][0](spark, "/root/testdata/sf0.001")
        plan = d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )
        checks.append(
            (
                f"{g}: broadcast df/stats, no Window, no Python",
                "BroadcastExchange" in plan
                and "Window" not in plan
                and "BatchEvalPython" not in plan
                and "ArrowEvalPython" not in plan,
                plan,
            )
        )
    for g in ("match_phrase_prefix", "random_score"):
        d = _GATES[g][0](spark, "/root/testdata/sf0.001")
        plan = d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )
        checks.append(
            (
                f"{g}: pure scan-side — no join, no Window, no Python",
                "Join" not in plan
                and "Window" not in plan
                and "BatchEvalPython" not in plan
                and "ArrowEvalPython" not in plan
                and ("TakeOrderedAndProject" in plan or g != "random_score"),
                plan,
            )
        )

    # combined_fields: same broadcast-stats contract as the other BM25
    # compounds; winnowing_pairs: fingerprint extraction must stay
    # in-row (no Window, no Python, no cartesian product — the only
    # shuffles are the fp-keyed pair join + aggregates) and the hot-fp
    # guard must be a broadcast anti join, not a shuffled one.
    d = _GATES["combined_fields"][0](spark, "/root/testdata/sf0.001")
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "combined_fields: broadcast df/stats, no Window, no Python",
            "BroadcastExchange" in plan
            and "Window" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )
    d = _GATES["winnowing_pairs"][0](spark, "/root/testdata/sf0.001")
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "winnowing: in-row fps, joinless set-cap pair expansion, no Python",
            # r6: pairs come from groupBy(fp) -> collect_set + bounded
            # in-row a<b expansion; the hot-fp guard is the in-row
            # set-size cap, so the plan has NO join at all (the old
            # shape needed a broadcast-anti hot-guard + fp self-join)
            "Window" not in plan
            and "Join" not in plan
            and "CartesianProduct" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # ES agg closure: the moment aggs must be plain partial-agg
    # pipelines (no Window, no Python); MAD's median table must come
    # back via broadcast; the diversified sampler's per-key cap must be
    # the windowless sort-slice aggregate with a bounded global top-k.
    for g in ("extended_stats", "weighted_avg"):
        d = _GATES[g][0](spark, "/root/testdata/sf0.001")
        plan = d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )
        checks.append(
            (
                f"{g}: partial-agg pipeline, no Window/Join/Python",
                "HashAggregate" in plan
                and "Window" not in plan
                and "Join" not in plan
                and "BatchEvalPython" not in plan
                and "ArrowEvalPython" not in plan,
                plan,
            )
        )
    d = _GATES["mad_dispersion"][0](spark, "/root/testdata/sf0.001")
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "mad: broadcast median join, no Window, no Python",
            "BroadcastHashJoin" in plan
            and "Window" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )
    d = _GATES["diversified_sample"][0](spark, "/root/testdata/sf0.001")
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "diversified: windowless per-key cap + bounded top-k",
            "Window" not in plan
            and "TakeOrderedAndProject" in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    # span queries: pure scan-side positional predicates; diversity:
    # a partial-agg rollup with no Window/Python.
    for g in ("span_first", "span_not"):
        d = _GATES[g][0](spark, "/root/testdata/sf0.001")
        plan = d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )
        checks.append(
            (
                f"{g}: pure scan-side — no join, no Window, no Python",
                "Join" not in plan
                and "Window" not in plan
                and "BatchEvalPython" not in plan
                and "ArrowEvalPython" not in plan,
                plan,
            )
        )
    d = _GATES["ngram_diversity"][0](spark, "/root/testdata/sf0.001")
    plan = d._sc._jvm.PythonSQLUtils.explainString(
        d._jdf.queryExecution(), "formatted"
    )
    checks.append(
        (
            "ngram_diversity: partial-agg rollup, no Window/Join/Python",
            "HashAggregate" in plan
            and "Window" not in plan
            and "Join" not in plan
            and "BatchEvalPython" not in plan
            and "ArrowEvalPython" not in plan,
            plan,
        )
    )

    failures = 0
    for name, ok, plan in checks:
        print(("PASS " if ok else "FAIL ") + name)
        if not ok:
            failures += 1
            print(plan[:4000])
    print(f"\n{failures} failures / {len(checks)} checks")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
