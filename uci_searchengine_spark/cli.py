"""CLI entry point — run via spark-submit or plain python.

    spark-submit --py-files uci_searchengine_spark.zip -m ... OR
    python -m uci_searchengine_spark.cli build  --pages <parquet> --index <dir>
    python -m uci_searchengine_spark.cli synth  --n 50000 --out <parquet>
    python -m uci_searchengine_spark.cli query  --index <dir> --q "terms..." [--k 10]
    python -m uci_searchengine_spark.cli metrics --index <dir>

On a cluster: package the module (`zip -r uci_searchengine_spark.zip
uci_searchengine_spark`) and pass `--py-files`; everything here only uses
SparkSession + shared-storage paths, so the same commands run on
multi-executor deployments (north_rule: spark-submit --py-files).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="uci-searchengine-spark")
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sy = sub.add_parser("synth", help="generate the synthetic pages corpus")
    sy.add_argument("--n", type=int, required=True)
    sy.add_argument("--seed", type=int, default=1337)
    sy.add_argument("--out", required=True)
    sy.add_argument(
        "--format",
        choices=["parquet", "iceberg"],
        default="parquet",
        help="table format for the pages corpus (iceberg degrades to "
        "parquet when the runtime JAR is absent)",
    )

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--pages", required=True, help="pages table path/identifier")
    b.add_argument("--index", required=True)
    b.add_argument("--shards", type=int, default=32)
    b.add_argument(
        "--buckets",
        type=int,
        default=None,
        help="doc-range bucket count (default: derived from corpus size)",
    )
    b.add_argument("--snapshot", default=None)
    b.add_argument(
        "--format",
        choices=["parquet", "iceberg", "warc"],
        default="parquet",
        help="format of the input pages: a table (parquet/iceberg) or "
        "a dir/glob of Common-Crawl-style .warc(.gz) segment files",
    )
    b.add_argument(
        "--stem", action="store_true", help="Porter-stem tokens at build"
    )
    b.add_argument(
        "--positions",
        action="store_true",
        help="store the positional plane (index-only phrase matching)",
    )

    q = sub.add_parser("query", help="BM25 top-k search")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--scorer", choices=["wand", "naive"], default="wand")
    q.add_argument(
        "--mode",
        choices=["or", "and", "phrase", "bool", "fuzzy", "regexp", "fields"],
        default="or",
        help="or/and = BM25 envelope; phrase = exact sequence (or "
        "--slop proximity); bool = +must/-not/\"phrase\" syntax; "
        "fuzzy/regexp = word~N / /pat/ multi-term rewrites; "
        "fields = multi-field title^w/text ranking (--w-title/--variant)",
    )
    q.add_argument(
        "--w-title", type=float, default=2.0,
        help="fields mode: title field weight",
    )
    q.add_argument(
        "--variant", choices=["bm25f", "most_fields", "concat", "dis_max"],
        default="bm25f", help="fields mode: combination semantics",
    )
    q.add_argument(
        "--tie-breaker", type=float, default=0.0,
        help="fields mode, dis_max variant: tie-breaker in [0, 1]",
    )
    q.add_argument(
        "--slop", type=int, default=0,
        help="phrase mode: ordered-proximity gap budget (0 = exact)",
    )
    q.add_argument(
        "--msm", default=None,
        help="minimum_should_match for or mode: int, negative int, "
        "or 'P%%' (ES rules)",
    )

    m = sub.add_parser("metrics", help="print build metrics from manifests")
    m.add_argument("--index", required=True)

    pc = sub.add_parser(
        "percolate",
        help="match a pages table against standing queries "
        "(JSON {qid: query}); prints (query_id, url) matches",
    )
    pc.add_argument("--pages", required=True)
    pc.add_argument("--queries", required=True, help="path to queries JSON")
    pc.add_argument("--out", default=None, help="optional parquet output dir")
    pc.add_argument("--master", default=None)

    ck = sub.add_parser(
        "checkindex",
        help="structural integrity check (Lucene CheckIndex analog): "
        "decode every posting list, verify block fences + block-max "
        "admissibility, doc-store order, df/meta consistency",
    )
    ck.add_argument("--index", required=True)
    ck.add_argument("--master", default=None)

    ap = sub.add_parser("append", help="append pages as a new generation (upsert)")
    ap.add_argument("--pages", required=True)
    ap.add_argument("--index", required=True)
    ap.add_argument("--format", choices=["parquet", "iceberg"], default="parquet")
    ap.add_argument("--snapshot", default="append")

    dl = sub.add_parser("delete", help="tombstone doc ids")
    dl.add_argument("--index", required=True)
    dl.add_argument("--ids", required=True, help="comma-separated doc ids")

    cp = sub.add_parser("compact", help="rebuild live docs into a fresh index")
    cp.add_argument("--index", required=True)
    cp.add_argument("--out", required=True)

    mg = sub.add_parser(
        "merge",
        help="merge generations+tombstones without re-tokenizing "
        "(decode→concat→repack; doc ids preserved)",
    )
    mg.add_argument("--index", required=True)
    mg.add_argument("--out", required=True)

    ig = sub.add_parser(
        "ingest",
        help="apply a page-delta parquet to a registry's current index: "
        "first delta builds, later ones append; the tiered merge policy "
        "folds debt into a new version and switches CURRENT",
    )
    ig.add_argument("--pages", required=True, help="delta pages parquet dir")
    ig.add_argument("--registry", required=True, help="index registry root")
    ig.add_argument("--num-shards", type=int, default=8)
    ig.add_argument("--max-gens", type=int, default=4)
    ig.add_argument("--snapshot", default="ingest")

    cr = sub.add_parser("crawl", help="BFS crawl from seed urls (per-domain politeness, robots, resume)")
    cr.add_argument("--seeds", required=True, help="comma-separated seed urls")
    cr.add_argument("--out", required=True, help="crawl state + pages output dir")
    cr.add_argument("--max-rounds", type=int, default=5)
    cr.add_argument("--max-pages", type=int, default=10_000)
    cr.add_argument("--rps", type=float, default=1.0, help="per-domain requests/sec")
    cr.add_argument("--allow", default=None, help="regex url allowlist")
    cr.add_argument("--no-robots", action="store_true")
    cr.add_argument("--master", default=None)

    et = sub.add_parser(
        "export-training",
        help="run the composed training-data pipeline (filter -> dedup "
        "-> decontaminate -> split -> mixture -> pack) over a testdata-"
        "shaped corpus dir and write the result as parquet",
    )
    et.add_argument("--sf-dir", required=True, help="dir with documents.parquet etc.")
    et.add_argument("--out", required=True, help="output parquet path")
    et.add_argument(
        "--stage",
        default="training_prep_v3",
        choices=["training_prep", "training_prep_v2", "training_prep_v3"],
        help="which pipeline stage's output to materialize (v3 = packed "
        "512-token sequences, v2 = filtered/deduped/split docs)",
    )
    et.add_argument("--master", default=None)

    ev = sub.add_parser(
        "evaluate",
        help="trec_eval-style retrieval metrics (recall/prec/MRR/nDCG@k) "
        "for a run file vs graded qrels",
    )
    ev.add_argument("--runs", required=True, help="parquet (qid, doc_id, rank)")
    ev.add_argument("--qrels", required=True, help="parquet (qid, doc_id, rel)")
    ev.add_argument("--k", type=int, default=10)
    ev.add_argument("--out", help="optional parquet path for per-topic rows")
    ev.add_argument("--master", default=None)

    sv = sub.add_parser("serve", help="HTTP API over a built index (/api/search ...)")
    g = sv.add_mutually_exclusive_group(required=True)
    g.add_argument("--index", help="serve ONE immutable index directory")
    g.add_argument(
        "--registry",
        help="serve a version registry root: enables /api/databases "
        "switch/upload/download AND the crawl-control routes "
        "(/api/crawler/start|stop, /api/seed-urls)",
    )
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--master", default=None)

    args = p.parse_args(argv)

    if args.cmd == "metrics":
        from uci_searchengine_spark.operators.index_build import build_metrics

        print(json.dumps(build_metrics(args.index)))
        return 0
    if args.cmd == "delete":
        from uci_searchengine_spark.operators.tombstones import delete_docs

        total = delete_docs(args.index, [int(x) for x in args.ids.split(",")])
        print(json.dumps({"tombstones_total": total}))
        return 0

    from uci_searchengine_spark.session import get_spark

    spark = get_spark(master=args.master)
    try:
        if args.cmd == "crawl":
            from uci_searchengine_spark.crawler import crawl

            st = crawl(
                spark,
                args.seeds.split(","),
                args.out,
                max_rounds=args.max_rounds,
                max_pages=args.max_pages,
                requests_per_second=args.rps,
                allow_pattern=args.allow,
                respect_robots=not args.no_robots,
            )
            print(json.dumps(st.statistics()))
        elif args.cmd == "export-training":
            from uci_searchengine_spark.entry_queries import QUERIES

            df = QUERIES[args.stage][0](spark, args.sf_dir)
            df.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(json.dumps({"written": args.out, "stage": args.stage, "rows": n}))
        elif args.cmd == "evaluate":
            from uci_searchengine_spark.operators.eval_metrics import (
                macro_metrics,
                retrieval_metrics,
            )

            per = retrieval_metrics(
                spark.read.parquet(args.runs),
                spark.read.parquet(args.qrels),
                k=args.k,
            )
            if args.out:
                per.write.mode("overwrite").parquet(args.out)
            print(
                json.dumps(
                    macro_metrics(per, k=args.k).collect()[0].asDict()
                )
            )
        elif args.cmd == "serve":
            from uci_searchengine_spark.http_api import make_server

            reg = None
            if args.registry:
                from uci_searchengine_spark.registry import IndexRegistry

                reg = IndexRegistry(args.registry)
            srv = make_server(
                spark, args.index, args.host, args.port, registry=reg
            )
            print(f"http://{args.host}:{srv.server_address[1]}/api/search", flush=True)
            srv.serve_forever()
        elif args.cmd == "synth":
            from uci_searchengine_spark.sources.synth import synth_pages
            from uci_searchengine_spark.sources.tables import write_table

            used = write_table(
                synth_pages(spark, args.n, args.seed), args.out, fmt=args.format
            )
            print(json.dumps({"written": args.out, "n": args.n, "format": used}))
        elif args.cmd == "build":
            from uci_searchengine_spark.operators.index_build import build_index
            from uci_searchengine_spark.sources.tables import read_table

            if args.format == "warc":
                from uci_searchengine_spark.sources.warc import read_warc

                pages_df = read_warc(spark, args.pages).drop("warc_path")
            else:
                pages_df = read_table(spark, args.pages, fmt=args.format)
            meta = build_index(
                spark,
                pages_df,
                args.index,
                num_shards=args.shards,
                n_buckets=args.buckets,
                input_snapshot=args.snapshot or f"{args.format}:{args.pages}",
                stem=args.stem,
                positions=args.positions,
            )
            print(meta.to_json())
        elif args.cmd == "append":
            from uci_searchengine_spark.operators.index_append import append_index
            from uci_searchengine_spark.sources.tables import read_table

            meta = append_index(
                spark,
                read_table(spark, args.pages, fmt=args.format),
                args.index,
                input_snapshot=args.snapshot,
            )
            print(meta.to_json())
        elif args.cmd == "compact":
            from uci_searchengine_spark.operators.compact import compact_index

            meta = compact_index(spark, args.index, args.out)
            print(meta.to_json())
        elif args.cmd == "percolate":
            from uci_searchengine_spark.functions.extract import extract_pages
            from uci_searchengine_spark.functions.tokenize import tokens_col
            from uci_searchengine_spark.operators.percolate import percolate

            from pyspark.sql import functions as F

            queries = json.load(open(args.queries))
            pages = spark.read.parquet(args.pages)
            docs = extract_pages(pages).select(
                "url", tokens_col(F.col("extracted_text")).alias("t")
            )
            hits = percolate(docs, queries, id_col="url")
            if args.out:
                hits.write.mode("overwrite").parquet(args.out)
                print(json.dumps({"out": args.out, "matches": hits.count()}))
            else:
                for r in hits.collect():
                    print(json.dumps({"query_id": r["query_id"], "url": r["url"]}))
        elif args.cmd == "checkindex":
            from uci_searchengine_spark.operators.checkindex import check_index

            rep = check_index(spark, args.index)
            print(json.dumps(rep))
            return 0 if rep["ok"] else 1
        elif args.cmd == "merge":
            from uci_searchengine_spark.operators.merge import merge_generations

            meta = merge_generations(spark, args.index, args.out)
            print(meta.to_json())
        elif args.cmd == "ingest":
            import json as _json

            from uci_searchengine_spark.operators.lifecycle import ingest_round
            from uci_searchengine_spark.registry import IndexRegistry

            reg = IndexRegistry(args.registry)
            cur = ingest_round(
                spark, spark.read.parquet(args.pages), reg,
                num_shards=args.num_shards, max_gens=args.max_gens,
                input_snapshot=args.snapshot,
            )
            print(_json.dumps(
                {"current": cur, "available": reg.available()}
            ))
        elif args.cmd == "query":
            from uci_searchengine_spark.operators.bm25 import search, score_naive
            from uci_searchengine_spark.operators.wand import score_wand

            if args.mode == "phrase":
                from uci_searchengine_spark.operators.phrase import phrase_search

                rows = phrase_search(
                    spark, args.index, args.q, args.k, slop=args.slop
                ).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            elif args.mode == "bool":
                from uci_searchengine_spark.operators.boolean import boolean_search

                rows = boolean_search(spark, args.index, args.q, args.k).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            elif args.mode == "fuzzy":
                from uci_searchengine_spark.operators.fuzzy import fuzzy_search

                rows = fuzzy_search(spark, args.index, args.q, args.k).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            elif args.mode == "regexp":
                from uci_searchengine_spark.operators.regexp import regexp_search

                rows = regexp_search(spark, args.index, args.q, args.k).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            elif args.mode == "fields":
                from uci_searchengine_spark.operators.multifield import (
                    score_fields,
                )

                rows = score_fields(
                    spark, args.index, args.q, w_title=args.w_title,
                    variant=args.variant, k=args.k,
                    tie_breaker=args.tie_breaker,
                ).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            elif args.msm is not None:
                from uci_searchengine_spark.operators.wand import score_msm

                spec = (
                    args.msm if args.msm.endswith("%") else int(args.msm)
                )
                rows = score_msm(
                    spark, args.index, args.q, args.k, min_should_match=spec
                ).collect()
                print(json.dumps([r.asDict() for r in rows], indent=2))
            else:
                scorer = score_wand if args.scorer == "wand" else score_naive
                print(
                    json.dumps(
                        search(
                            spark,
                            args.index,
                            args.q,
                            per_page=args.k,
                            scorer=scorer,
                            mode=args.mode,
                        ),
                        indent=2,
                    )
                )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
