"""HTTP serving surface over the resident Searcher.

The reference's primary user entry points are FastAPI routes under
``/api`` (backend/app/api/routes.py): ``GET /api/search`` returning the
result envelope (routes.py:378-387 → search.py:119-126), plus crawler
status/statistics introspection (routes.py:268-307). This module serves
the SAME shapes from the Spark engine so a user of the reference can
point their frontend here unchanged:

* ``GET /api/search?query=...&page=N&per_page=M`` — the envelope from
  ``Searcher.search`` (identical dict, JSON-encoded). Extension:
  ``&mode=and`` for conjunctive semantics.
* ``GET /api/crawler/status`` — status + {urls_crawled, urls_failed,
  urls_in_queue} (routes.py:268-291). There is no crawler here (the
  input table is given, BASELINE input_hint), so status is "stopped"
  and the counts come from the index build manifests.
* ``GET /api/crawler/statistics`` — crawler_statistics +
  database_statistics {total_documents, total_terms,
  total_index_entries} (routes.py:294-307); index-derived.
* ``GET /api/suggest?word=...`` — the fuzzy vocab suggestion
  (extension; the reference frontend has no suggest route).
* ``GET /api/search?query=...&dbs=name1,name2`` — federated search
  over several registry versions/aliases under exact union-corpus
  statistics (operators/federate.py; extension). Each result carries
  the member name; mutually exclusive with search_after (member-local
  cursors don't compose into a global one). 404 on unknown members.
* ``GET /api/advanced?query=...&mode=boolean|phrase&k=K`` — the
  boolean (+must/-not/"phrase") and exact-phrase query surface with
  doc-attached results (extension; ``Searcher.boolean_envelope`` /
  ``phrase_envelope``, plan-chosen local/distributed like search).
* ``GET /api/similar?doc_id=N&k=K`` — More-Like-This envelope
  (related documents + the tf·idf selection terms; extension).
* ``GET /api/explain?query=...&doc_id=N`` — per-term score breakdown
  (Lucene Explanation analog; extension).
* ``GET /api/terms?prefix=...&k=K`` — terms enum: top-k (term, df)
  under an optional prefix (extension).
* ``GET /api/count?query=...&mode=or|and`` — exact match-set count
  under the full query surface (ES _count analog; extension).
* ``GET /api/highlight?query=...&doc_id=N&fragments=F&fragment_size=L``
  — multi-fragment highlighting (ES highlight analog; extension).
* ``GET /api/termvectors?doc_id=N[&positions=false]`` — per-doc term
  vector: tf, df, token positions (ES _termvectors analog; extension).
* ``GET /api/analyze?text=...`` — token stream under the index's
  analysis chain (ES _analyze analog; extension).
* ``GET /api/percolate?text=...`` — standing-query alert check against
  ``<index>/percolator.json`` (404 without a registry; extension).
* ``GET /api/databases`` / ``POST /api/databases/switch`` /
  ``DELETE /api/databases/<name>`` — multi-index version management
  (routes.py:62-115 shapes, secret-key gated; the SQLite files become
  named index directories — registry.IndexRegistry). Enabled when the
  server is constructed with a registry.
* ``POST /api/databases/upload?name=N`` / ``GET
  /api/databases/<name>/download`` — index import/export as gzipped
  tar artifacts (routes.py:117-130, 440-460; a .sqlite file there, a
  directory tree here; X-Secret-Key gated). At cluster scale an index
  moves via shared storage + ``IndexRegistry.add``; the artifact
  routes are the small/medium-index convenience.
* ``POST /api/crawler/start?mode=fresh|continue|recrawl`` / ``POST
  /api/crawler/stop`` — crawl control (routes.py:133-240): a
  background thread runs crawler.crawl round-by-round and ingests each
  round into the registry (build/append + merge policy + CURRENT
  switch — operators/lifecycle.ingest_round), hot-swapping the
  resident Searcher. Secret-key gated; stop lands at the next round
  boundary (rounds are atomic, continue resumes exactly there).
* ``GET /api/crawler/failed-urls`` — failed fetches with error +
  timestamp, newest first, capped 1000 (routes.py:406-431).
* ``GET /api/seed-urls`` / ``POST /api/seed-urls`` — persisted,
  API-editable seed list (routes.py:390-403); crawler/start without
  explicit seeds uses it.

Implementation: stdlib ThreadingHTTPServer (FastAPI/uvicorn aren't in
this environment — the handler layer is ~100 lines and the envelope
logic lives in operators/serving.py either way). Spark driver calls are
serialized behind one lock: the engine's concurrency lives in the
cluster, not in driver threads. Validation mirrors FastAPI's
(page ≥ 1, 1 ≤ per_page ≤ 50 → HTTP 422, routes.py:380-383).

The reference's WebSocket log tail (routes.py:310-322) has no analog —
there is no live crawl to tail; build progress is in the manifest files.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def _int_param(qs: dict, name: str, default: int) -> int:
    v = qs.get(name, [None])[0]
    if v is None:
        return default
    return int(v)  # ValueError → 422 by caller


SECRET_KEY = os.environ.get("USS_SECRET_KEY", "dev-secret-key")


class EngineState:
    """Resident engine handles shared by all request threads.

    With a registry, the active index follows the CURRENT pointer and
    ``switch`` hot-swaps the resident Searcher (the reference's
    setup_connections reload, connection.py:36-135)."""

    def __init__(
        self, spark, index_dir: str | None, registry=None,
        crawl_root: str | None = None,
    ):
        from uci_searchengine_spark.operators.serving import Searcher

        self.spark = spark
        self.registry = registry
        self.index_dir = index_dir if registry is None else registry.path()
        self.searcher = Searcher(spark, self.index_dir)
        self.lock = threading.Lock()
        self._stats_cache: dict | None = None
        # crawl workspace (HTTP crawl control requires a registry: the
        # ingest loop appends/builds registry versions)
        self.crawl_root = crawl_root or (
            os.path.join(registry.root, "_crawl")
            if registry is not None
            else os.path.join(
                os.path.dirname(os.path.abspath(self.index_dir)), "_crawl"
            )
        )
        self._crawl_thread: threading.Thread | None = None
        self._crawl_stop = threading.Event()
        self._crawl_error: str | None = None
        # crawl-control mutations get their own lock: self.lock is held
        # across Spark query jobs, and a start/stop request must not
        # queue behind a long-running search
        self._crawl_lock = threading.Lock()

    # ------------------------------------------------------ crawl control
    @property
    def crawler_running(self) -> bool:
        t = self._crawl_thread
        return t is not None and t.is_alive()

    def seed_urls_get(self) -> dict:
        p = os.path.join(self.crawl_root, "seeds.json")
        try:
            with open(p) as f:
                return {"seed_urls": json.load(f)}
        except OSError:
            return {"seed_urls": []}

    def seed_urls_set(self, urls: list[str]) -> dict:
        os.makedirs(self.crawl_root, exist_ok=True)
        p = os.path.join(self.crawl_root, "seeds.json")
        with open(p + ".tmp", "w") as f:
            json.dump([str(u) for u in urls], f)
        os.replace(p + ".tmp", p)
        return {"message": "Seed URLs updated"}

    def crawler_start(self, mode: str, seeds: list[str], params: dict) -> dict:
        """``POST /api/crawler/start`` (reference routes.py:133-219):
        fresh wipes the crawl workspace and builds a brand-NEW registry
        version from the seeds (the reference clears the database
        content — here old versions stay listed for retention, but the
        CURRENT index holds only the new crawl); continue resumes the
        persisted frontier (400 when there is no state or no frontier
        left), appending to the current version; recrawl resets crawl
        status (frontier/seen/manifests) but keeps the index —
        re-fetched urls upsert, auto-tombstoning the old generations.
        Crawled rounds are ingested round-by-round
        (operators/lifecycle.ingest_round: build/append + merge policy
        + CURRENT switch) and the resident Searcher reloads."""
        import shutil

        from uci_searchengine_spark.crawler import CrawlState

        with self._crawl_lock:
            return self._crawler_start_locked(
                mode, seeds, params, shutil, CrawlState
            )

    def _crawler_start_locked(
        self, mode, seeds, params, shutil, CrawlState
    ) -> dict:
        if self.crawler_running:
            raise ValueError("Crawler is already running")
        job_dir = os.path.join(self.crawl_root, "job")
        st = CrawlState(job_dir)
        if mode == "fresh":
            shutil.rmtree(job_dir, ignore_errors=True)
        elif mode == "recrawl":
            shutil.rmtree(st.state_dir, ignore_errors=True)
            shutil.rmtree(st.pages_dir, ignore_errors=True)
            for fn in ("_ingested.json", "_target.json"):
                try:
                    os.remove(os.path.join(job_dir, fn))
                except OSError:
                    pass
        elif mode == "continue":
            if not os.path.isdir(
                os.path.join(st.state_dir, "frontier.parquet")
            ):
                raise ValueError(
                    "No previous crawler state found to continue from"
                )
            ms = st.round_manifests()
            if ms and ms[-1]["frontier_after"] == 0:
                raise ValueError("No URLs found to continue crawling from")
        else:
            raise ValueError(
                "Invalid mode. Must be one of: fresh, continue, recrawl"
            )
        if mode in ("fresh", "recrawl") and not seeds:
            seeds = self.seed_urls_get()["seed_urls"]
            if not seeds:
                raise ValueError("seed_urls required (none persisted)")
        if mode == "fresh":
            # fresh builds a brand-new registry version; persist the
            # chosen name so a stop + continue keeps targeting it
            base = "crawl"
            name, n = base, 0
            while name in self.registry.available():
                n += 1
                name = f"{base}.{n}"
            os.makedirs(job_dir, exist_ok=True)
            with open(os.path.join(job_dir, "_target.json"), "w") as f:
                json.dump({"fresh_version": name}, f)
        self._crawl_stop.clear()
        self._crawl_error = None
        self._crawl_thread = threading.Thread(
            target=self._crawl_job, args=(seeds, params), daemon=True
        )
        self._crawl_thread.start()
        return {"message": f"Crawler started successfully in {mode} mode"}

    def _crawl_job(self, seeds: list[str], params: dict) -> None:
        from uci_searchengine_spark.crawler import CrawlState, crawl
        from uci_searchengine_spark.operators.lifecycle import ingest_round
        from uci_searchengine_spark.operators.serving import Searcher

        job_dir = os.path.join(self.crawl_root, "job")
        try:
            st = crawl(
                self.spark, seeds, job_dir,
                max_rounds=int(params.get("max_rounds", 5)),
                max_pages=int(params.get("max_pages", 10_000)),
                requests_per_second=float(
                    params.get("requests_per_second", 1.0)
                ),
                allow_pattern=params.get("allow_pattern"),
                respect_robots=bool(params.get("respect_robots", True)),
                stop_check=self._crawl_stop.is_set,
            )
            # ingest every round not yet applied to the registry
            ing_path = os.path.join(job_dir, "_ingested.json")
            try:
                with open(ing_path) as f:
                    done = int(json.load(f)["rounds"])
            except OSError:
                done = 0
            fresh_version = None
            try:
                with open(os.path.join(job_dir, "_target.json")) as f:
                    fresh_version = json.load(f).get("fresh_version")
            except OSError:
                pass
            n_rounds = len(st.round_manifests())
            for rnd in range(done, n_rounds):
                pages = self.spark.read.parquet(st.round_pages_dir(rnd))
                if fresh_version and fresh_version not in self.registry.available():
                    # first fresh round: build the new version, switch
                    from uci_searchengine_spark.operators.index_build import (
                        build_index,
                    )

                    build_index(
                        self.spark, pages,
                        os.path.join(self.registry.root, fresh_version),
                        num_shards=int(params.get("num_shards", 8)),
                        input_snapshot=f"crawl-round-{rnd}",
                    )
                    self.registry.switch(fresh_version)
                else:
                    ingest_round(
                        self.spark, pages, self.registry,
                        num_shards=int(params.get("num_shards", 8)),
                        input_snapshot=f"crawl-round-{rnd}",
                    )
                with open(ing_path + ".tmp", "w") as f:
                    json.dump({"rounds": rnd + 1}, f)
                os.replace(ing_path + ".tmp", ing_path)
                with self.lock:
                    self.index_dir = self.registry.path()
                    self.searcher = Searcher(self.spark, self.index_dir)
                    self._stats_cache = None
        except Exception as e:  # surfaced via /api/crawler/status
            self._crawl_error = f"{type(e).__name__}: {e}"

    def crawler_stop(self) -> dict:
        with self._crawl_lock:
            if not self.crawler_running:
                raise ValueError("Crawler is not running")
            self._crawl_stop.set()
        return {"message": "Crawler stopped successfully"}

    def failed_urls(self) -> dict:
        from uci_searchengine_spark.crawler import CrawlState

        st = CrawlState(os.path.join(self.crawl_root, "job"))
        return {"failed_urls": st.failed_urls(limit=1000)}

    # ------------------------------------------------- index management
    def databases(self) -> dict:
        r = self.registry
        return {
            "current": r.current(),
            "available": r.available(),
            "aliases": r.aliases(),
        }

    def switch(self, name: str) -> dict:
        from uci_searchengine_spark.operators.serving import Searcher

        r = self.registry
        with self.lock:
            r.switch(name)
            self.index_dir = r.path(name)
            self.searcher = Searcher(self.spark, self.index_dir)
            self._stats_cache = None
        return {"message": f"Switched to database: {name}"}

    def alias_set(self, alias: str, name: str) -> dict:
        """Create/repoint an alias (ES zero-downtime cutover): when the
        CURRENT pointer rode the alias's old target... the pointer
        tracks version names, so serving only changes if a client
        switches BY alias afterwards — the swap itself is metadata."""
        with self.lock:
            self.registry.alias_set(alias, name)
        return {"message": f"Alias {alias} -> {name}"}

    def alias_delete(self, alias: str) -> dict:
        with self.lock:
            self.registry.alias_delete(alias)
        return {"message": f"Deleted alias: {alias}"}

    def delete_index(self, name: str) -> dict:
        with self.lock:
            self.registry.delete(name)
        return {"message": f"Deleted database: {name}"}

    def export_index(self, name: str) -> bytes:
        """Index version → gzipped tar artifact (the reference's
        ``GET /databases/{name}/download``, routes.py:440-460 — a
        .sqlite file there, a directory tree here). For cluster-scale
        indexes the move is a shared-storage path + ``registry.add``;
        this artifact route is the small/medium-index convenience."""
        import io
        import tarfile

        src = self.registry.path(name)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            tf.add(src, arcname=name)
        return buf.getvalue()

    def import_index(self, name: str, payload: bytes) -> dict:
        """Gzipped tar artifact → registered index version (the
        reference's ``POST /databases/upload``, routes.py:117-130).
        Validates member paths (no absolute / parent-escape), requires
        a committed index (meta.json) at the archive root, rejects name
        collisions via ``registry.add``."""
        import io
        import shutil
        import tarfile
        import tempfile

        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid index name: {name!r}")
        tmp = tempfile.mkdtemp(prefix="_upload_", dir=self.registry.root)
        try:
            with tarfile.open(fileobj=io.BytesIO(payload), mode="r:gz") as tf:
                for m in tf.getmembers():
                    p = os.path.normpath(m.name)
                    if p.startswith(("/", "..")) or m.islnk() or m.issym():
                        raise ValueError(f"unsafe archive member: {m.name}")
                tf.extractall(tmp)
            # accept either a bare index tree or one top-level dir
            src = tmp
            if not os.path.isfile(os.path.join(src, "meta.json")):
                entries = [
                    e for e in os.listdir(src) if not e.startswith(".")
                ]
                if len(entries) == 1:
                    src = os.path.join(src, entries[0])
            self.registry.add(name, src, move=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return {"message": f"Uploaded database: {name}"}

    # ------------------------------------------------------------- endpoints
    def search(self, query: str, page: int, per_page: int, mode: str) -> dict:
        with self.lock:
            return self.searcher.search(
                query, page=page, per_page=per_page, mode=mode
            )

    def search_federated(
        self, query: str, page: int, per_page: int, mode: str,
        names: "list[str]",
    ) -> dict:
        """``GET /api/search?dbs=a,b`` — one query over several registry
        versions/aliases under exact union-corpus statistics
        (operators/federate.py). Requires a registry; each hit carries
        the member name it came from."""
        if self.registry is None:
            raise LookupError("federated search requires a registry")
        from uci_searchengine_spark.operators.federate import (
            federated_envelope,
        )

        dirs = [self.registry.path(n) for n in names]
        with self.lock:
            return federated_envelope(
                self.spark, dirs, query, page=page, per_page=per_page,
                mode=mode, labels=names,
            )

    def search_after(
        self, query: str, after, per_page: int, mode: str
    ) -> dict:
        """Cursor deep-pagination surface (ES search_after): ``after``
        is None (first page) or the previous envelope's next_cursor."""
        with self.lock:
            return self.searcher.search_after_envelope(
                query, after, per_page, mode
            )

    def advanced(
        self, query: str, mode: str, k: int, slop: int = 0,
        per_group: int = 1, w_title: float = 2.0, w_text: float = 1.0,
        variant: str = "bm25f", tie_breaker: float = 0.0,
    ) -> dict:
        """Boolean / phrase / collapse / fields query surface (extension
        route): doc-attached top-k from the plan-chosen Searcher
        envelope. ``slop`` applies to mode=phrase only (ordered
        proximity); ``per_group`` to mode=collapse (host-crowding);
        ``w_title``/``w_text``/``variant`` to mode=fields (multi-field
        ranking, operators/multifield.py)."""
        with self.lock:
            if mode == "phrase":
                return self.searcher.phrase_envelope(query, k=k, slop=slop)
            if mode == "collapse":
                return self.searcher.collapsed_envelope(
                    query, k=k, per_group=per_group
                )
            if mode == "fields":
                return self.searcher.fields_envelope(
                    query, k=k, w_title=w_title, w_text=w_text,
                    variant=variant, tie_breaker=tie_breaker,
                )
            return self.searcher.boolean_envelope(query, k=k)

    def percolate(self, text: str) -> dict:
        """Standing-query alert check for ONE document text: queries are
        registered in ``<index>/percolator.json`` ({"qid": "query", ...});
        404-shaped error when no registry file exists. Matching runs the
        python twin of the batch column predicates
        (operators/percolate.py — analyzer matched to the index)."""
        import os as _os

        from uci_searchengine_spark.operators.bm25 import analyze_seq
        from uci_searchengine_spark.operators.percolate import (
            compile_queries,
            percolate_text,
        )

        p = _os.path.join(self.index_dir, "percolator.json")
        if not _os.path.exists(p):
            raise FileNotFoundError("no percolator.json registered")
        with self.lock:
            reg = json.loads(open(p).read())
            compiled = compile_queries(
                reg, analyze=lambda s: analyze_seq(self.searcher.meta, s)
            )
            return {
                "matches": percolate_text(
                    compiled, text,
                    analyze=lambda s: analyze_seq(self.searcher.meta, s),
                ),
                "registered": len(reg),
            }

    def terms(self, prefix: str, k: int) -> dict:
        """Terms-enum route (extension): top-k vocabulary terms by df."""
        with self.lock:
            return {
                "prefix": prefix,
                "terms": self.searcher.term_stats(prefix, k),
            }

    def explain(self, query: str, doc_id: int) -> dict:
        """Score-explanation route (Lucene Explanation analog)."""
        with self.lock:
            return self.searcher.explain(query, doc_id)

    def count(self, query: str, mode: str) -> dict:
        """Count-only route (ES _count analog)."""
        with self.lock:
            return self.searcher.count(query, mode)

    def termvectors(self, doc_id: int, positions: bool) -> dict:
        """Per-doc term vector route (ES _termvectors analog)."""
        with self.lock:
            return self.searcher.term_vectors(doc_id, positions)

    def similar(self, doc_id: int, k: int) -> dict:
        """More-Like-This route (extension): doc-attached related
        documents + the selected terms."""
        with self.lock:
            return self.searcher.similar(doc_id, k=k)

    def analyze(self, text: str) -> dict:
        """ES _analyze analog: the token stream ``text`` produces under
        the CURRENT index's analysis chain (tokenize, stem iff the index
        was built with stem=True) — the introspection surface that
        explains why a query does or doesn't match. Pure driver-side
        (bm25.analyze_seq), no job."""
        from uci_searchengine_spark.operators.bm25 import analyze_seq

        with self.lock:
            meta = self.searcher.meta
        toks = analyze_seq(meta, text)
        return {
            "text": text,
            "stem": bool(getattr(meta, "stem", False)),
            "tokens": [
                {"token": t, "position": i} for i, t in enumerate(toks)
            ],
        }

    def suggest(self, word: str, k: int) -> dict:
        with self.lock:
            rows = self.searcher.suggest(word, k=k).collect()
        return {
            "word": word,
            "suggestions": [
                {"term": r["term"], "dist": r["dist"], "df": r["df"]} for r in rows
            ],
        }

    def status(self) -> dict:
        """routes.py:268-291 shape. With a live crawl workspace the
        counts come from the round manifests; otherwise the 'crawl' is
        the index build."""
        from uci_searchengine_spark.crawler import CrawlState

        st = CrawlState(os.path.join(self.crawl_root, "job"))
        out: dict = {
            "status": "running" if self.crawler_running else "stopped",
        }
        if os.path.isdir(st.state_dir):
            out["statistics"] = st.statistics()
        else:
            m = self._metrics()
            out["statistics"] = {
                "urls_crawled": m["docs"],
                "urls_failed": 0,
                "urls_in_queue": 0,
            }
        if self._crawl_error:
            out["error"] = self._crawl_error
        return out

    def statistics(self) -> dict:
        """routes.py:294-307 shape from index metadata (one Spark job on
        first call for vocab size / unique domains, then cached)."""
        m = self._metrics()
        if self._stats_cache is None:
            from pyspark.sql import functions as F

            with self.lock:
                seg = self.searcher._segments
                total_terms = seg.select("term").distinct().count()
                docs = self.searcher._docs
                unique_domains = (
                    docs.select(
                        F.parse_url(F.col("url"), F.lit("HOST")).alias("d")
                    )
                    .distinct()
                    .count()
                )
            self._stats_cache = {
                "total_terms": total_terms,
                "unique_domains": unique_domains,
            }
        meta = self.searcher.meta
        return {
            "crawler_statistics": {
                "status": "stopped",
                "urls_crawled": m["docs"],
                "urls_failed": 0,
                "unique_domains": self._stats_cache["unique_domains"],
                "urls_in_queue": 0,
            },
            "database_statistics": {
                "total_documents": meta.n_docs,
                "total_terms": self._stats_cache["total_terms"],
                "total_index_entries": m["postings"],
            },
        }

    def logs(self, cursor: int) -> dict:
        """Incremental build/crawl event tail — the reference streams
        crawler logs over a WebSocket (routes.py:310-337, payload
        {"message", "timestamp"}); the stdlib analog is a cursor poll:
        events = manifest commits newer than ``cursor`` (mtime_ns),
        next cursor = the max seen. The engine's manifests ARE its
        progress log (per-partition docs/postings/bytes), so the tail
        needs no side-channel logger."""
        import datetime as _dt

        from uci_searchengine_spark.operators.index_build import (
            generation_dirs,
        )

        events = []
        new_cursor = cursor
        mdirs = [
            os.path.join(d, "_manifest")
            for d in generation_dirs(self.index_dir)
        ]
        # live-crawl round commits are manifests too — the reference
        # tails crawler logs over its WebSocket; this is that feed
        mdirs.append(
            os.path.join(self.crawl_root, "job", "_crawl_state")
        )
        for mdir in mdirs:
            if not os.path.isdir(mdir):
                continue
            for fn in os.listdir(mdir):
                if not fn.endswith(".json"):
                    continue
                p = os.path.join(mdir, fn)
                st = os.stat(p)
                if st.st_mtime_ns <= cursor:
                    continue
                try:
                    with open(p) as f:
                        m = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                bits = [
                    f"{k}={m[k]}"
                    for k in (
                        "docs", "postings", "bytes", "rows", "n_docs",
                        "batch", "fetched_ok", "fetched_failed",
                        "frontier_after",
                    )
                    if m.get(k)
                ]
                events.append((st.st_mtime_ns, {
                    "message": f"{fn[:-5]} {m.get('status', 'committed')}"
                    + (f" ({', '.join(bits)})" if bits else ""),
                    "timestamp": _dt.datetime.fromtimestamp(
                        st.st_mtime_ns / 1e9, _dt.timezone.utc
                    ).isoformat(),
                }))
                new_cursor = max(new_cursor, st.st_mtime_ns)
        events.sort(key=lambda e: e[0])
        return {
            "cursor": new_cursor,
            "events": [e for _, e in events[-500:]],
        }

    def _metrics(self) -> dict:
        from uci_searchengine_spark.operators.index_build import build_metrics

        try:
            return build_metrics(self.index_dir)
        except FileNotFoundError:
            return {"partitions": 0, "docs": 0, "postings": 0, "bytes": 0}


class _Handler(BaseHTTPRequestHandler):
    engine: EngineState  # set on the handler class by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, obj, code: int = 200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _bytes(self, body: bytes, filename: str):
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header(
            "Content-Disposition", f'attachment; filename="{filename}"'
        )
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        return self.rfile.read(n) if n else b""

    def _ws_logs(self, qs) -> None:
        """``/api/crawler/ws`` — the reference's real-time crawler log
        WebSocket (routes.py:310-337): upgrade, then push every new
        build/crawl event as a ``{"message", "timestamp"}`` JSON text
        frame. The feed is the same manifest-commit tail the cursor
        poll serves (``EngineState.logs``); ``?cursor=`` picks the
        start (0 = replay the full tail first — the manifest log IS
        the backlog, so a late subscriber can still see the build).
        Client text is read and discarded exactly like the reference's
        ``receive_text()`` loop; PING is answered, CLOSE ends the
        stream."""
        import time as _time

        from uci_searchengine_spark import ws

        if not ws.handshake(self):
            return
        cursor = _int_param(qs, "cursor", 0)
        try:
            while True:
                out = self.engine.logs(cursor)
                cursor = out["cursor"]
                for ev in out["events"]:
                    ws.send_text(self.wfile, json.dumps(ev))
                # serve client frames (select-gated raw-socket reads —
                # a makefile() timeout would poison rfile) for one poll
                # interval, then re-poll the manifest tail
                deadline = _time.monotonic() + 1.0
                while _time.monotonic() < deadline:
                    if not ws.poll_client(
                        self.connection, self.wfile, 0.25
                    ):
                        return
        except (ConnectionError, OSError):
            return  # peer went away — same as the reference's cleanup

    def do_GET(self):  # noqa: N802 (stdlib API name)
        u = urlparse(self.path)
        qs = parse_qs(u.query)
        if u.path == "/api/crawler/ws":
            return self._ws_logs(qs)
        try:
            if u.path == "/api/search":
                query = qs.get("query", [None])[0]
                if query is None:
                    return self._json({"detail": "query is required"}, 422)
                page = _int_param(qs, "page", 1)
                per_page = _int_param(qs, "per_page", 10)
                mode = qs.get("mode", ["or"])[0]
                if page < 1 or not (1 <= per_page <= 50) or mode not in ("or", "and"):
                    return self._json({"detail": "invalid parameter"}, 422)
                dbs = qs.get("dbs", [None])[0]
                if dbs is not None:
                    # federated multi-index search (extension): dbs=
                    # comma-joined registry versions/aliases; exclusive
                    # with cursor paging (member-local cursors don't
                    # compose into one global cursor)
                    if "search_after" in qs:
                        return self._json(
                            {"detail": "dbs and search_after are "
                             "mutually exclusive"}, 422)
                    names = [n for n in dbs.split(",") if n]
                    if not names:
                        return self._json(
                            {"detail": "dbs must name at least one "
                             "index"}, 422)
                    try:
                        return self._json(
                            self.engine.search_federated(
                                query, page, per_page, mode, names
                            )
                        )
                    except LookupError as e:
                        return self._json({"detail": str(e)}, 404)
                cursor = qs.get("search_after", [None])[0]
                if cursor is not None:
                    # cursor paging excludes page= (ES rule: from/size
                    # and search_after are mutually exclusive)
                    if "page" in qs:
                        return self._json(
                            {"detail": "page and search_after are "
                             "mutually exclusive"}, 422)
                    try:
                        s, d = cursor.split(",")
                        after = (float(s), int(d))
                    except ValueError:
                        return self._json(
                            {"detail": "search_after must be "
                             "'score,doc_id'"}, 422)
                    return self._json(
                        self.engine.search_after(query, after, per_page, mode)
                    )
                return self._json(self.engine.search(query, page, per_page, mode))
            if u.path == "/api/advanced":
                query = qs.get("query", [None])[0]
                mode = qs.get("mode", ["boolean"])[0]
                k = _int_param(qs, "k", 10)
                if query is None:
                    return self._json({"detail": "query is required"}, 422)
                slop = _int_param(qs, "slop", 0)
                per_group = _int_param(qs, "per_group", 1)
                variant = qs.get("variant", ["bm25f"])[0]
                try:
                    w_title = float(qs.get("w_title", ["2.0"])[0])
                    w_text = float(qs.get("w_text", ["1.0"])[0])
                    tie_breaker = float(qs.get("tie_breaker", ["0.0"])[0])
                except ValueError:
                    return self._json({"detail": "invalid parameter"}, 422)
                if (
                    mode not in ("boolean", "phrase", "collapse", "fields")
                    or not (1 <= k <= 50)
                    or not (0 <= slop <= 50)
                    or not (1 <= per_group <= 10)
                    or variant
                    not in ("bm25f", "most_fields", "concat", "dis_max")
                    or not (0.0 <= w_title <= 100.0)
                    or not (0.0 <= w_text <= 100.0)
                    or not (0.0 <= tie_breaker <= 1.0)
                ):
                    return self._json({"detail": "invalid parameter"}, 422)
                return self._json(
                    self.engine.advanced(
                        query, mode, k, slop, per_group, w_title, w_text,
                        variant, tie_breaker,
                    )
                )
            if u.path == "/api/suggest":
                word = qs.get("word", [None])[0]
                if not word:
                    return self._json({"detail": "word is required"}, 422)
                return self._json(self.engine.suggest(word, _int_param(qs, "k", 5)))
            if u.path == "/api/percolate":
                text = qs.get("text", [None])[0]
                if not text:
                    return self._json({"detail": "text is required"}, 422)
                try:
                    return self._json(self.engine.percolate(text))
                except FileNotFoundError as e:
                    return self._json({"detail": str(e)}, 404)
            if u.path == "/api/terms":
                prefix = qs.get("prefix", [""])[0]
                k = _int_param(qs, "k", 20)
                if not (1 <= k <= 1000):
                    return self._json({"detail": "invalid parameter"}, 422)
                return self._json(self.engine.terms(prefix, k))
            if u.path == "/api/explain":
                query = qs.get("query", [None])[0]
                raw = qs.get("doc_id", [None])[0]
                if query is None or raw is None:
                    return self._json(
                        {"detail": "query and doc_id are required"}, 422
                    )
                return self._json(self.engine.explain(query, int(raw)))
            if u.path == "/api/count":
                query = qs.get("query", [None])[0]
                mode = qs.get("mode", ["or"])[0]
                if query is None or mode not in ("or", "and"):
                    return self._json({"detail": "invalid parameter"}, 422)
                return self._json(self.engine.count(query, mode))
            if u.path == "/api/highlight":
                query = qs.get("query", [None])[0]
                raw = qs.get("doc_id", [None])[0]
                if query is None or raw is None:
                    return self._json(
                        {"detail": "query and doc_id are required"}, 422
                    )
                n_frags = _int_param(qs, "fragments", 3)
                frag_len = _int_param(qs, "fragment_size", 120)
                if not (1 <= n_frags <= 10) or not (20 <= frag_len <= 500):
                    return self._json({"detail": "invalid parameter"}, 422)
                with self.engine.lock:
                    return self._json(
                        self.engine.searcher.highlight(
                            query, int(raw), n_frags, frag_len
                        )
                    )
            if u.path == "/api/termvectors":
                raw = qs.get("doc_id", [None])[0]
                if raw is None:
                    return self._json({"detail": "doc_id is required"}, 422)
                positions = qs.get("positions", ["true"])[0] != "false"
                return self._json(
                    self.engine.termvectors(int(raw), positions)
                )
            if u.path == "/api/analyze":
                text = qs.get("text", [None])[0]
                if text is None:
                    return self._json({"detail": "text is required"}, 422)
                return self._json(self.engine.analyze(text))
            if u.path == "/api/similar":
                raw = qs.get("doc_id", [None])[0]
                if raw is None:
                    return self._json({"detail": "doc_id is required"}, 422)
                k = _int_param(qs, "k", 10)
                if not (1 <= k <= 50):
                    return self._json({"detail": "invalid parameter"}, 422)
                return self._json(self.engine.similar(int(raw), k))
            if u.path == "/api/crawler/logs":
                return self._json(
                    self.engine.logs(_int_param(qs, "cursor", 0))
                )
            if u.path == "/api/crawler/status":
                return self._json(self.engine.status())
            if u.path == "/api/crawler/failed-urls":
                return self._json(self.engine.failed_urls())
            if u.path == "/api/seed-urls":
                return self._json(self.engine.seed_urls_get())
            if (
                u.path.startswith("/api/databases/")
                and u.path.endswith("/download")
                and self.engine.registry is not None
            ):
                if self.headers.get("X-Secret-Key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                name = u.path[len("/api/databases/") : -len("/download")]
                if name not in self.engine.registry.available():
                    return self._json({"detail": "Database not found"}, 404)
                return self._bytes(
                    self.engine.export_index(name), f"{name}.tar.gz"
                )
            if u.path == "/api/crawler/statistics":
                return self._json(self.engine.statistics())
            if u.path == "/api/databases" and self.engine.registry is not None:
                return self._json(self.engine.databases())
            if u.path == "/api/health":
                # snapshot under the engine lock: a concurrent
                # /api/databases/switch swaps searcher + index_dir, and
                # reading them racily could pair the old searcher with
                # the new dir
                with self.engine.lock:
                    s = self.engine.searcher
                    index_dir = self.engine.index_dir
                return self._json(
                    {
                        "ok": True,
                        "index": index_dir,
                        "n_docs": int(s.meta.n_docs),
                        "generations": int(getattr(s.meta, "gens", 1)),
                        "query_cache_hits": int(s.cache_hits),
                        "last_plan": s.last_plan,
                    }
                )
            return self._json({"detail": "Not Found"}, 404)
        except ValueError:
            return self._json({"detail": "invalid parameter"}, 422)
        except Exception as e:  # engine errors surface as 500 JSON
            return self._json({"detail": str(e)}, 500)

    def do_POST(self):  # noqa: N802
        u = urlparse(self.path)
        qs = parse_qs(u.query)
        try:
            if u.path == "/api/databases/switch" and self.engine.registry is not None:
                body = json.loads(self._body() or b"{}")
                if body.get("secret_key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                name = self.engine.registry.resolve(body.get("db_name"))
                if name not in self.engine.registry.available():
                    return self._json({"detail": "Database not found"}, 404)
                return self._json(self.engine.switch(name))
            if (
                u.path == "/api/databases/aliases"
                and self.engine.registry is not None
            ):
                body = json.loads(self._body() or b"{}")
                if body.get("secret_key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                alias, name = body.get("alias"), body.get("db_name")
                if not alias or not name:
                    return self._json(
                        {"detail": "alias and db_name are required"}, 422
                    )
                try:
                    return self._json(self.engine.alias_set(alias, name))
                except LookupError:
                    return self._json({"detail": "Database not found"}, 404)
                except ValueError as e:
                    return self._json({"detail": str(e)}, 400)
            if u.path == "/api/databases/upload" and self.engine.registry is not None:
                # ALWAYS drain the request body before any rejection:
                # answering 401/422 while the client is still streaming
                # a large artifact closes the socket mid-write and the
                # client sees EPIPE instead of the status (standard
                # HTTP-server practice for body-carrying error paths)
                body = self._body()
                if self.headers.get("X-Secret-Key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                name = qs.get("name", [None])[0]
                if not name:
                    return self._json({"detail": "name is required"}, 422)
                try:
                    return self._json(self.engine.import_index(name, body))
                except FileExistsError as e:
                    return self._json({"detail": str(e)}, 409)
                except ValueError as e:
                    return self._json({"detail": str(e)}, 400)
            if u.path == "/api/crawler/start" and self.engine.registry is not None:
                body = json.loads(self._body() or b"{}")
                if body.get("secret_key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                mode = qs.get("mode", [body.get("mode")])[0]
                if not mode:
                    return self._json({"detail": "mode is required"}, 422)
                try:
                    return self._json(
                        self.engine.crawler_start(
                            mode,
                            list(body.get("seed_urls") or []),
                            dict(body.get("params") or {}),
                        )
                    )
                except ValueError as e:
                    return self._json({"detail": str(e)}, 400)
            if u.path == "/api/crawler/stop" and self.engine.registry is not None:
                body = json.loads(self._body() or b"{}")
                if body.get("secret_key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                try:
                    return self._json(self.engine.crawler_stop())
                except ValueError as e:
                    return self._json({"detail": str(e)}, 400)
            if u.path == "/api/seed-urls":
                body = json.loads(self._body() or b"{}")
                if body.get("secret_key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                urls = body.get("seed_urls")
                if not isinstance(urls, list):
                    return self._json({"detail": "seed_urls list required"}, 422)
                return self._json(self.engine.seed_urls_set(urls))
            return self._json({"detail": "Not Found"}, 404)
        except Exception as e:
            return self._json({"detail": str(e)}, 500)

    def do_DELETE(self):  # noqa: N802
        u = urlparse(self.path)
        try:
            if (
                u.path.startswith("/api/databases/aliases/")
                and self.engine.registry is not None
            ):
                if self.headers.get("X-Secret-Key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                alias = u.path.rsplit("/", 1)[-1]
                try:
                    return self._json(self.engine.alias_delete(alias))
                except LookupError:
                    return self._json({"detail": "Alias not found"}, 404)
            if (
                u.path.startswith("/api/databases/")
                and self.engine.registry is not None
            ):
                if self.headers.get("X-Secret-Key") != SECRET_KEY:
                    return self._json({"detail": "Invalid secret key"}, 401)
                name = u.path.rsplit("/", 1)[-1]
                r = self.engine.registry
                if name not in r.available():
                    return self._json({"detail": "Database not found"}, 404)
                if name == r.current():
                    return self._json(
                        {"detail": "Cannot delete current database"}, 400
                    )
                if r.default and name == r.default:
                    return self._json(
                        {"detail": "Cannot delete default database"}, 400
                    )
                try:
                    return self._json(self.engine.delete_index(name))
                except PermissionError as e:
                    # an alias still points here (ES parity: repoint or
                    # drop the alias first)
                    return self._json({"detail": str(e)}, 400)
            return self._json({"detail": "Not Found"}, 404)
        except Exception as e:
            return self._json({"detail": str(e)}, 500)


def make_server(
    spark, index_dir: str | None, host: str = "127.0.0.1", port: int = 8080,
    registry=None, crawl_root: str | None = None,
):
    """Build (don't start) the HTTP server — ``.serve_forever()`` to run,
    ``.shutdown()`` to stop. Port 0 picks an ephemeral port (tests).
    ``registry``: an IndexRegistry enabling the /api/databases and
    crawl-control routes; the active index then follows the registry's
    CURRENT pointer. ``crawl_root``: crawl workspace directory (default
    ``<registry.root>/_crawl``)."""
    engine = EngineState(spark, index_dir, registry=registry, crawl_root=crawl_root)
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Serve a built index over HTTP")
    ap.add_argument("--index", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--master", default="local[*]")
    args = ap.parse_args(argv)
    from uci_searchengine_spark.session import get_spark

    spark = get_spark(master=args.master)
    srv = make_server(spark, args.index, args.host, args.port)
    print(f"serving {args.index} on http://{args.host}:{srv.server_address[1]}/api/search")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()


if __name__ == "__main__":
    main()
