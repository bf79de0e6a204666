"""Distributed crawl ingestion: fetch loop, per-domain politeness,
frontier management — the reference's defining feature
(backend/app/api/crawler.py:134-379, utils/rate_limiter.py:17-63),
re-expressed as Spark dataflow.

The reference crawls url-at-a-time from a driver-side deque with a
global RateLimiter keyed by domain. The Spark-first shape is BFS
ROUNDS over a frontier relation:

  round N:  frontier ──anti-join crawled/failed──▶ batch
            batch ──repartition BY DOMAIN──▶ fetch tasks
            fetch task: robots.txt gate + min-interval pacing + GET,
                        per domain, ALL LOCAL to the task
            ok rows ──▶ pages table (hive round=N partition dirs)
            links(ok) ──normalize/filter──▶ next frontier

**Per-domain politeness without coordination**: the batch is hash-
partitioned on domain, so every request to a domain lands in ONE task;
that task serializes them with the reference's min-interval rule
(rate_limiter.py:37-49 semantics). No distributed lock, no shared
state — the partitioning IS the rate limiter's correctness argument,
and it holds at any executor count. Skew (one huge domain) is bounded
by ``max_per_domain_per_round``: the per-round cap every polite
crawler needs anyway, so a domain of 10^9 pages costs rounds, not a
straggler task.

**Frontier management** is relational: discovered − crawled − failed −
in-flight, exactly the reference's four-set membership test
(crawler.py:245-252) as anti-joins. State (frontier + crawled + failed
+ per-round stats) checkpoints to parquet/JSON per round, so a killed
crawl resumes at the next round boundary — the crawler_state analog
(models.py:162-179).

**Fetching** is a pluggable boundary: the default fetcher is stdlib
``urllib.request`` (httpx isn't in this container; the interface is
one call — url in, (status, bytes) out). Tests run the REAL fetcher
against local HTTP servers (loopback works in-sandbox), covering
robots gating, 404 handling, pacing, and crawl→build→search e2e.
Output rows are the exact input_hint shape (url, warc_ts, html, text,
lang), so a finished crawl feeds ``build_index`` / ``append_index``
directly.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from collections.abc import Iterator
from dataclasses import dataclass
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uci_searchengine_spark.functions.extract import extract_one, normalize_url

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_FETCH_SCHEMA = (
    "url string, warc_ts timestamp, html binary, status int, error string"
)


class DomainRateLimiter:
    """min-interval pacing per domain (rate_limiter.py:37-49 semantics),
    with injectable clock/sleep for deterministic tests."""

    def __init__(self, requests_per_second: float = 1.0, clock=time.monotonic, sleep=time.sleep):
        self.min_interval = 1.0 / requests_per_second
        self.last: dict[str, float] = {}
        self._clock = clock
        self._sleep = sleep

    def wait(self, domain: str) -> None:
        now = self._clock()
        last = self.last.get(domain)
        if last is not None and now - last < self.min_interval:
            self._sleep(self.min_interval - (now - last))
        self.last[domain] = self._clock()


def default_fetcher(url: str, timeout: float = 10.0, user_agent: str = "uci-searchengine-spark") -> tuple[int, bytes]:
    """stdlib GET: (status, body). HTTP errors return their status with
    an empty body; transport errors raise (caller records the message)."""
    req = urllib.request.Request(url, headers={"User-Agent": user_agent})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, b""


def _robots_allowed(robots_cache: dict, url: str, fetcher, user_agent: str) -> bool:
    """robots.txt gate, fetched once per domain per task (stdlib
    robotparser). Unfetchable robots → allow (the reference crawls
    without a robots check at all; we gate but fail open)."""
    import urllib.robotparser

    p = urlparse(url)
    key = f"{p.scheme}://{p.netloc}"
    rp = robots_cache.get(key)
    if rp is None:
        rp = urllib.robotparser.RobotFileParser()
        try:
            status, body = fetcher(key + "/robots.txt")
            if status == 200:
                rp.parse(body.decode("utf-8", errors="replace").splitlines())
            else:
                rp.allow_all = True
        except Exception:
            rp.allow_all = True
        robots_cache[key] = rp
    return rp.can_fetch(user_agent, url)


def _fetch_fn(requests_per_second: float, user_agent: str, fetcher=None, respect_robots: bool = True):
    """Per-partition fetch pass: the partition holds whole domains, so
    pacing + robots caching are task-local dicts."""
    fetch = fetcher or default_fetcher

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        limiter = DomainRateLimiter(requests_per_second)
        robots: dict = {}
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                ts = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
                domain = urlparse(url).netloc
                try:
                    if respect_robots and not _robots_allowed(robots, url, fetch, user_agent):
                        rows.append((url, ts, b"", 0, "robots_disallowed"))
                        continue
                    limiter.wait(domain)
                    status, body = fetch(url)
                    if status == 200:
                        rows.append((url, ts, body, 200, None))
                    else:
                        rows.append((url, ts, b"", status, f"http_{status}"))
                except Exception as e:  # transport errors → failed row
                    rows.append((url, ts, b"", -1, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "status", "error"]
            )

    return run


@dataclass
class CrawlState:
    out_dir: str

    @property
    def pages_dir(self) -> str:
        return os.path.join(self.out_dir, "pages")

    @property
    def state_dir(self) -> str:
        return os.path.join(self.out_dir, "_crawl_state")

    def round_pages_dir(self, rnd: int) -> str:
        """One round's delta (hive ``round=N`` dir) — the unit an
        incremental consumer appends."""
        return os.path.join(self.pages_dir, f"round={rnd}")

    def round_manifests(self) -> list[dict]:
        if not os.path.isdir(self.state_dir):
            return []
        out = []
        for fn in sorted(os.listdir(self.state_dir)):
            if fn.startswith("round-") and fn.endswith(".json"):
                with open(os.path.join(self.state_dir, fn)) as f:
                    out.append(json.load(f))
        return out

    def statistics(self) -> dict:
        """routes.py:268-291 statistics shape from the round manifests."""
        ms = self.round_manifests()
        return {
            "urls_crawled": sum(m["fetched_ok"] for m in ms),
            "urls_failed": sum(m["fetched_failed"] for m in ms),
            "urls_in_queue": ms[-1]["frontier_after"] if ms else 0,
        }

    def failed_urls(self, limit: int = 1000) -> list[dict]:
        """Failed fetches, newest first, capped (routes.py:406-431's
        ``ORDER BY last_crawled_at DESC LIMIT 1000`` projection). Reads
        the per-round failed parquet driver-side (pyarrow — the failed
        set is bounded by the crawl budget, no Spark job needed for a
        debugging endpoint)."""
        import pyarrow.dataset as pads

        d = os.path.join(self.state_dir, "failed")
        if not os.path.isdir(d):
            return []
        pdf = (
            pads.dataset(d, format="parquet", partitioning="hive")
            .to_table(columns=["url", "warc_ts", "status", "error"])
            .to_pandas()
            .sort_values("warc_ts", ascending=False)
            .head(limit)
        )
        return [
            {
                "url": r.url,
                "error": r.error if r.error else f"HTTP {r.status}",
                "failed_at": r.warc_ts.isoformat(),
            }
            for r in pdf.itertuples(index=False)
        ]


def crawl(
    spark: SparkSession,
    seeds: list[str],
    out_dir: str,
    *,
    max_rounds: int = 5,
    max_pages: int = 10_000,
    max_per_domain_per_round: int = 1_000,
    requests_per_second: float = 1.0,
    allow_pattern: str | None = None,
    user_agent: str = "uci-searchengine-spark",
    fetcher=None,
    respect_robots: bool = True,
    fetch_partitions: int | None = None,
    stop_check=None,
) -> CrawlState:
    """Run BFS crawl rounds from ``seeds``; returns the state handle.
    Resumable: rerunning with the same ``out_dir`` continues from the
    persisted frontier and skips crawled/failed urls. ``stop_check``:
    zero-arg callable polled at each round boundary — returning True
    ends the crawl cleanly after the committed round (the HTTP
    ``POST /api/crawler/stop`` hook; rounds are atomic, so a stopped
    crawl resumes exactly where it left off in ``continue`` mode)."""
    st = CrawlState(out_dir)
    os.makedirs(st.state_dir, exist_ok=True)
    fetch_partitions = fetch_partitions or spark.sparkContext.defaultParallelism

    done = st.round_manifests()
    start_round = len(done)
    total_ok = sum(m["fetched_ok"] for m in done)

    frontier_path = os.path.join(st.state_dir, "frontier.parquet")
    seen_path = os.path.join(st.state_dir, "seen.parquet")  # crawled+failed
    if start_round == 0 and (seeds or not os.path.isdir(frontier_path)):
        # don't clobber a persisted frontier with an empty seed list —
        # a 'continue' before the first round commit resumes it as-is
        seed_urls = sorted({normalize_url(u) for u in seeds})
        spark.createDataFrame(
            [(u,) for u in seed_urls], "url string"
        ).coalesce(1).write.mode("overwrite").parquet(frontier_path)

    for rnd in range(start_round, max_rounds):
        if total_ok >= max_pages:
            break
        if stop_check is not None and stop_check():
            break
        frontier = spark.read.parquet(frontier_path)
        if os.path.isdir(seen_path):
            seen = spark.read.parquet(seen_path)
            frontier = frontier.join(seen, "url", "left_anti")
        if allow_pattern:
            frontier = frontier.filter(F.col("url").rlike(allow_pattern))
        # per-domain round cap: bounds the skew of any one domain's task
        # AND the politeness debt per round
        w = F.row_number().over(
            Window.partitionBy(F.parse_url(F.col("url"), F.lit("AUTHORITY"))).orderBy("url")
        )
        batch = (
            frontier.withColumn("_rn", w)
            .filter(F.col("_rn") <= max_per_domain_per_round)
            .drop("_rn")
            .limit(max(0, max_pages - total_ok))
        )
        n_batch = batch.count()
        if n_batch == 0:
            break
        # one task owns a domain ⇒ its pacing is locally correct
        fetched = (
            batch.repartition(fetch_partitions, F.parse_url(F.col("url"), F.lit("AUTHORITY")))
            .mapInPandas(
                _fetch_fn(requests_per_second, user_agent, fetcher, respect_robots),
                schema=_FETCH_SCHEMA,
            )
        ).cache()
        ok = fetched.filter(F.col("status") == 200)
        failed = fetched.filter(F.col("status") != 200)

        # extract text + links once, Arrow-batched (pinned extractor)
        def ex(batches):
            for pdf in batches:
                rows = []
                for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                    body = bytes(html)
                    _title, text, links = extract_one(body, url)
                    rows.append((url, ts, body, text, "en", links))
                yield pd.DataFrame(
                    rows,
                    columns=["url", "warc_ts", "html", "text", "lang", "links"],
                )

        enriched = ok.select("url", "warc_ts", "html").mapInPandas(
            ex, schema=PAGES_SCHEMA + ", links array<string>"
        ).cache()
        (
            # hive round= partitioning: the whole table reads as one
            # pages relation, and incremental consumers (append_index per
            # round, or a Structured Streaming file source discovering
            # new round dirs) address each round's delta directly
            enriched.select("url", "warc_ts", "html", "text", "lang")
            .write.mode("overwrite")
            .parquet(os.path.join(st.pages_dir, f"round={rnd}"))
        )
        n_ok = enriched.count()
        n_failed = failed.count()
        if n_failed:
            # persist failed rows (url, status, error, timestamp) per
            # round — the reference's main debugging surface
            # (GET /api/crawler/failed-urls, routes.py:406-431)
            failed.select("url", "warc_ts", "status", "error").coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(st.state_dir, "failed", f"round={rnd}")
            )

        # next frontier = discovered − itself − everything seen
        discovered = (
            enriched.select(F.explode("links").alias("url"))
            .filter(~F.col("url").startswith("mailto:"))
            .distinct()
        )
        new_seen = fetched.select("url")
        if os.path.isdir(seen_path):
            new_seen = new_seen.unionByName(spark.read.parquet(seen_path)).distinct()
        tmp_seen = seen_path + ".next"
        new_seen.coalesce(max(1, fetch_partitions // 4)).write.mode("overwrite").parquet(tmp_seen)
        next_frontier = discovered.join(
            spark.read.parquet(tmp_seen), "url", "left_anti"
        )
        tmp_frontier = frontier_path + ".next"
        next_frontier.coalesce(max(1, fetch_partitions // 4)).write.mode(
            "overwrite"
        ).parquet(tmp_frontier)
        n_frontier = spark.read.parquet(tmp_frontier).count()
        enriched.unpersist()
        fetched.unpersist()

        # commit the round: swap state dirs, then the manifest (rename-
        # commit last, so a crash re-runs the whole round idempotently —
        # the round's pages dir is overwritten, never double-appended)
        import shutil

        for tmp, final in ((tmp_seen, seen_path), (tmp_frontier, frontier_path)):
            shutil.rmtree(final, ignore_errors=True)
            os.replace(tmp, final)
        m = {
            "round": rnd,
            "batch": n_batch,
            "fetched_ok": n_ok,
            "fetched_failed": n_failed,
            "frontier_after": n_frontier,
            "ts": time.time(),
        }
        with open(os.path.join(st.state_dir, f"round-{rnd:04d}.json.tmp"), "w") as f:
            json.dump(m, f)
        os.replace(
            os.path.join(st.state_dir, f"round-{rnd:04d}.json.tmp"),
            os.path.join(st.state_dir, f"round-{rnd:04d}.json"),
        )
        total_ok += n_ok
        if n_frontier == 0:
            break
    return st
