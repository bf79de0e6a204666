"""Inverted-index build: pages → compressed term-sharded segments.

Two shuffles, two fully-parallel Arrow passes — the minimum dataflow for a
global inverted index:

**Stage 1 (docs)** — ONE range-shuffle of the pages by url, then a single
fused mapInPandas pass per partition that does, in order:

1. dedup by url keeping latest ``warc_ts`` (input_hint; reference analog:
   unique url constraint + visited-set, backend/app/database/models.py:72,
   backend/app/api/crawler.py:175) — range partitioning co-locates every
   row of a url, the partition sort puts the keeper first;
2. deterministic dense docIDs: doc_id = global url rank, via a cheap
   per-partition dedup-count pre-pass → prefix-sum offsets (stable across
   cluster sizes — required for rank identity);
3. extract title/text from html (pinned reference extractor,
   functions/extract.py — per-doc parse amortized over the Arrow batch);
4. tokenize (vectorized) → per-doc term frequencies inside the same batch
   (reference analog: backend/app/api/tokenizer.py:12-16) — downstream
   sees one row per distinct (term, doc), never per token instance;
5. write the docs table (hive bucket= dirs, doc_id-sorted for row-group
   pruning) and the flat postings parquet directly from the task, with a
   per-partition manifest.

**Stage 2 (segments)** — no Spark shuffle at all. Stage 1 writes the flat
postings pre-partitioned by shard group (``pshard=`` hive dirs — a
"shuffle via storage": map-side partitioned write, reduce-side selective
read, the same files-on-shared-storage exchange MR/Hive/push-based
shuffles use). Each stage-2 task reads exactly its group's files with
pyarrow, sorts with integer keys (term-hash/bucket/doc_id — stable, so
deterministic given the sorted file list), then a group-carving Arrow pass
packs delta+varint posting bytes with per-block max-score metadata
(operators/codec.py) and writes hive shard= segment files + manifests.
Zero per-row/per-group Python objects: boundaries come from Arrow compute
kernels and the output binary/list columns are assembled directly from the
codec's flat buffers (the pandas/applyInPandas formulations measured
10-30μs per posting row of pure conversion overhead, and the single-JVM
exchange+sort was the one stage that refused to scale past 8 cores).

* ``shard  = xxhash64(term) % num_shards`` → hive partition dir; query
  reads only the shards of its query terms (partition pruning ≙ the
  reference's B-tree probe on terms.term, models.py:41).
* ``bucket = doc_id // bucket_size`` — a uniform doc-range grid. This is
  the skew control: a head term appearing in 80% of 10^12 docs is split
  into bounded, doc-range-contiguous segment rows (≤ bucket_size postings
  each) instead of one giant group — the "salted repartitioning" of the
  north star, with the salt chosen so posting lists stay sorted/contiguous
  and never need a second merge pass. Query-side scoring is embarrassingly
  parallel over buckets because a doc's postings for *all* query terms
  share its bucket.
* ``df_global`` is computed in the segment writer (a term's shard
  partition sees its whole posting list) — the term_stats analog the
  reference declares but never populates (models.py:44-51, SURVEY.md §2.9).

**Checkpoint/resume**: every write goes through per-partition
`_manifest/*.json` (docs, postings, bytes, input-snapshot lineage) with
rename-commit. A rerun skips every partition whose manifest is committed
for the same input snapshot → killed builds resume without rewriting
completed work (reference analog: crawler_state checkpoint rows,
models.py:162-179, continue-mode frontier, routes.py:158-188). Stage
boundaries are materialized to parquet, so a resumed stage 2 never
recomputes extraction.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from uci_searchengine_spark import BM25_B, BM25_K1, DEFAULT_NUM_SHARDS
from uci_searchengine_spark.functions.extract import extract_html
from uci_searchengine_spark.functions.tokenize import tokenize_series
from uci_searchengine_spark.operators.codec import (
    pack_many,
    pack_many_raw,
    pack_positions_raw,
)
from uci_searchengine_spark.plans.docids import assign_doc_ids

SEGMENT_ROW_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("postings", T.BinaryType(), False),
        T.StructField("block_max", T.ArrayType(T.FloatType()), False),
        T.StructField("block_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
    ]
)

POSTINGS_STAGE_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doc_len", T.IntegerType(), False),
    ]
)


@dataclass
class IndexMeta:
    n_docs: int
    avgdl: float
    num_shards: int
    n_buckets: int
    bucket_size: int
    input_snapshot: str
    k1: float = BM25_K1
    b: float = BM25_B
    # >1 when a shard's buckets were split across stage-2 tasks (corpus ≫
    # one task's memory). The segment rows' df_global is then
    # fragment-local, and the query path aggregates df in-plan instead.
    seg_split: int = 1
    # True when the build ran the optional Porter stemmer after the pinned
    # tokenizer (north-star "tokenize/stem"); queries against this index
    # are stemmed symmetrically (bm25.terms_for_index). OFF by default —
    # every correctness fixture pins the reference's no-stemming chain.
    stem: bool = False
    # True when the segments carry the positional plane (token positions
    # per posting) — phrase_search then verifies adjacency from the index
    # alone, no doc-store reads.
    positions: bool = False
    # Number of index generations (Lucene-style): 1 = a single build;
    # each append_index() adds a gen-N/ sub-index. Multi-gen queries
    # aggregate df in-plan and inflate block-max bounds per generation
    # (the stored bounds were computed with that generation's avgdl).
    gens: int = 1
    # First doc id a future append may assign. -1 (builds; dense ids)
    # means "== n_docs". A MERGED index preserves ids with holes, so its
    # live count (n_docs, the idf input) sits BELOW the id ceiling —
    # basing an append at n_docs would collide with surviving ids
    # (operators/merge.py sets this to max live id + 1).
    next_doc_id: int = -1

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def load(index_dir: str) -> "IndexMeta":
        # self-heal the upsert crash window: if an append persisted its
        # stale-id list (pending-tombstones.json, written BEFORE the meta
        # commit) but crashed before delete_docs, apply it now so old
        # versions of re-seen urls never serve (operators/index_append.py)
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = IndexMeta(**json.load(f))
        pending = os.path.join(index_dir, "pending-tombstones.json")
        if os.path.exists(pending):
            with open(pending) as f:
                p = json.load(f)
            # apply only once the append's meta commit is visible — before
            # that, hiding the old versions would serve NEITHER version
            if meta.gens >= p.get("gens", 0):
                from uci_searchengine_spark.operators.tombstones import delete_docs

                if p.get("ids"):
                    delete_docs(index_dir, p["ids"])  # idempotent (dedup)
                os.remove(pending)
        return meta


def _tune_worker_arrow() -> None:
    """Pin pyarrow to one thread inside executor Python workers.

    pyarrow defaults every reader/writer/compute kernel to cpu_count()
    threads; with N concurrent Spark tasks that is N×cpu_count() threads
    fighting for N cores — measured as the dominant anti-scaling effect at
    32-way parallelism (tasks took 3× longer than at 8-way). One Spark
    task == one core's worth of work; parallelism belongs to Spark.
    """
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)


def _manifest_path(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, "_manifest", f"{name}.json")


def _read_manifest(index_dir: str, name: str) -> dict | None:
    p = _manifest_path(index_dir, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _commit_manifest(index_dir: str, name: str, payload: dict) -> None:
    """Atomic rename-commit of a manifest JSON."""
    p = _manifest_path(index_dir, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, p)


_DATA_SUBDIRS = ("docs", "postings_flat", "segments")

# Doc-store parquet row-group size. Docs are doc_id-sorted per bucket
# file, so serving's winner fetch (doc_id isin filter) prunes on
# row-group stats — small groups mean a top-k fetch decompresses ~this
# many text rows per winner bucket, not the whole bucket.
DOCS_ROW_GROUP = 256


def _snapshot_marker(index_dir: str) -> str:
    return os.path.join(index_dir, "_snapshot")


def _write_snapshot_marker(index_dir: str, snap: str) -> None:
    """Directory-level snapshot marker, committed BEFORE the first data
    file so a build killed before any manifest commit still leaves
    evidence of which snapshot its data files belong to."""
    tmp = _snapshot_marker(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(snap)
    os.replace(tmp, _snapshot_marker(index_dir))


def _wipe_stale(index_dir: str, snap: str) -> None:
    """Clear outputs left by a build of a DIFFERENT input snapshot or
    layout config (hive dirs from an old bucket/shard grid would otherwise
    leak into reads). A killed build of the SAME snapshot is left intact —
    that's the resume case.

    Staleness evidence, in order: (a) any manifest JSON recording another
    snapshot, (b) data directories present without a matching snapshot
    marker — covers a build killed after its first os.replace but before
    any manifest commit, which would otherwise leak old part files with
    foreign pids into reads."""
    import shutil

    stale = False
    mdir = os.path.join(index_dir, "_manifest")
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if not fn.endswith(".json"):
                continue
            try:
                with open(os.path.join(mdir, fn)) as f:
                    m = json.load(f)
            except (OSError, json.JSONDecodeError):
                stale = True
                break
            if m.get("input_snapshot") != snap:
                stale = True
                break
    if not stale and any(
        os.path.isdir(os.path.join(index_dir, sub)) for sub in _DATA_SUBDIRS
    ):
        marker = None
        try:
            with open(_snapshot_marker(index_dir)) as f:
                marker = f.read()
        except OSError:
            pass
        if marker != snap:
            stale = True
    if stale:
        import glob as _glob

        for sub in _DATA_SUBDIRS + ("_manifest", "tombstones"):
            shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
        # appended generations and tombstones belong to the replaced
        # snapshot — a root rebuild restarts the lineage at gen 0
        for g in _glob.glob(os.path.join(index_dir, "gen-*")):
            shutil.rmtree(g, ignore_errors=True)
        for fn in ("meta.json", "_snapshot"):
            try:
                os.remove(os.path.join(index_dir, fn))
            except FileNotFoundError:
                pass


# worker-persistent term→xxhash64 memo: vocab is zipf, so across Arrow
# batches (and builds — workers are reused) most unique terms repeat; a
# dict hit (~0.1µs) replaces a pure-Python XXH64 evaluation (~3µs). Reset
# when it outgrows a bound no realistic shard vocab exceeds.
_XXH_MEMO: dict[str, int] = {}
_XXH_MEMO_MAX = 4_000_000


def _xxh_many(uniq) -> "np.ndarray":
    from uci_searchengine_spark.functions.xxhash import xxhash64 as _xxh

    memo = _XXH_MEMO
    if len(memo) > _XXH_MEMO_MAX:
        memo.clear()
    out = np.empty(len(uniq), dtype=np.int64)
    get = memo.get
    for i, t in enumerate(uniq):
        v = get(t)
        if v is None:
            v = _xxh(t)
            memo[t] = v
        out[i] = v
    return out


def dedup_by_url(pages: DataFrame) -> DataFrame:
    """Keep the latest warc_ts row per url (deterministic tie-break).

    Standalone operator (U3 analog); the build pipeline itself fuses dedup
    into the stage-1 partition pass to avoid a second shuffle of the html
    payloads. ONE tie-break rule everywhere (this operator, the stage-1
    build sort, oracle.dedup_pages): warc_ts desc, then xxhash64(html)
    desc — so engine, operator, and oracle keep the same document."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.xxhash64("html").desc()
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _dedup_count_fn(it):
    """Per-partition count of distinct urls (input sorted by url)."""
    from pyspark import TaskContext

    _tune_worker_arrow()
    pid = TaskContext.get().partitionId()
    cnt = 0
    last_url = None
    for pdf in it:
        if not len(pdf):
            continue
        urls = pdf["url"].to_numpy()
        uniq = 1 + int((urls[1:] != urls[:-1]).sum())
        if last_url is not None and urls[0] == last_url:
            uniq -= 1
        cnt += uniq
        last_url = urls[-1]
    yield pd.DataFrame({"pid": [pid], "cnt": [cnt]})


_URL_STATS_SCHEMA = "cnt long, stride long, urls array<string>"


def _url_stats_fn(it):
    """Fused pre-pass worker: ONE scan of the url column yields, per
    input partition, the exact row count AND a bounded deterministic
    sample for range boundaries — replacing what used to be two separate
    driver jobs (count + .sample().collect()).

    Sampling is stride decimation at global in-partition indices
    ``i % stride == 0``: whenever the kept set exceeds the cap, every
    other sample is dropped and the stride doubles, so the driver
    receives ≤ cap urls per partition no matter the partition size, and
    each sample's stride is its weight (≈ rows represented) for
    weighted boundary quantiles. Deterministic given the input layout —
    the same guarantee the previous seeded .sample() had."""
    cap = 512
    cnt = 0
    stride = 1
    samp: list[str] = []
    for pdf in it:
        n = len(pdf)
        if not n:
            continue
        first = (-cnt) % stride
        if first < n:
            samp.extend(pdf["url"].iloc[first::stride].tolist())
        cnt += n
        while len(samp) > cap:
            samp = samp[::2]
            stride *= 2
    yield pd.DataFrame({"cnt": [cnt], "stride": [stride], "urls": [samp]})


def _postings_from_tokens(
    doc_ids: np.ndarray,
    doc_lens: np.ndarray,
    tokens,
    with_positions: bool = False,
) -> pd.DataFrame:
    """(term, doc_id, tf, doc_len[, pos]) rows — per-doc tf computed
    vectorized (A1 hot-path mapping, SURVEY.md §2.4).

    Token strings are factorized to int codes once, then counting is a
    single int64 sort + run-length pass — a pandas groupby on object keys
    here costs ~10x more (per-string hashing/compares across millions of
    token instances) and its allocation churn serializes across many
    concurrent workers.

    ``with_positions``: adds a ``pos`` list<int32> column — each row's
    token positions inside its doc, ascending. Same single sort (a stable
    argsort instead of np.sort) + one gather; per-row Python stays
    O(distinct (term,doc) rows) for the output list slicing only.
    """
    n = [len(t) for t in tokens]
    total = sum(n)
    if total == 0:
        out = {
            "term": pd.Series([], dtype=object),
            "doc_id": pd.Series([], dtype="int64"),
            "tf": pd.Series([], dtype="int32"),
            "doc_len": pd.Series([], dtype="int32"),
        }
        if with_positions:
            out["pos"] = pd.Series([], dtype=object)
        return pd.DataFrame(out)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tokens if len(t)])
    codes, uniq = pd.factorize(flat, sort=False)
    n_docs_b = len(tokens)
    doc_rep = np.repeat(np.arange(n_docs_b, dtype=np.int64), n)
    key = codes.astype(np.int64) * n_docs_b + doc_rep
    if with_positions:
        # token index within its doc, carried through the stable sort so
        # each (term, doc) run holds that term's positions ascending
        narr = np.asarray(n, dtype=np.int64)
        doc_tok_start = np.concatenate(([0], np.cumsum(narr)[:-1]))
        tok_pos = np.arange(total, dtype=np.int64) - np.repeat(
            doc_tok_start, narr
        )
        order = np.argsort(key, kind="stable")
        ks = key[order]
        pos_sorted = tok_pos[order].astype(np.int32)
    else:
        ks = np.sort(key)
    starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    tf = np.diff(np.append(starts, ks.size)).astype("int32")
    code_g = ks[starts] // n_docs_b
    doc_g = ks[starts] % n_docs_b
    out = {
        "term": np.asarray(uniq, dtype=object)[code_g],
        "doc_id": doc_ids[doc_g],
        "tf": tf,
        "doc_len": doc_lens[doc_g].astype("int32"),
    }
    if with_positions:
        out["pos"] = np.split(pos_sorted, starts[1:])
    return pd.DataFrame(out)


def _stage1_fn(
    index_dir: str,
    snapshot: str,
    offsets: dict[int, int],
    bucket_size: int,
    num_shards: int,
    seg_parts: int,
    seg_split: int = 1,
    stem: bool = False,
    positions: bool = False,
):
    """Fused stage-1 partition pass: dedup → docIDs → extract → tokenize →
    write docs + flat postings + manifest. One Arrow pass, no further
    shuffle of page payloads; per-partition resume via manifest."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    from uci_searchengine_spark.functions.extract import extract_one

    def run(batches):
        _tune_worker_arrow()
        pid = TaskContext.get().partitionId()
        name = f"stage1-{pid:05d}"
        existing = _read_manifest(index_dir, name)
        if (
            existing
            and existing.get("status") == "committed"
            and existing.get("input_snapshot") == snapshot
        ):
            for _ in batches:
                pass
            yield pd.DataFrame({"partition_id": [pid], "skipped": [True]})
            return

        offset = offsets.get(pid, 0)
        counter = 0
        hold: pd.DataFrame | None = None
        docs_rows = 0
        postings_rows = 0
        doc_len_sum = 0
        t_task0 = time.perf_counter()
        phase_s = {"extract": 0.0, "tokenize": 0.0, "postings": 0.0, "write": 0.0}

        # streaming writers: rows land in parquet per Arrow chunk, so task
        # memory stays bounded by one chunk regardless of partition size
        # (a partition is GBs at corpus scale) — and the reduced
        # allocation churn matters doubly on hosts with slow page faults.
        docs_schema = pa.schema(
            [
                ("doc_id", pa.int64()),
                ("url", pa.string()),
                ("title", pa.string()),
                ("doc_len", pa.int32()),
                ("text", pa.string()),
            ]
        )
        posts_fields = [
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int32()),
            ("doc_len", pa.int32()),
            ("th", pa.int64()),
            ("shard", pa.int32()),
            ("bucket", pa.int32()),
        ]
        if positions:
            posts_fields.insert(4, ("pos", pa.list_(pa.int32())))
        posts_schema = pa.schema(posts_fields)
        docs_writers: dict[int, object] = {}
        post_writers: dict[int, object] = {}
        tmp_paths: list[tuple[str, str]] = []

        def _writer(writers, key, subdir, hive, schema, compression):
            w = writers.get(key)
            if w is None:
                out_dir = os.path.join(index_dir, subdir, f"{hive}={key}")
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
                w = pq.ParquetWriter(path + ".tmp", schema, compression=compression)
                writers[key] = w
                tmp_paths.append((path + ".tmp", path))
            return w

        def process(pdf: pd.DataFrame) -> None:
            nonlocal counter, docs_rows, postings_rows, doc_len_sum
            d = pdf.drop_duplicates("url", keep="first")
            doc_ids = (offset + counter + np.arange(len(d))).astype("int64")
            counter += len(d)
            titles, texts = [], []
            _t = time.perf_counter()
            for url, html in zip(d["url"], d["html"]):
                title, text, _links = extract_one(bytes(html), url)
                titles.append(title)
                texts.append(text)
            phase_s["extract"] += time.perf_counter() - _t
            _t = time.perf_counter()
            tokens = tokenize_series(pd.Series(texts, dtype=object))
            if stem:
                from uci_searchengine_spark.functions.stem import (
                    stem_token_series,
                )

                tokens = stem_token_series(tokens)
            doc_lens = np.array([len(t) for t in tokens], dtype="int32")
            phase_s["tokenize"] += time.perf_counter() - _t
            doc_len_sum += int(doc_lens.sum())

            docs = pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "url": d["url"].to_numpy(),
                    "title": titles,
                    "doc_len": doc_lens,
                    "text": texts,
                }
            )
            _t = time.perf_counter()
            buckets = (doc_ids // bucket_size).astype("int32")
            for bv in np.unique(buckets):
                grp = docs[buckets == bv]
                # small row groups: docs are doc_id-sorted, so the serving
                # fetch's doc_id filter prunes decode to the winners' row
                # groups instead of the whole bucket's text column
                _writer(docs_writers, int(bv), "docs", "bucket", docs_schema, "zstd").write_table(
                    pa.Table.from_pandas(grp, preserve_index=False, schema=docs_schema),
                    row_group_size=DOCS_ROW_GROUP,
                )
                docs_rows += len(grp)
            phase_s["write"] += time.perf_counter() - _t

            _t = time.perf_counter()
            posts = _postings_from_tokens(
                doc_ids, doc_lens, list(tokens), with_positions=positions
            )
            codes, uniq = pd.factorize(posts["term"].to_numpy(), sort=False)
            posts["th"] = _xxh_many(uniq)[codes]
            posts["shard"] = (posts["th"].to_numpy() % num_shards).astype("int32")
            posts["bucket"] = (posts["doc_id"].to_numpy() // bucket_size).astype("int32")
            if seg_split > 1:
                # corpus ≫ one task's memory: split each shard's BUCKETS
                # across seg_split stage-2 tasks (a task then holds
                # ~1/seg_split of the shard; df_global becomes
                # fragment-local and the query aggregates df in-plan)
                pshard = (
                    posts["shard"].to_numpy() * seg_split
                    + posts["bucket"].to_numpy() % seg_split
                ).astype("int32")
            else:
                pshard = (posts["shard"].to_numpy() % seg_parts).astype("int32")
            phase_s["postings"] += time.perf_counter() - _t
            postings_rows += len(posts)
            _t = time.perf_counter()
            for pv in np.unique(pshard):
                grp = posts[pshard == pv]
                _writer(post_writers, int(pv), "postings_flat", "pshard", posts_schema, "snappy").write_table(
                    pa.Table.from_pandas(grp, preserve_index=False, schema=posts_schema)
                )
            phase_s["write"] += time.perf_counter() - _t

        for pdf in batches:
            if hold is not None:
                pdf = pd.concat([hold, pdf], ignore_index=True)
                hold = None
            if not len(pdf):
                continue
            # hold back the final url group — it may continue in the next
            # Arrow batch and dedup must see the whole group
            urls = pdf["url"].to_numpy()
            first_of_last = int(np.searchsorted(urls, urls[-1], side="left"))
            if first_of_last > 0:
                hold = pdf.iloc[first_of_last:].reset_index(drop=True)
                process(pdf.iloc[:first_of_last])
            else:
                hold = pdf
        if hold is not None and len(hold):
            process(hold)

        tbl_bytes = 0
        for w in list(docs_writers.values()) + list(post_writers.values()):
            w.close()
        for tmp, final in tmp_paths:
            os.replace(tmp, final)
            tbl_bytes += os.path.getsize(final)
        _commit_manifest(
            index_dir,
            name,
            {
                "partition_id": pid,
                "docs": docs_rows,
                "postings": postings_rows,
                "bytes": tbl_bytes,
                "rows": docs_rows,
                "doc_len_sum": doc_len_sum,
                "input_snapshot": snapshot,
                "status": "committed",
                # per-partition build timings (lineage + metrics): task
                # wall and where it went — the scaling diagnosis at any
                # cluster size reads straight from the manifests
                "secs_task": round(time.perf_counter() - t_task0, 3),
                "secs_extract": round(phase_s["extract"], 3),
                "secs_tokenize": round(phase_s["tokenize"], 3),
                "secs_postings": round(phase_s["postings"], 3),
                "secs_write": round(phase_s["write"], 3),
            },
        )
        yield pd.DataFrame({"partition_id": [pid], "skipped": [False]})

    return run


@F.pandas_udf(T.ArrayType(T.StringType()))
def _tokens_udf(text: pd.Series) -> pd.Series:
    return tokenize_series(text)


def _tf_rows(it):
    """mapInPandas: (doc_id, doc_len, tokens) → (term, doc_id, tf, doc_len).

    Per-doc term counting with pandas value_counts per Arrow batch —
    the A1 hot-path mapping (SURVEY.md §2.4): the shuffle downstream sees
    one row per distinct (term, doc), never one per token instance.
    """
    for pdf in it:
        if not len(pdf):
            continue
        yield _postings_from_tokens(
            pdf["doc_id"].to_numpy(),
            pdf["doc_len"].to_numpy(),
            list(pdf["tokens"]),
        )


def _pack_partition(avgdl: float):
    """mapInPandas packer over a shard-partitioned, (term,bucket,doc_id)-
    sorted stream of flat postings.

    Spark's groupBy().applyInPandas pays per-group Arrow/schema overhead —
    ruinous for millions of tiny term groups. Instead we sort within the
    shard partition and carve group boundaries ourselves: one Arrow pass,
    numpy slicing per (term, bucket) group, a held-back tail so groups that
    span Arrow batches are never split. Per-group Python is O(distinct
    terms), never O(postings) — the hot per-posting work stays vectorized
    in pack_postings.
    """

    def run(batches):
        hold: pd.DataFrame | None = None

        def emit(pdf: pd.DataFrame, last_incomplete: bool):
            nonlocal hold
            terms = pdf["term"].to_numpy()
            buckets = pdf["bucket"].to_numpy()
            # boundaries where (term, bucket) changes
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (buckets[1:] != buckets[:-1])
            )
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(pdf)]))
            if last_incomplete and len(starts):
                hold = pdf.iloc[starts[-1] :]
                starts, ends = starts[:-1], ends[:-1]
            else:
                hold = None
            if not len(starts):
                return None
            cut = int(ends[-1])
            doc_ids = pdf["doc_id"].to_numpy()[:cut]
            tfs = pdf["tf"].to_numpy()[:cut]
            dls = pdf["doc_len"].to_numpy()[:cut]
            shards = pdf["shard"].to_numpy()
            blobs, bmaxs, boffs, blasts, counts = pack_many(
                doc_ids, tfs, dls, starts, avgdl
            )
            return pd.DataFrame(
                {
                    "shard": shards[starts].astype("int32"),
                    "term": terms[starts],
                    "bucket": buckets[starts].astype("int32"),
                    "df": counts.astype("int32"),
                    "postings": blobs,
                    "block_max": bmaxs,
                    "block_offsets": boffs,
                    "block_last_doc": blasts,
                }
            )

        for pdf in batches:
            if hold is not None:
                pdf = pd.concat([hold, pdf], ignore_index=True)
            if not len(pdf):
                continue
            out = emit(pdf, last_incomplete=True)
            if out is not None and len(out):
                yield out
        if hold is not None and len(hold):
            out = emit(hold.reset_index(drop=True), last_incomplete=False)
            if out is not None and len(out):
                yield out

    return run


def _pack_and_write_arrow(
    index_dir: str, snapshot: str, avgdl: float, positions: bool = False
):
    """Production stage-2 task: mapInArrow group-carve + pack + write.

    NO per-row or per-group Python objects anywhere: group boundaries come
    from Arrow compute kernels, numeric columns are zero-copy numpy views,
    the posting blobs/block arrays are assembled as a single
    ``pa.BinaryArray``/``pa.ListArray`` straight from the codec's flat
    buffers (codec.pack_many_raw), and files are written with pyarrow.
    The pandas variant of the same dataflow (``_pack_partition`` +
    ``_write_partition_fn``) spent ~25μs/row on object conversion — at
    33M posting rows that dwarfed the actual packing work.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    result_schema = pa.schema(
        [pa.field("partition_id", pa.int32()), pa.field("skipped", pa.bool_())]
    )

    def result(pid: int, skipped: bool):
        return pa.RecordBatch.from_pydict(
            {"partition_id": [pid], "skipped": [skipped]}, schema=result_schema
        )

    def run(batches):
        _tune_worker_arrow()
        pid = TaskContext.get().partitionId()
        name = f"segments-{pid:05d}"
        existing = _read_manifest(index_dir, name)
        if (
            existing
            and existing.get("status") == "committed"
            and existing.get("input_snapshot") == snapshot
        ):
            for _ in batches:
                pass
            yield result(pid, True)
            return

        out_tables: list[pa.Table] = []
        hold: pa.Table | None = None

        def process(tbl: pa.Table, final: bool) -> None:
            nonlocal hold
            tbl = tbl.combine_chunks()
            n = tbl.num_rows
            if n == 0:
                hold = None
                return
            term = tbl.column("term").combine_chunks()
            bucket = tbl.column("bucket").to_numpy()
            if n > 1:
                t_neq = pc.not_equal(
                    term.slice(1), term.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
                change = t_neq | (bucket[1:] != bucket[:-1])
                starts = np.concatenate(([0], np.flatnonzero(change) + 1))
            else:
                starts = np.zeros(1, dtype=np.int64)
            if not final:
                # hold back the last (possibly incomplete) group
                hold = tbl.slice(int(starts[-1]))
                if starts.size == 1:
                    return
                cut = int(starts[-1])
                starts = starts[:-1]
            else:
                hold = None
                cut = n
            doc_id = tbl.column("doc_id").to_numpy()[:cut]
            tf = tbl.column("tf").to_numpy()[:cut]
            dl = tbl.column("doc_len").to_numpy()[:cut]
            shard = tbl.column("shard").to_numpy()
            raw = pack_many_raw(doc_id, tf, dl, starts, avgdl)
            G = starts.size
            postings = pa.Array.from_buffers(
                pa.binary(),
                G,
                [
                    None,
                    pa.py_buffer(raw["group_bytes"].astype(np.int32)),
                    pa.py_buffer(raw["enc"]),
                ],
            )
            blk_off32 = pa.array(raw["blk_bounds"].astype(np.int32))
            cols = {
                "shard": pa.array(shard[starts].astype(np.int32)),
                "term": term.take(pa.array(starts)),
                "bucket": pa.array(bucket[starts].astype(np.int32)),
                "df": pa.array(raw["counts"].astype(np.int32)),
                "postings": postings,
                "block_max": pa.ListArray.from_arrays(
                    blk_off32, pa.array(raw["block_max"])
                ),
                "block_offsets": pa.ListArray.from_arrays(
                    blk_off32, pa.array(raw["block_off"])
                ),
                "block_last_doc": pa.ListArray.from_arrays(
                    blk_off32, pa.array(raw["block_last"])
                ),
            }
            if positions:
                # positional plane: delta-varint token positions per
                # posting, same block grid, large_binary (the plane is
                # ~token-count-sized, > 2 GiB per task is plausible)
                pos_sl = tbl.column("pos").combine_chunks().slice(0, cut)
                pos_flat = pc.list_flatten(pos_sl).to_numpy()
                praw = pack_positions_raw(
                    pos_flat, tf, starts, raw["blk_bounds"], raw["block_start"]
                )
                cols["positions"] = pa.Array.from_buffers(
                    pa.large_binary(),
                    G,
                    [
                        None,
                        pa.py_buffer(praw["group_bytes"].astype(np.int64)),
                        pa.py_buffer(praw["enc"]),
                    ],
                )
                cols["pos_block_off"] = pa.ListArray.from_arrays(
                    blk_off32, pa.array(praw["block_off"])
                )
            out_tables.append(pa.table(cols))

        for batch in batches:
            tbl = (
                batch
                if isinstance(batch, pa.Table)
                else pa.Table.from_batches([batch])
            )
            if hold is not None and hold.num_rows:
                tbl = pa.concat_tables([hold, tbl])
            process(tbl, final=False)
        if hold is not None and hold.num_rows:
            process(hold, final=True)

        rows = 0
        postings_total = 0
        tbl_bytes = 0
        if out_tables:
            seg = pa.concat_tables(out_tables).combine_chunks()
            rows = seg.num_rows
            df_np = seg.column("df").to_numpy()
            postings_total = int(df_np.sum())
            # df_global: term runs are contiguous (input sorted by term)
            term = seg.column("term").combine_chunks()
            if rows > 1:
                t_neq = pc.not_equal(
                    term.slice(1), term.slice(0, rows - 1)
                ).to_numpy(zero_copy_only=False)
                run_starts = np.concatenate(([0], np.flatnonzero(t_neq) + 1))
            else:
                run_starts = np.zeros(1, dtype=np.int64)
            run_lens = np.diff(np.append(run_starts, rows))
            df_glob = np.repeat(
                np.add.reduceat(df_np.astype(np.int64), run_starts), run_lens
            )
            seg = seg.append_column("df_global", pa.array(df_glob))
            # one file per shard (contiguous runs — input sorted by shard)
            shard_np = seg.column("shard").to_numpy()
            s_bounds = np.concatenate(
                ([0], np.flatnonzero(shard_np[1:] != shard_np[:-1]) + 1, [rows])
            )
            for a, b in zip(s_bounds[:-1], s_bounds[1:]):
                sv = int(shard_np[a])
                out_dir = os.path.join(index_dir, "segments", f"shard={sv}")
                os.makedirs(out_dir, exist_ok=True)
                path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
                pq.write_table(
                    seg.slice(int(a), int(b - a)).drop_columns(["shard"]),
                    path + ".tmp",
                    compression="zstd",
                )
                os.replace(path + ".tmp", path)
                tbl_bytes += os.path.getsize(path)
        _commit_manifest(
            index_dir,
            name,
            {
                "partition_id": pid,
                "docs": 0,
                "postings": postings_total,
                "bytes": tbl_bytes,
                "rows": int(rows),
                "input_snapshot": snapshot,
                "status": "committed",
            },
        )
        yield result(pid, False)

    return run


def _pack_shard_group_fn(
    index_dir: str, snapshot: str, avgdl: float, positions: bool = False
):
    """Stage-2 task body: read this shard-group's postings files (written
    pre-partitioned by stage 1), sort with integer keys, then run the
    Arrow pack+write path. The input DataFrame carries only the group id —
    the data never crosses a Spark shuffle."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    inner = _pack_and_write_arrow(index_dir, snapshot, avgdl, positions=positions)

    def run(batches):
        _tune_worker_arrow()
        pids = []
        for b in batches:
            pids.extend(b.column("pid").to_pylist())
        assert len(pids) == 1, f"expected one group per task, got {pids}"
        pid = pids[0]

        def read_sorted():
            files = sorted(
                _glob.glob(
                    os.path.join(index_dir, "postings_flat", f"pshard={pid}", "*.parquet")
                )
            )
            if not files:
                return
            tbl = pa.concat_tables([pq.read_table(f) for f in files])
            yield from sort_flat_postings_chunks(tbl)

        yield from inner(read_sorted())

    return run


def sort_flat_postings_chunks(tbl, chunk: int = 262_144):
    """Sort a flat-postings Arrow table into the segment-pack order and
    yield it in bounded chunks.

    Integer lexsort with a TERM tiebreak: on an xxhash64 collision two
    terms share th, and sorting by th alone would interleave their rows —
    fragmenting the (term, bucket) runs the carver and the run-contiguous
    df_global aggregation depend on. Rank each distinct term by the
    intrinsic (th, term-string) order (independent of file/partition
    layout → bit-identical segments across parallelism levels) and sort
    on that rank instead. Chunked output keeps the packer's numpy working
    set O(chunk), not O(partition) (its hold-back logic keeps groups
    intact across chunk edges)."""
    import pyarrow as pa

    tbl = tbl.combine_chunks()
    th = tbl.column("th").to_numpy()
    bucket = tbl.column("bucket").to_numpy()
    doc_id = tbl.column("doc_id").to_numpy()
    shard = tbl.column("shard").to_numpy()
    codes, uniq = pd.factorize(
        tbl.column("term").to_pandas().to_numpy(), sort=False
    )
    # first occurrence index per code (vectorized: reverse scatter)
    first = np.empty(len(uniq), dtype=np.int64)
    first[codes[::-1]] = np.arange(len(codes) - 1, -1, -1)
    uniq_th = th[first]
    perm = np.lexsort((np.asarray(uniq, dtype=str), uniq_th))
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[perm] = np.arange(len(uniq))
    term_rank = rank[codes]
    order = np.lexsort((doc_id, bucket, term_rank, shard))
    tbl = tbl.take(pa.array(order))
    for lo in range(0, tbl.num_rows, chunk):
        yield tbl.slice(lo, chunk)


def _write_partition_fn(index_dir: str, snapshot: str, kind: str, order_cols: list[str]):
    """Returns a mapInPandas fn writing one parquet file per (partition,
    hive-dir) with a per-partition manifest; skips committed partitions."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark import TaskContext

    hive_col = "shard" if kind == "segments" else "bucket"

    def write(it):
        pid = TaskContext.get().partitionId()
        name = f"{kind}-{pid:05d}"
        existing = _read_manifest(index_dir, name)
        if existing and existing.get("status") == "committed" and existing.get("input_snapshot") == snapshot:
            # already built by a previous (killed) run — zero recompute
            for _ in it:
                pass
            yield pd.DataFrame({"partition_id": [pid], "skipped": [True]})
            return
        rows = 0
        tbl_bytes = 0
        postings_total = 0
        chunks = [pdf for pdf in it if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
            if kind == "segments":
                # all buckets of a term share its shard → its shard
                # partition sees the whole posting list, so the global df
                # is computable here with zero extra shuffle. Denormalized
                # onto every segment row: the query path reads idf without
                # a separate aggregation job (term_stats analog,
                # backend/app/database/models.py:44-51 — which the
                # reference never populates, SURVEY.md §2.9).
                pdf["df_global"] = pdf.groupby("term")["df"].transform("sum").astype("int64")
            for hv, grp in pdf.groupby(hive_col, sort=True):
                out_dir = os.path.join(index_dir, kind, f"{hive_col}={hv}")
                os.makedirs(out_dir, exist_ok=True)
                tbl = pa.Table.from_pandas(
                    grp.drop(columns=[hive_col]), preserve_index=False
                )
                path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
                pq.write_table(tbl, path + ".tmp", compression="zstd")
                os.replace(path + ".tmp", path)
                rows += len(grp)
                tbl_bytes += os.path.getsize(path)
                if kind == "segments":
                    postings_total += int(grp["df"].sum())
        _commit_manifest(
            index_dir,
            name,
            {
                "partition_id": pid,
                "docs": rows if kind == "docs" else 0,
                "postings": postings_total,
                "bytes": tbl_bytes,
                "rows": rows,
                "input_snapshot": snapshot,
                "status": "committed",
            },
        )
        yield pd.DataFrame({"partition_id": [pid], "skipped": [False]})

    return write


_WRITE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("skipped", T.BooleanType(), False),
    ]
)


# ---------------------------------------------------------- map-only path
def plan_ranged_file_groups(
    pages_path: str, write_partitions: int
) -> "list[dict] | None":
    """Planner for the MAP-ONLY stage-1 fast path.

    If the input table's parquet files form non-overlapping url ranges
    (the layout a production crawl table maintains: Iceberg/parquet
    written ``SORTED BY url`` — see bench.py corpus prep), stage 1 needs
    NO exchange at all: each task reads its own contiguous file group
    with pyarrow, so the JVM does no shuffle write/read and no
    row→Arrow conversion of the html payloads. Measured on this box the
    exchange path's stage-1 tasks slow ~2-4x at 32-way parallelism from
    JVM/python CPU contention alone; the map-only path's only JVM work
    is task scheduling.

    Returns url-ordered groups ``[{"pid", "files", "rows"}]`` (files
    whose boundary urls touch share a group, so a url never spans two
    groups — dedup stays task-local), or None when the layout doesn't
    qualify (overlapping ranges / empty stats / not parquet) — callers
    fall back to the range-exchange path. Boundary urls are read as
    VALUES (first/last row of each file), not footer min/max stats,
    which may be truncated for long strings.
    """
    import pyarrow.parquet as pq

    try:
        files = sorted(
            os.path.join(pages_path, f)
            for f in os.listdir(pages_path)
            if f.endswith(".parquet") and not f.startswith("_")
        )
    except OSError:
        return None
    if not files:
        return None
    metas = []
    for f in files:
        try:
            pf = pq.ParquetFile(f)
            md = pf.metadata
            if md.num_rows == 0:
                continue
            head = next(pf.iter_batches(batch_size=1, columns=["url"]))
            first = head["url"][0].as_py()
            lastrg = pf.read_row_group(md.num_row_groups - 1, columns=["url"])
            last = lastrg["url"][len(lastrg) - 1].as_py()
            metas.append({"file": f, "rows": md.num_rows, "lo": first, "hi": last})
        except Exception:
            return None
    if not metas:
        return None
    metas.sort(key=lambda m: (m["lo"], m["hi"]))
    for a, b in zip(metas, metas[1:]):
        if b["lo"] < a["hi"]:
            return None  # overlapping url ranges — exchange required
    total = sum(m["rows"] for m in metas)
    # aim for ~3 groups per slot: finer task grain smooths stragglers —
    # wave-tail time dominated the 8/32-core stage-1 wall on even corpora
    # (map-only tasks have near-zero fixed cost, so extra tasks are cheap)
    target = max(1, total // (3 * max(write_partitions, 1)))
    groups: list[dict] = []
    cur: list[dict] = []
    cur_rows = 0
    for i, m in enumerate(metas):
        cur.append(m)
        cur_rows += m["rows"]
        boundary_shared = i + 1 < len(metas) and metas[i + 1]["lo"] == m["hi"]
        if cur_rows >= target and not boundary_shared:
            groups.append({"files": [x["file"] for x in cur], "rows": cur_rows})
            cur, cur_rows = [], 0
    if cur:
        groups.append({"files": [x["file"] for x in cur], "rows": cur_rows})
    for pid, g in enumerate(groups):
        g["pid"] = pid
    return groups


def _read_group_sorted(files: list[str], columns: list[str]) -> pd.DataFrame:
    """Read a file group with pyarrow and return rows sorted by
    (url asc, warc_ts desc, xxhash64(html) desc) — the exact dedup order
    the exchange path's sortWithinPartitions produces, so both paths
    keep the same row per url."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.concat_tables(
        [pq.read_table(f, columns=columns) for f in files]
    )
    pdf = tbl.to_pandas()
    urls = pdf["url"].to_numpy()
    if "warc_ts" not in pdf.columns:
        if not (urls[:-1] <= urls[1:]).all():
            pdf = pdf.sort_values("url", kind="stable", ignore_index=True)
        return pdf
    dup_urls = pd.Index(urls).duplicated(keep=False)
    if not dup_urls.any():
        if (urls[:-1] <= urls[1:]).all():
            return pdf
        return pdf.sort_values("url", kind="stable", ignore_index=True)
    # duplicates present: full dedup order, hash tiebreak only on rows
    # that tie on (url, warc_ts) — xxhash64 on html bytes is python-side
    from uci_searchengine_spark.functions.xxhash import xxhash64 as _xxh

    th = np.zeros(len(pdf), dtype=np.int64)
    dmask = dup_urls.to_numpy() if hasattr(dup_urls, "to_numpy") else np.asarray(dup_urls)
    for i in np.flatnonzero(dmask):
        h = _xxh(bytes(pdf["html"].iloc[i]))
        th[i] = h - (1 << 64) if h >= (1 << 63) else h
    pdf = pdf.assign(_th=th)
    pdf = pdf.sort_values(
        ["url", "warc_ts", "_th"],
        ascending=[True, False, False],
        kind="stable",
        ignore_index=True,
    ).drop(columns="_th")
    return pdf


def _group_counts_fn(group_files: dict[int, list[str]]):
    """Map-only pre-pass: distinct-url count per file group, url column
    only (pyarrow, no JVM read)."""

    def run(it):
        from pyspark import TaskContext

        _tune_worker_arrow()
        pid = TaskContext.get().partitionId()
        for _ in it:
            pass
        files = group_files.get(pid, [])
        if not files:
            yield pd.DataFrame({"pid": [pid], "cnt": [0]})
            return
        pdf = _read_group_sorted(files, ["url"])
        urls = pdf["url"].to_numpy()
        cnt = 1 + int((urls[1:] != urls[:-1]).sum()) if len(urls) else 0
        yield pd.DataFrame({"pid": [pid], "cnt": [cnt]})

    return run


def _cached_group_counts(
    spark, pages_path: str, map_groups: list, group_files: dict, driver_r
) -> dict[int, int]:
    """Distinct-url counts per file group, with a table-stats cache.

    The counts are pure TABLE metadata (like Iceberg column stats):
    deterministic given the exact file set and the group layout. Cache
    key = md5 over every file's (path, size, mtime_ns) plus the group
    boundaries; stored in ``<table>/_uss_stats/`` (alongside-table, the
    place a maintenance job would put it) with a tempdir fallback when
    the table dir is read-only. Any file change rotates the key — stale
    stats can never be read."""
    import hashlib
    import tempfile

    h = hashlib.md5()
    for g in map_groups:
        for f in g["files"]:
            st = os.stat(f)
            h.update(f"{f}|{st.st_size}|{st.st_mtime_ns}|".encode())
        h.update(f"#{g['pid']}:{g['rows']};".encode())
    key = h.hexdigest()
    cand_dirs = [
        os.path.join(pages_path, "_uss_stats"),
        os.path.join(tempfile.gettempdir(), "uss_stats"),
    ]
    for d in cand_dirs:
        p = os.path.join(d, f"group_counts-{key}.json")
        try:
            with open(p) as fh:
                return {int(k): v for k, v in json.load(fh).items()}
        except OSError:
            continue
    counts = {
        r["pid"]: r["cnt"]
        for r in driver_r.mapInPandas(
            _group_counts_fn(group_files), "pid int, cnt long"
        ).collect()
    }
    for d in cand_dirs:
        try:
            os.makedirs(d, exist_ok=True)
            p = os.path.join(d, f"group_counts-{key}.json")
            with open(p + ".tmp", "w") as fh:
                json.dump(counts, fh)
            os.replace(p + ".tmp", p)
            break
        except OSError:
            continue
    return counts


def _stage1_from_files_fn(inner_run, group_files: dict[int, list[str]]):
    """Map-only stage 1: feed the SAME fused stage-1 pass
    (``_stage1_fn``'s run) from a pyarrow read of the task's file group
    instead of an exchanged Arrow stream — identical outputs, no JVM
    dataflow. Chunked to the same batch grain so memory behavior
    matches."""

    def run(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for _ in it:
            pass
        files = group_files.get(pid, [])

        def batches():
            if not files:
                return
            pdf = _read_group_sorted(files, ["url", "warc_ts", "html"])
            pdf = pdf[["url", "html"]]
            for i in range(0, len(pdf), 10_000):
                yield pdf.iloc[i : i + 10_000]

        yield from inner_run(batches())

    return run


# target postings-bucket width for auto-derived n_buckets: bounds the
# query-side dense accumulator (np.zeros(bucket_size) in wand._score_bucket)
# at ~64 MB of float64 per scoring task regardless of corpus size
DOCS_PER_BUCKET = 8_000_000

# docs' worth of postings per stage-2 task: the storage-shuffle grain cap
# (see the seg grid derivation in build_index)
SEG_DOCS_PER_TASK = 12_500


def derive_n_buckets(n_rows: int) -> int:
    """Bucket-grid size for a corpus of ``n_rows`` pages (pre-dedup upper
    bound): enough buckets that bucket_size ≤ DOCS_PER_BUCKET, floor 16 so
    query scoring keeps useful parallelism at small scale."""
    return max(16, math.ceil(max(n_rows, 1) / DOCS_PER_BUCKET))


def _try_fast_resume(
    index_dir: str,
    input_snapshot: str,
    *,
    num_shards: int,
    n_buckets: int | None,
    write_partitions: int,
    stem: bool,
    positions: bool,
    doc_id_base: int,
    bucket_size_override: int | None,
) -> "IndexMeta | None":
    """IndexMeta when ``index_dir`` holds a COMPLETED build of the same
    snapshot + layout, else None (fall through to the staged path)."""
    import re

    if not os.path.isfile(os.path.join(index_dir, "meta.json")):
        return None
    docs_stage = _read_manifest(index_dir, "stage-docs")
    if not docs_stage or docs_stage.get("status") != "committed":
        return None
    stored = docs_stage.get("input_snapshot") or ""
    if "#" not in stored:
        return None
    prefix, rest = stored.rsplit("#", 1)
    if prefix != input_snapshot:
        return None
    b_pat = r"\d+" if n_buckets is None else str(int(n_buckets))
    flags = (
        f"{'+stem' if stem else ''}{'+pos' if positions else ''}"
        f"{f'+base{doc_id_base}' if doc_id_base else ''}"
        f"{f'+bs{bucket_size_override}' if bucket_size_override else ''}"
    )
    pat = (
        rf"^s{num_shards}b{b_pat}p{write_partitions}x\d+"
        rf"{re.escape(flags)}(\+map\d+)?v2$"
    )
    if not re.match(pat, rest):
        return None
    try:
        return IndexMeta.load(index_dir)
    except (OSError, json.JSONDecodeError, KeyError, ValueError):
        return None


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    *,
    num_shards: int = DEFAULT_NUM_SHARDS,
    n_buckets: int | None = None,
    input_snapshot: str = "unknown",
    write_partitions: int | None = None,
    stem: bool = False,
    positions: bool = False,
    doc_id_base: int = 0,
    bucket_size_override: int | None = None,
    pages_path: str | None = None,
) -> IndexMeta:
    """Build (or resume) the index at ``index_dir`` from a pages DataFrame.

    ``n_buckets=None`` derives the doc-range grid from the corpus size
    (``derive_n_buckets``) so the WAND accumulator stays bounded at any
    scale; pass an explicit value to pin the layout.

    ``doc_id_base``/``bucket_size_override`` serve generation builds
    (operators/index_append.py): the appended sub-index numbers its docs
    after the parent's and keeps the parent's doc-range bucket grid so
    per-bucket scoring and the co-located doc store stay aligned.

    ``positions=True`` adds the positional plane (delta-varint token
    positions per posting, block-aligned) to the segments — enables
    index-only phrase matching (operators/phrase.py) at ~1.5-3x segment
    size; OFF by default.

    ``pages_path``: path to the pages table's parquet directory. When the
    table's files form non-overlapping url ranges (a crawl table written
    SORTED BY url — the layout a production pipeline maintains), stage 1
    runs MAP-ONLY: tasks read their own file group with pyarrow, no JVM
    exchange, no Arrow conversion of html payloads (plan_ranged_file_
    groups). Unsuitable layouts fall back to the range-exchange path
    transparently; results are identical either way (tested). ``pages``
    may be None when ``pages_path`` is given."""
    os.makedirs(index_dir, exist_ok=True)
    parallelism = spark.sparkContext.defaultParallelism
    write_partitions = write_partitions or parallelism

    # FAST RESUME: a fully committed index (meta.json is written last,
    # atomically) whose stored internal snapshot carries the same
    # caller snapshot + layout knobs needs NO Spark work at all. The
    # full path below still runs two jobs just to decide to do nothing
    # (the url-stats pre-pass that derives n_buckets, then a stage-2
    # task sweep that reads per-partition manifests and skips) — per
    # call, on every gate that opens a build-or-resume index. The
    # derived values (b…, x…, +map…) are deterministic functions of
    # the same corpus the caller's snapshot fingerprints, so they are
    # accepted as stored; everything else must match exactly.
    fast = _try_fast_resume(
        index_dir,
        input_snapshot,
        num_shards=num_shards,
        n_buckets=n_buckets,
        write_partitions=write_partitions,
        stem=stem,
        positions=positions,
        doc_id_base=doc_id_base,
        bucket_size_override=bucket_size_override,
    )
    if fast is not None:
        return fast
    url_stats: list | None = None

    map_groups: list | None = None
    if pages_path is not None:
        map_groups = plan_ranged_file_groups(pages_path, write_partitions)
        if pages is None:
            pages = spark.read.parquet(pages_path)

    def _collect_url_stats() -> list:
        """One url-column scan returning per-input-partition (count,
        stride, sample) — the only pre-stage-1 job (count and boundary
        sample used to be two separate driver jobs)."""
        return (
            pages.select("url")
            .mapInPandas(_url_stats_fn, _URL_STATS_SCHEMA)
            .collect()
        )

    if n_buckets is None:
        if map_groups is not None:
            n_buckets = derive_n_buckets(sum(g["rows"] for g in map_groups))
        else:
            url_stats = _collect_url_stats()
            n_buckets = derive_n_buckets(sum(r["cnt"] for r in url_stats))

    import time as _time

    _verbose = bool(os.environ.get("SPARK_BUILD_VERBOSE"))
    _t0 = _time.perf_counter()

    def _lap(msg: str) -> None:
        nonlocal _t0
        if _verbose:
            t = _time.perf_counter()
            print(f"[build] {msg}: {t - _t0:.1f}s", flush=True)
            _t0 = t

    # stage-2 task grid: with few partitions, group whole shards
    # (seg_parts ≤ num_shards, split 1 — a term's entire posting list in
    # one task, df_global exact); when the job runs wider than the shard
    # count — the 10^12-doc regime where one shard ≫ one task's memory —
    # split each shard's buckets across ceil(wp/num_shards) tasks.
    #
    # The grid follows DATA volume, not core count (AQE-coalesce analog
    # for the storage shuffle): on a small corpus, core-count seg tasks
    # just fragment the flat postings (every stage-1 task opens one
    # writer PER pshard — 59 tasks × 32 pshards measured ~1.9k tiny
    # files and stage 2 anti-scaled 0.6s→2.6s going 8→32 cores on 100k
    # docs). At real scale rows/SEG_DOCS_PER_TASK ≫ cores and the cap
    # never binds.
    est_rows = None
    if map_groups is not None:
        est_rows = sum(g["rows"] for g in map_groups)
    elif url_stats is not None:
        est_rows = sum(r["cnt"] for r in url_stats)
    seg_wp = write_partitions
    if est_rows is not None:
        seg_wp = min(seg_wp, max(1, math.ceil(est_rows / SEG_DOCS_PER_TASK)))
    if seg_wp > num_shards:
        seg_split = math.ceil(seg_wp / num_shards)
        seg_parts = num_shards * seg_split
    else:
        seg_split = 1
        seg_parts = min(seg_wp, num_shards)

    # internal snapshot string folds in layout config so a shard/bucket/
    # partition-count change invalidates old partition manifests (resume is
    # only valid against the identical deterministic partitioning); the
    # trailing v-tag versions the boundary-sampling rule itself (v2 =
    # weighted stride-decimated sample) so indexes partitioned under an
    # older rule are rebuilt, never mixed
    snap = (
        f"{input_snapshot}#s{num_shards}b{n_buckets}p{write_partitions}"
        f"x{seg_split}{'+stem' if stem else ''}{'+pos' if positions else ''}"
        f"{f'+base{doc_id_base}' if doc_id_base else ''}"
        f"{f'+bs{bucket_size_override}' if bucket_size_override else ''}"
        f"{f'+map{len(map_groups)}' if map_groups is not None else ''}v2"
    )
    n_stage1 = len(map_groups) if map_groups is not None else write_partitions

    docs_stage = _read_manifest(index_dir, "stage-docs")
    if not (
        docs_stage
        and docs_stage.get("status") == "committed"
        and docs_stage.get("input_snapshot") == snap
    ):
        _wipe_stale(index_dir, snap)
        _write_snapshot_marker(index_dir, snap)
        from uci_searchengine_spark.plans.partitioning import (
            exact_repartition,
            pids_from_bounds,
            weighted_range_bounds,
        )

        if map_groups is not None:
            # MAP-ONLY path: url-sorted input files → per-group pyarrow
            # reads. Both the counts pre-pass and stage 1 are pure python
            # tasks; the JVM never touches the html bytes.
            group_files = {g["pid"]: g["files"] for g in map_groups}
            driver_r = exact_repartition(
                spark.createDataFrame(
                    [(g["pid"],) for g in map_groups], "pid int"
                ),
                len(map_groups),
                "pid",
            )
            counts = _cached_group_counts(
                spark, pages_path, map_groups, group_files, driver_r
            )
            _lap("map-only group counts")
            offsets: dict[int, int] = {}
            acc = doc_id_base
            for pid in sorted(counts):
                offsets[pid] = acc
                acc += counts[pid]
            n_docs = acc - doc_id_base
            bucket_size = bucket_size_override or max(
                1, math.ceil(n_docs / n_buckets)
            )
            inner = _stage1_fn(
                index_dir, snap, offsets, bucket_size, num_shards,
                seg_parts, seg_split, stem, positions,
            )
            driver_r.mapInPandas(
                _stage1_from_files_fn(inner, group_files),
                schema=_WRITE_RESULT_SCHEMA,
            ).collect()
            _lap("stage1 pass (map-only)")
            return _finish_stage1_and_pack(
                spark, index_dir, snap, n_stage1, n_docs, bucket_size,
                num_shards, n_buckets, seg_parts, seg_split,
                input_snapshot, stem, positions, _lap,
            )

        # deterministic url-range partitioning: one-job weighted sample →
        # boundaries → exact placement (repartitionByRange seeds its
        # sampler with the RDD id, so boundaries drift between reruns and
        # would corrupt per-partition resume)
        if url_stats is None:
            url_stats = _collect_url_stats()
        _lap("url-stats (count+sample, one job)")
        bounds = weighted_range_bounds(
            [(u, r["stride"]) for r in url_stats for u in r["urls"]],
            write_partitions,
        )
        pid_col = pids_from_bounds(bounds, F.col("url"))

        # dense-id offsets pre-pass over the URL COLUMN ALONE: the url
        # range-exchange is ~2% of the page bytes, so the count job stays
        # tiny, and the html payloads are shuffled exactly ONCE (inside
        # stage 1) and never persisted — at corpus scale you cannot cache
        # the crawl, so the build must not depend on it
        urls_ranged = (
            exact_repartition(
                pages.select("url").withColumn("_pid", pid_col),
                write_partitions,
                "_pid",
            )
            .sortWithinPartitions("url")
            .select("url")
        )
        counts = {
            r["pid"]: r["cnt"]
            for r in urls_ranged.mapInPandas(
                _dedup_count_fn, "pid int, cnt long"
            ).collect()
        }
        _lap("url-shuffle+counts")
        offsets: dict[int, int] = {}
        acc = doc_id_base
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        n_docs = acc - doc_id_base
        bucket_size = bucket_size_override or max(1, math.ceil(n_docs / n_buckets))

        ranged = (
            exact_repartition(
                pages.withColumn("_pid", pid_col), write_partitions, "_pid"
            )
            .sortWithinPartitions(
                "url", F.desc("warc_ts"), F.desc(F.xxhash64("html"))
            )
            .select("url", "html")
        )
        ranged.mapInPandas(
            _stage1_fn(
                index_dir,
                snap,
                offsets,
                bucket_size,
                num_shards,
                seg_parts,
                seg_split,
                stem,
                positions,
            ),
            schema=_WRITE_RESULT_SCHEMA,
        ).collect()
        _lap("stage1 pass")
        return _finish_stage1_and_pack(
            spark, index_dir, snap, n_stage1, n_docs, bucket_size,
            num_shards, n_buckets, seg_parts, seg_split,
            input_snapshot, stem, positions, _lap,
        )

    return _pack_and_finalize(
        spark, index_dir, snap,
        docs_stage["n_docs"], docs_stage["avgdl"], docs_stage["bucket_size"],
        num_shards, n_buckets, seg_parts, seg_split,
        input_snapshot, stem, positions, _lap,
    )


def _finish_stage1_and_pack(
    spark, index_dir, snap, n_stage1, n_docs, bucket_size,
    num_shards, n_buckets, seg_parts, seg_split,
    input_snapshot, stem, positions, _lap,
) -> IndexMeta:
    """Shared tail of both stage-1 paths: avgdl from the manifests,
    stage-docs commit, then stage 2 + meta."""
    # avgdl from the stage-1 manifests (each records Σ doc_len for its
    # partition) — no extra Spark job; falls back to a column-pruned
    # agg over the docs table for manifests from older layouts
    tot_dl = 0
    have_sums = True
    for pid in range(n_stage1):
        m = _read_manifest(index_dir, f"stage1-{pid:05d}")
        if not m or "doc_len_sum" not in m:
            have_sums = False
            break
        tot_dl += m["doc_len_sum"]
    if have_sums:
        avgdl = tot_dl / n_docs if n_docs else 0.0
    else:
        avgdl = float(
            spark.read.parquet(os.path.join(index_dir, "docs"))
            .agg(F.avg("doc_len"))
            .collect()[0][0]
            or 0.0
        )
    _lap("avgdl agg")
    _commit_manifest(
        index_dir,
        "stage-docs",
        {
            "status": "committed",
            "input_snapshot": snap,
            "n_docs": n_docs,
            "avgdl": avgdl,
            "num_shards": num_shards,
            "n_buckets": n_buckets,
            "bucket_size": bucket_size,
        },
    )
    return _pack_and_finalize(
        spark, index_dir, snap, n_docs, avgdl, bucket_size,
        num_shards, n_buckets, seg_parts, seg_split,
        input_snapshot, stem, positions, _lap,
    )


def _pack_and_finalize(
    spark, index_dir, snap, n_docs, avgdl, bucket_size,
    num_shards, n_buckets, seg_parts, seg_split,
    input_snapshot, stem, positions, _lap,
) -> IndexMeta:
    # Stage 2: NO Spark shuffle. Stage 1 already wrote the flat postings
    # partitioned by shard-group (pshard= hive dirs) — a "shuffle via
    # storage". Each stage-2 task reads exactly its group's files with
    # pyarrow, sorts in numpy (integer keys: term-rank/bucket/doc_id),
    # packs, and writes — pure parallel Python, which scales with cores
    # where the measured single-JVM exchange+sort did not. With
    # seg_split == 1 all buckets of a term stay together (term→shard), so
    # df_global is exact in-task; with seg_split > 1 (shard ≫ task
    # memory) each task holds a bucket-slice of its shard and the QUERY
    # aggregates df over the pruned scan in-plan (wand.score_wand).
    from uci_searchengine_spark.plans.partitioning import exact_repartition

    driver = spark.createDataFrame(
        [(p,) for p in range(seg_parts)], "pid int"
    )
    seg_write = exact_repartition(driver, seg_parts, "pid").mapInArrow(
        _pack_shard_group_fn(index_dir, snap, avgdl, positions=positions),
        schema=_WRITE_RESULT_SCHEMA,
    )
    seg_write.collect()
    _lap("stage2 pack+write")

    meta = IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        num_shards=num_shards,
        n_buckets=n_buckets,
        bucket_size=bucket_size,
        input_snapshot=input_snapshot,
        seg_split=seg_split,
        stem=stem,
        positions=positions,
    )
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        f.write(meta.to_json())
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def generation_dirs(index_dir: str) -> list[str]:
    """Root + every COMMITTED generation, in order. A generation exists
    for readers only once the root meta's ``gens`` counter includes it —
    an append killed between writing gen-N/meta.json and updating the
    root meta leaves gen-N invisible (and resumable), never half-read."""
    try:
        with open(os.path.join(index_dir, "meta.json")) as f:
            gens = int(json.load(f).get("gens", 1))
    except (OSError, json.JSONDecodeError):
        gens = 1
    out = [index_dir]
    for i in range(1, gens):
        d = os.path.join(index_dir, f"gen-{i}")
        if os.path.isfile(os.path.join(d, "meta.json")):
            out.append(d)
    return out


def generation_avgdl(gen_dir: str) -> float:
    """The avgdl this generation's block_max bounds were computed with
    (its own stage-docs manifest — the root meta gets re-blended on
    every append, the manifest keeps the build-time value)."""
    m = _read_manifest(gen_dir, "stage-docs")
    return float(m["avgdl"])


def _read_union(spark: SparkSession, dirs: list[str], sub: str) -> DataFrame:
    out = None
    for d in dirs:
        p = os.path.join(d, sub)
        if not os.path.isdir(p):
            continue
        df = spark.read.option("basePath", p).parquet(p)
        if sub == "segments":
            df = df.withColumn("gen_avgdl", F.lit(generation_avgdl(d)))
        out = df if out is None else out.unionByName(df)
    return out


# Analyzed-relation memo for the two index relations every query path
# re-opens. spark.read.parquet pays ~90 ms per call (file listing +
# footer schema job) on a relation whose FILES have not changed between
# the calls of one serving/bench process — 25-30% of a cold
# score_wand() call. The memo caches the LAZY analyzed DataFrame (a
# plan, never results: every query still executes from the parquet
# inputs) keyed on the Spark application id + a filesystem fingerprint
# of every file that could change what the relation reads: the sub
# dir's parquet files per committed generation, each generation's
# meta.json (gen_avgdl literal in _read_union), and the root meta.json
# (the gens counter that gates generation visibility). Any append /
# delete / compact / tombstone-rewrite / rebuild changes a fingerprint
# component → fresh read. Non-local paths (object stores at cluster
# scale) skip the memo: no cheap stat there, and a resident Searcher
# is the serving-tier answer instead.
_ANALYZED_CACHE: "dict[tuple, DataFrame]" = {}
_ANALYZED_CACHE_MAX = 64


def _fs_fingerprint(root: str) -> tuple:
    entries = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append(
                (os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
            )
    entries.sort()
    return tuple(entries)


def _load_relation(spark: SparkSession, index_dir: str, sub: str) -> DataFrame:
    dirs = generation_dirs(index_dir)

    def _read() -> DataFrame:
        if len(dirs) == 1:
            return spark.read.option(
                "basePath", os.path.join(index_dir, sub)
            ).parquet(os.path.join(index_dir, sub))
        return _read_union(spark, dirs, sub)

    if not os.path.isdir(index_dir):
        return _read()
    fp = []
    for d in dirs:
        try:
            st = os.stat(os.path.join(d, "meta.json"))
            fp.append((d, st.st_size, st.st_mtime_ns))
        except OSError:
            fp.append((d, -1, -1))
        fp.append(_fs_fingerprint(os.path.join(d, sub)))
    key = (
        spark.sparkContext.applicationId,
        index_dir,
        sub,
        tuple(fp),
    )
    df = _ANALYZED_CACHE.get(key)
    if df is None:
        df = _read()
        if len(_ANALYZED_CACHE) >= _ANALYZED_CACHE_MAX:
            _ANALYZED_CACHE.clear()
        _ANALYZED_CACHE[key] = df
    return df


def load_segments(spark: SparkSession, index_dir: str) -> DataFrame:
    return _load_relation(spark, index_dir, "segments")


def load_docs(spark: SparkSession, index_dir: str) -> DataFrame:
    return _load_relation(spark, index_dir, "docs")


def build_metrics(index_dir: str) -> dict:
    """Aggregate per-partition manifests into build metrics
    (reference analog: crawl_statistics, models.py:142-150)."""
    mdir = os.path.join(index_dir, "_manifest")
    out = {"partitions": 0, "docs": 0, "postings": 0, "bytes": 0}
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json") or fn.startswith("stage-"):
            continue
        with open(os.path.join(mdir, fn)) as f:
            m = json.load(f)
        out["partitions"] += 1
        out["docs"] += m.get("docs", 0)
        out["bytes"] += m.get("bytes", 0)
        # postings counted from the segment manifests only (the stage-1
        # flat-postings rows are the same postings pre-compression)
        if fn.startswith("segments-"):
            out["postings"] += m.get("postings", 0)
    return out
