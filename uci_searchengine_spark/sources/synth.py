"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Shape follows BASELINE.json input_hint exactly:
(url string, warc_ts timestamp, html binary, text string, lang string).
Corpus design follows FIXTURES.md §1/§3: Zipfian vocabulary (5,000 words),
~10 stop-like head terms present in >80% of docs (head-term skew for salted
repartitioning), HTML with titles (sometimes absent → title falls back to
url), script/style blocks, nested elements, multi-space runs, links of all
flavors (relative/absolute/#frag/mailto:/query-string), punctuation, mixed
case, Unicode words, digits/underscores, plus a few duplicate urls
(pre-dedup) and query-string urls.

Determinism: every random choice derives from splitmix64(seed, doc_id,
counter) — a counter-based hash, so the corpus is identical regardless of
Spark partitioning or parallelism (required for rank-identity across
cluster sizes). Generation runs distributed via mapInPandas over
spark.range(n) so it scales with the cluster.

The stored `text` column is produced by the pinned extractor itself
(functions/extract.py), so `text == extract(html)` byte-identically by
construction; tests re-verify this via the independent single-node oracle.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from uci_searchengine_spark.schema import PAGES_SCHEMA

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# fixed 5,000-word vocabulary: deterministic syllable products
_SYL_A = "ar bel cor dun el for gal hen ir jor kal lem mor nor ost per qua rel sor tur".split()
_SYL_B = "ba ce di fo gu ha ki lo mu ne po ru se ti vu wa xe yo za bre".split()
_SYL_C = "k l m n r s t v x z nd st rn lt".split()


def _build_vocab() -> list[str]:
    vocab = []
    for a in _SYL_A:
        for b in _SYL_B:
            for c in _SYL_C:
                vocab.append(a + b + c)
                if len(vocab) == 5000:
                    return vocab
    return vocab


VOCAB = np.array(_build_vocab())
STOP_TERMS = [f"stop{i}" for i in range(10)]  # head terms, >80% of docs
_UNICODE_WORDS = ["naïve", "café", "münchen", "東京", "résumé"]

# Zipf(s=1.07) CDF over the vocabulary
_ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_probs = 1.0 / _ranks**1.07
_probs /= _probs.sum()
_CDF = np.cumsum(_probs)

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 (counter-based, partition-free)."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> np.uint64(31))


def _rng_u64(seed: int, doc_id: int, stream: int, n: int) -> np.ndarray:
    base = np.uint64((seed * 0xA24BAED4963EE407) % (1 << 64))
    with np.errstate(over="ignore"):
        ctr = (
            base
            + np.uint64(doc_id) * np.uint64(1 << 22)
            + np.uint64(stream) * np.uint64(1 << 40)
            + np.arange(n, dtype=np.uint64)
        ) & _MASK
    return _splitmix64(ctr)


def _uniform(seed: int, doc_id: int, stream: int, n: int) -> np.ndarray:
    return _rng_u64(seed, doc_id, stream, n).astype(np.float64) / 2.0**64


def _gen_doc_html(doc_id: int, seed: int) -> tuple[str, str, str]:
    """Returns (url, html, lang) for one doc — pure function of (seed, doc_id)."""
    h = _rng_u64(seed, doc_id, 0, 16)
    n_tokens = 50 + int(h[0] % np.uint64(251))
    u = _uniform(seed, doc_id, 1, n_tokens)
    words = VOCAB[np.searchsorted(_CDF, u)].tolist()

    # head-term skew: each stop term present with p≈0.85
    stop_bits = _uniform(seed, doc_id, 2, len(STOP_TERMS))
    for si, s in enumerate(STOP_TERMS):
        if stop_bits[si] < 0.85:
            pos = int(h[1] >> np.uint64(si % 50)) % (len(words) + 1)
            words.insert(pos, s)

    # lexical variety: mixed case, punctuation, unicode, digits, underscores
    mut = _uniform(seed, doc_id, 3, len(words))
    for i in range(len(words)):
        m = mut[i]
        if m < 0.05:
            words[i] = words[i].capitalize()
        elif m < 0.08:
            words[i] = words[i].upper()
        elif m < 0.12:
            words[i] = words[i] + ","
        elif m < 0.14:
            words[i] = words[i] + "!"
        elif m < 0.15:
            words[i] = f"{words[i]}_{int(h[2] % np.uint64(100))}"
        elif m < 0.16:
            words[i] = str(int(h[3] % np.uint64(10000)))
        elif m < 0.165:
            words[i] = _UNICODE_WORDS[int(h[4] % np.uint64(len(_UNICODE_WORDS)))]

    # paragraphs of ~12 words; some double-space runs and newlines inside
    paras = []
    for p0 in range(0, len(words), 12):
        chunk = words[p0 : p0 + 12]
        joiner = "  " if (int(h[5]) + p0) % 5 == 0 else " "
        body = joiner.join(chunk)
        if (int(h[6]) + p0) % 7 == 0:
            body = body.replace(" ", "\n", 1)
        paras.append(body)

    parts = ["<html><head>"]
    has_title = (int(h[7]) % 10) != 0  # 10% of pages lack a title
    title_word = VOCAB[int(h[8] % np.uint64(len(VOCAB)))]
    if has_title:
        parts.append(f"<title>Page {title_word} {doc_id}</title>")
    parts.append("<style>body { color: #333; } .junk{display:none}</style>")
    parts.append("</head><body>")
    parts.append(f"<script>var x = 'SCRIPTJUNK{doc_id}'; if(x>1){{x=2;}}</script>")
    n_links = int(h[9] % np.uint64(6))
    link_pool = [
        f"/page/{int(h[10] % np.uint64(9999))}",
        f"https://www.example{int(h[11] % np.uint64(20))}.edu/a/{doc_id % 777}",
        "#frag",
        "mailto:someone@example.edu",
        f"item.php?id={doc_id % 555}",
        f"/list?track=xyz&n={doc_id % 33}",
    ]
    for li in range(n_links):
        parts.append(f'<a href="{link_pool[(li + int(h[12])) % len(link_pool)]}">l{li}</a>')
    depth = 1 + int(h[13] % np.uint64(3))
    parts.append("<div>" * depth)
    for pi, p in enumerate(paras):
        if pi % 4 == 3:
            parts.append(f"<div><p>{p}</p></div>")
        else:
            parts.append(f"<p>{p}</p>")
    parts.append("</div>" * depth)
    parts.append("</body></html>")
    html = "".join(parts)

    sub = ["www", "web", "docs", "data"][int(h[14] % np.uint64(4))]
    dom = int(h[15] % np.uint64(50))
    if doc_id % 53 == 7:
        url = f"https://{sub}.example{dom}.edu/item.php?id={doc_id}"
    else:
        url = f"https://{sub}.example{dom}.edu/doc/{doc_id}"
    lang_u = _uniform(seed, doc_id, 4, 1)[0]
    lang = "en" if lang_u < 0.9 else ("de" if lang_u < 0.96 else "zz")
    return url, html, lang


def gen_rows(doc_ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate pages rows for the given doc indexes (vector of int64)."""
    from uci_searchengine_spark.functions.extract import extract_one

    rows = []
    for doc_id in doc_ids.tolist():
        # a few duplicate urls pre-dedup (FIXTURES.md §1): every 97th doc
        # reuses the previous doc's url with a later warc_ts
        src = doc_id - 1 if (doc_id % 97 == 3 and doc_id > 0) else doc_id
        url, html, lang = _gen_doc_html(src, seed)
        if src != doc_id:  # duplicate url, same content, later ts
            ts = _EPOOCH_PLUS(src, extra=3)
        else:
            ts = _EPOOCH_PLUS(doc_id)
        hb = html.encode("utf-8")
        _, text, _ = extract_one(hb, url)
        rows.append((url, ts, hb, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def _EPOOCH_PLUS(i: int, extra: int = 0) -> dt.datetime:
    return _EPOCH + dt.timedelta(seconds=7 * i + extra)


def synth_pages(spark, n_docs: int, seed: int = 1337, partitions: int | None = None):
    """Distributed generation: spark.range(n) → mapInPandas → PAGES_SCHEMA."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), seed)

    return (
        spark.range(0, n_docs, numPartitions=parts)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def synth_pages_local(n_docs: int, seed: int = 1337) -> pd.DataFrame:
    """Single-node generation for the oracle/tests (identical output)."""
    return gen_rows(np.arange(n_docs, dtype=np.int64), seed)
