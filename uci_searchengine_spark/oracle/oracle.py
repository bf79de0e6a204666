"""Single-node oracle: reference semantics in plain Python/numpy.

This is the ground truth the Spark engine must match rank-identically
(FIXTURES.md §6-8). It transcribes:

* tokenizer — backend/app/api/tokenizer.py:5-9 (via functions.tokenize),
* extractor — backend/app/api/crawler.py:412-418 (via functions.extract:
  the same pinned 7-line cleanup over stdlib html.parser),
* BM25 (Lucene-style idf, k1=1.2 b=0.75, OR semantics, score>0,
  tie-break doc_id asc) — replacing the reference's internally inconsistent
  TF-IDF (crawler.py:457 vs search.py:98; see SURVEY.md §2.9),
* snippet + result envelope — backend/app/api/search.py:41-65,119-126.

Deliberately naive and obviously-correct: dict-of-lists index, exhaustive
scoring, no compression, no pruning.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from uci_searchengine_spark import BM25_B, BM25_K1
from uci_searchengine_spark.functions.extract import extract_one
from uci_searchengine_spark.functions.tokenize import tokenize_py


def dedup_pages(pages: pd.DataFrame) -> pd.DataFrame:
    """Dedup by url keeping latest warc_ts (input_hint: dedup by url).

    Tie-break on equal (url, warc_ts): xxhash64(html) DESC — the identical
    rule used by operators.index_build.dedup_by_url and the stage-1 build
    sort, with a stable mergesort so the kept row is fully deterministic.
    """
    from uci_searchengine_spark.functions.xxhash import xxhash64

    hkey = pages["html"].map(lambda h: xxhash64(bytes(h)))
    return (
        pages.assign(_hkey=hkey)
        .sort_values(
            ["url", "warc_ts", "_hkey"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        .drop_duplicates("url", keep="first")
        .drop(columns=["_hkey"])
        .sort_values("url", kind="mergesort")
        .reset_index(drop=True)
    )


class OracleIndex:
    def __init__(self, pages: pd.DataFrame):
        """pages: columns (url, warc_ts, html, text, lang)."""
        pages = dedup_pages(pages)
        # deterministic dense doc ids: sort by url (SURVEY.md §4 item 4)
        self.urls = pages["url"].tolist()
        self.titles = []
        self.texts = []
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len = np.zeros(len(self.urls), dtype=np.int64)
        for doc_id, (url, html) in enumerate(zip(self.urls, pages["html"])):
            title, text, _links = extract_one(bytes(html), url)
            self.titles.append(title)
            self.texts.append(text)
            toks = tokenize_py(text)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(self.urls)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, query: str) -> dict[int, float]:
        """OR-union BM25 scores (search.py:79-100 semantics, BM25 formula)."""
        terms = list(dict.fromkeys(tokenize_py(query)))  # dedup, keep order
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = self.idf(t)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                tf_part = (
                    tf * (BM25_K1 + 1.0)
                    / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / self.avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + w * tf_part
        return {d: s for d, s in scores.items() if s > 0}  # search.py:102

    def top_k(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores = self.score(query)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def top_k_and(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Conjunctive variant: only docs containing EVERY query term
        (post-dedup) are eligible; scores are the same OR-sum BM25."""
        terms = list(dict.fromkeys(tokenize_py(query)))
        if not terms:
            return []
        eligible: set[int] | None = None
        for t in terms:
            docs = set(self.postings.get(t, ()))
            eligible = docs if eligible is None else (eligible & docs)
            if not eligible:
                return []
        scores = self.score(query)
        kept = [(d, s) for d, s in scores.items() if d in eligible]
        return sorted(kept, key=lambda kv: (-kv[1], kv[0]))[:k]

    def top_k_phrase(self, phrase: str, k: int = 10) -> list[tuple[int, float, int]]:
        """Exact token-sequence match: (doc_id, score, n_occ) for docs
        whose token stream contains the phrase, ranked like top_k."""
        from uci_searchengine_spark.functions.phrase import count_phrase_py

        seq = tokenize_py(phrase)
        if not seq:
            return []
        scores = self.score(phrase)
        out = []
        for d, s in scores.items():
            n = count_phrase_py(tokenize_py(self.texts[d]), seq)
            if n > 0:
                out.append((d, s, n))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def top_k_near(
        self, phrase: str, k: int = 10, slop: int = 0
    ) -> list[tuple[int, float, int]]:
        """Ordered proximity match (functions/phrase.py semantics):
        (doc_id, score, n_occ) for docs where the sequence matches in
        order within a total gap budget of ``slop``; n_occ = matching
        start positions. slop=0 coincides with top_k_phrase's set."""
        from uci_searchengine_spark.functions.phrase import count_near_py

        seq = tokenize_py(phrase)
        if not seq:
            return []
        scores = self.score(phrase)
        out = []
        for d, s in scores.items():
            n = count_near_py(tokenize_py(self.texts[d]), seq, slop)
            if n > 0:
                out.append((d, s, n))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out[:k]

    def top_k_msm(
        self, query: str, k: int = 10, m: int = 1
    ) -> list[tuple[int, float]]:
        """minimum_should_match: only docs containing at least ``m``
        DISTINCT query terms are eligible; scores are the same OR-sum
        BM25 (eligibility changes, scores never do)."""
        terms = list(dict.fromkeys(tokenize_py(query)))
        if not terms or m > len(terms):
            return []
        counts: dict[int, int] = {}
        for t in terms:
            for d in set(self.postings.get(t, ())):
                counts[d] = counts.get(d, 0) + 1
        scores = self.score(query)
        kept = [(d, s) for d, s in scores.items() if counts.get(d, 0) >= m]
        return sorted(kept, key=lambda kv: (-kv[1], kv[0]))[:k]

    def boolean_top_k(
        self, query: str, k: int = 10, synonyms=None
    ) -> list[tuple[int, float]]:
        """Boolean syntax (functions/queryparse.py): OR terms scored,
        +must all present, -not none present, "phrases" required as exact
        sequences ('"a b"~N' = ordered proximity). Score = OR-sum BM25
        over the positive terms. ``synonyms`` = raw query-time map
        (functions/synonyms.py clause rules)."""
        from uci_searchengine_spark.functions.phrase import count_near_py
        from uci_searchengine_spark.functions.queryparse import parse_query

        bq = parse_query(query, tokenize_py)
        if synonyms:
            from uci_searchengine_spark.functions.synonyms import (
                apply_synonyms,
                normalize_synonyms,
            )

            bq = apply_synonyms(
                bq, normalize_synonyms(synonyms, tokenize_py)
            )
        pos = bq.positive_terms
        if not pos:
            return []
        scores = self.score(" ".join(pos))
        req = bq.required_terms
        out = []
        for d, s in scores.items():
            if any(d not in self.postings.get(t, {}) for t in req):
                continue
            if any(
                all(d not in self.postings.get(m, {}) for m in g)
                for g in bq.groups
            ):
                continue  # an any-of group with no member present
            if any(d in self.postings.get(t, {}) for t in bq.not_terms):
                continue
            toks = None
            ok = True
            for p, sl in zip(bq.phrases, bq.slops()):
                toks = tokenize_py(self.texts[d]) if toks is None else toks
                if count_near_py(toks, p, sl) == 0:
                    ok = False
                    break
            if ok:
                out.append((d, s))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:k]

    def snippet(self, doc_id: int, query_terms: list[str], max_length: int = 200) -> str:
        """search.py:41-65 verbatim semantics."""
        text = self.texts[doc_id].lower()
        positions = [p for t in query_terms if (p := text.find(t.lower())) != -1]
        if not positions:
            return text[:max_length] + "..."
        start_pos = max(0, min(positions) - 50)
        end_pos = min(len(text), start_pos + max_length)
        snippet = text[start_pos:end_pos]
        if start_pos > 0:
            snippet = "..." + snippet
        if end_pos < len(text):
            snippet = snippet + "..."
        return snippet

    def search(self, query: str, page: int = 1, per_page: int = 10) -> dict:
        """Full result envelope per search.py:119-126."""
        terms = tokenize_py(query)
        if not terms:
            return {
                "query": query,
                "total_results": 0,
                "page": page,
                "per_page": per_page,
                "total_pages": 0,
                "results": [],
            }
        ranked = sorted(self.score(query).items(), key=lambda kv: (-kv[1], kv[0]))
        start, end = (page - 1) * per_page, page * per_page
        results = [
            {
                "url": self.urls[d],
                "title": self.titles[d],
                "snippet": self.snippet(d, terms),
                "score": s,
            }
            for d, s in ranked[start:end]
        ]
        return {
            "query": query,
            "total_results": len(ranked),
            "page": page,
            "per_page": per_page,
            "total_pages": math.ceil(len(ranked) / per_page),
            "results": results,
        }


REFERENCE_QUERIES = [
    # FIXTURES.md §7 coverage surface
    "stop0",                      # single common (head) term
    "arbak",                      # single rare-ish term
    "zzzznotaword",               # absent term → empty envelope
    "arbak stop1",                # multi-term OR, overlap mix
    "arband arbast",              # multi-term, rare pair
    "stop0 stop0 stop0",          # repeated term (dedup before scoring)
    "!!! ...",                    # punctuation-only → empty tokenization
    "ArBaK STOP2",                # mixed case
    "naïve café",                 # unicode
    "stop0 stop1 stop2 stop3",    # >50% of corpus (WAND stress)
    "arbak arbal arbam arban arbar arbas arbat arbav",  # 8-term long query
]
