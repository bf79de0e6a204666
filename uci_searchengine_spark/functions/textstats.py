"""Text-analysis functions for large-scale training-data pipelines.

All hot-path logic is built-in pyspark.sql.functions (JVM, whole-stage
codegen) — no Python UDFs. Each function returns Column expressions so
Catalyst can fold them into the scan projection.

Operators: token counting (whitespace + BPE-ish regex), quality scoring
(length/punct/stopword ratios), language ID (n-gram/stopword heuristic),
document fingerprinting (rolling content hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from uci_searchengine_spark.functions.hof import bind_once

# tiny per-language stopword marker sets for the heuristic language ID
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "es": ["el", "la", "los", "que", "de", "y", "en", "por"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "que"],
}


def ws_token_count(c: Column) -> Column:
    """Whitespace token count (reference doc-length intent, search.py:92)."""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish token estimate: count word pieces + digits + punctuation runs
    (a GPT-2-style pre-tokenizer regex approximation, JVM-side)."""
    # count matches of: word chunks (≤4 chars each contributes pieces),
    # approximated as ceil(chars_in_words/4) + punctuation runs
    word_chars = F.length(F.regexp_replace(c, r"[^\p{L}\p{N}_]", ""))
    punct_runs = F.size(F.regexp_extract_all(c, F.lit(r"[^\p{L}\p{N}_\s]+"), F.lit(0)))
    return (F.ceil(word_chars / F.lit(4.0)) + punct_runs).cast("long")


def quality_score(c: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation ratio +
    stopword presence + mean word length band (C4/Gopher-rule flavored)."""
    n_chars = F.length(c)
    toks = F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )

    def score_of(tt: Column) -> Column:
        n_tokens = F.size(tt)
        punct = F.length(F.regexp_replace(c, r"[^!?.,;:]", ""))
        punct_ratio = punct / F.greatest(n_chars, F.lit(1))
        stop_hits = F.size(
            F.array_intersect(
                F.transform(tt, lambda t: F.lower(t)),
                F.array(*[F.lit(w) for w in LANG_MARKERS["en"]]),
            )
        )
        mean_wlen = n_chars / F.greatest(n_tokens, F.lit(1))
        len_ok = (n_tokens >= 10) & (n_tokens <= 100000)
        wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
        score = (
            F.when(len_ok, 0.4).otherwise(0.0)
            + F.when(wlen_ok, 0.2).otherwise(0.0)
            + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
            + F.when(stop_hits >= 2, 0.2).otherwise(0.0)
        )
        return score.cast("double")

    # the token split is referenced several times; bind it once
    return bind_once(toks, score_of)


def lang_id(c: Column) -> Column:
    """Heuristic language ID: argmax of per-language marker-word hits,
    'und' when nothing matches. Pure JVM expressions."""
    toks = F.transform(
        F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
            F.split(F.trim(F.lower(c)), r"\s+")
        ),
        lambda t: F.regexp_replace(t, r"[^\p{L}\p{N}_]", ""),
    )
    order = ["en", "de", "es", "fr"]

    def pick(hh: Column) -> Column:
        # hh = per-language hit counts in ``order``; bound once so the
        # when-chain's repeated references don't re-run the splits
        best = F.greatest(*[hh[i] for i in range(len(order))])
        expr = F.lit("und")
        # deterministic priority order on ties: en > de > es > fr
        for i, lang in reversed(list(enumerate(order))):
            expr = F.when(
                (hh[i] > 0) & (hh[i] == best), F.lit(lang)
            ).otherwise(expr)
        return expr

    def inner(tt: Column) -> Column:
        hits_arr = F.array(
            *[
                F.size(
                    F.array_intersect(
                        tt, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
                    )
                )
                for lang in order
            ]
        )
        return bind_once(hits_arr, pick)

    return bind_once(toks, inner)


def fingerprint(c: Column) -> Column:
    """Stable 64-bit content fingerprint of normalized text (xxhash64 of
    whitespace-collapsed lowercase) — exact-dup key."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def fingerprint_md5(c: Column) -> Column:
    """MD5 hex fingerprint (same normalization) — portable across engines
    (DuckDB md5 == Spark md5), used by the correctness oracle."""
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# PII scrubbing: the redaction pass every training-data pipeline runs
# before tokenization. Pure JVM regexp_replace chain (folds into the scan
# projection); patterns kept engine-portable (no lookaround) so the
# DuckDB oracle applies the identical regexes.
PII_PATTERNS = [
    # order matters: emails before bare digit runs
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\+?\d{1,3}[-. ])?(?:\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
]


def redact_pii(c: Column) -> Column:
    """Replace emails / phone numbers / SSNs / card-like digit runs with
    typed placeholder tokens."""
    out = c
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_hit_count(c: Column) -> Column:
    """How many PII placeholders redaction would emit (audit metric)."""
    red = redact_pii(c)
    n = F.lit(0)
    for _pat, token in PII_PATTERNS:
        n = n + F.size(F.split(red, F.lit(token).cast("string"), -1)) - 1
    return n.cast("long")


# Repetition statistics: the Gopher-rule family (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", table A1) that training-data
# pipelines apply to drop boilerplate/spam documents. All pure JVM:
# the max-frequency computation sorts the token array once and takes
# the longest equal-run via a single aggregate() pass — O(n log n) per
# row, no per-word groupBy, no Python.


def _max_run_frac(arr: Column) -> Column:
    """max frequency of any element / len(arr), via longest run in the
    sorted array (a single JVM aggregate pass; 0.0 for empty arrays)."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    def frac(aa: Column) -> Column:
        best = F.aggregate(F.array_sort(aa), acc0, merge, lambda a: a["best"])
        return F.when(F.size(aa) <= 0, F.lit(0.0)).otherwise(
            best / F.size(aa)
        )

    # three references (sort+fold, two sizes); bind the array once
    return bind_once(arr, frac)


def _ws_tokens(c: Column) -> Column:
    t = F.trim(F.lower(c))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def top_word_fraction(c: Column) -> Column:
    """Fraction of tokens taken by the single most frequent token."""
    return _max_run_frac(_ws_tokens(c))


def top_bigram_fraction(c: Column) -> Column:
    """Fraction of adjacent-token bigrams taken by the most frequent
    bigram (0.0 for docs with < 2 tokens)."""
    def grams_of(tt: Column) -> Column:
        # slice probes inside the per-position lambda: without the bind
        # the tokenizer split re-runs once per position
        return F.when(
            F.size(tt) < 2, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(tt) - 2),
                lambda i: F.concat_ws(" ", F.slice(tt, i + 1, 2)),
            )
        )

    return _max_run_frac(bind_once(_ws_tokens(c), grams_of))


def duplicate_line_fraction(c: Column) -> Column:
    """Fraction of non-empty trimmed lines that are duplicates of an
    earlier line — the Gopher boilerplate signal. 0.0 when no lines."""
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )

    def frac(ll: Column) -> Column:
        return F.when(F.size(ll) <= 0, F.lit(0.0)).otherwise(
            (F.size(ll) - F.size(F.array_distinct(ll))) / F.size(ll)
        )

    return bind_once(lines, frac)
