"""Optional Porter stemmer for the analysis chain (north-star
"tokenize/stem"; OFF by default — FIXTURES.md §5 pins the reference
tokenizer with NO stemming for every correctness fixture, so stemming is
an opt-in build flag recorded in the index metadata and applied
symmetrically to queries at serving time).

Implementation is the classic Porter algorithm (M.F. Porter, "An
algorithm for suffix stripping", Program 14(3) 1980 — public domain
algorithm). Pure Python per *unique* token with an in-batch vocabulary
memo: token frequency is Zipfian, so inside an Arrow batch we stem each
distinct surface form once (pandas ``factorize``) and broadcast the
result — the per-row hot path stays a C-level take(), not a Python loop
per token.
"""

from __future__ import annotations

import pandas as pd

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    """Classic Porter stem of a lowercase token (non-alpha pass through)."""
    if len(w) <= 2 or not w.isascii() or not w.isalpha():
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not (stem and stem[-1] in "st"):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def stem_tokens(tokens: list[str], memo: dict[str, str] | None = None) -> list[str]:
    """Stem a token list through a caller-supplied memo (oracle path)."""
    if memo is None:
        memo = {}
    out = []
    for t in tokens:
        s = memo.get(t)
        if s is None:
            s = porter_stem(t)
            memo[t] = s
        out.append(s)
    return out


def stem_token_series(s: pd.Series) -> pd.Series:
    """Series[list[str]] -> Series[list[str]] with per-batch vocab memo.

    Explodes to a flat token array, factorizes (C), stems each DISTINCT
    token once, then takes the stemmed vocabulary back through the codes
    and regroups — Python executes once per unique surface form, not per
    occurrence.
    """
    lens = s.map(len)
    flat = pd.Series(
        [t for toks in s for t in toks], dtype=object
    )
    if not len(flat):
        return s.map(lambda _: [])
    codes, uniques = pd.factorize(flat, sort=False)
    stemmed_vocab = pd.array([porter_stem(u) for u in uniques], dtype=object)
    stemmed_flat = stemmed_vocab.take(codes)
    out, pos = [], 0
    arr = list(stemmed_flat)
    for n in lens:
        out.append(arr[pos : pos + n])
        pos += n
    return pd.Series(out, index=s.index, dtype=object)
