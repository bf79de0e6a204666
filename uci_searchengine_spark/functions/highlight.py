"""Multi-fragment highlighting (ES ``highlight`` / Lucene unified
highlighter analog).

The reference pins ONE snippet rule (window around the first
occurrence — search.py:41-65, kept verbatim on every envelope); this is
the extension surface every search UI grows next: up to ``n_frags``
fragments per doc, each a fixed-width window around a CLUSTER of term
occurrences, matches wrapped in ``<em>``.

Pinned semantics (deterministic, substring-match — the same matching
rule as the reference snippet, which highlights raw query forms by
lowercase ``find``):

1. occurrence starts = every (lowercased) occurrence of every term in
   the lowercased text, sorted ascending, overlapping terms allowed;
2. fragments are built greedily left-to-right: the first uncovered
   occurrence ``p`` opens the window ``[max(0, p - lead), ... + frag_len)``
   (``lead`` = frag_len // 4 of context before the match); every
   occurrence inside the window joins the fragment; the next fragment
   starts at the first occurrence beyond it; stop after ``n_frags``;
3. tagging wraps each occurrence that lies FULLY inside the fragment
   with ``<em>…</em>``, longest term first at equal starts (so ``data``
   inside ``database`` never splits a tag);
4. no occurrences → one leading fragment of the first ``frag_len``
   chars, untagged (the reference snippet's fallback rule).

Pure python over ONE doc's text — serving-side bounded work, never a
corpus operator.
"""

from __future__ import annotations


def _occurrences(low: str, terms: list[str]) -> list[tuple[int, int]]:
    """Sorted (start, end) of every occurrence of every term (lowercase
    substring rule). Longer term wins at equal starts."""
    occ: list[tuple[int, int]] = []
    for t in {t.lower() for t in terms if t}:
        i = low.find(t)
        while i != -1:
            occ.append((i, i + len(t)))
            i = low.find(t, i + 1)
    # start asc, longer first at equal starts
    occ.sort(key=lambda se: (se[0], -(se[1] - se[0])))
    return occ


def highlight_fragments(
    text: str,
    terms: list[str],
    n_frags: int = 3,
    frag_len: int = 120,
    pre: str = "<em>",
    post: str = "</em>",
) -> list[str]:
    """Up to ``n_frags`` tagged fragments per the module's pinned rule."""
    if frag_len < 1 or n_frags < 1:
        raise ValueError("frag_len and n_frags must be >= 1")
    low = text.lower()
    occ = _occurrences(low, terms)
    if not occ:
        return [text[:frag_len]] if text else []
    lead = frag_len // 4
    frags: list[tuple[int, int]] = []
    i = 0
    while i < len(occ) and len(frags) < n_frags:
        start = max(0, occ[i][0] - lead)
        end = min(len(text), start + frag_len)
        frags.append((start, end))
        while i < len(occ) and occ[i][0] < end:
            i += 1
    out = []
    for start, end in frags:
        # tag occurrences fully inside [start, end), skipping overlaps
        # with an already-tagged span (longest-first order above)
        parts: list[str] = []
        cur = start
        for s, e in occ:
            if s < cur or s < start:
                continue
            if e > end:
                continue
            parts.append(text[cur:s])
            parts.append(pre + text[s:e] + post)
            cur = e
        parts.append(text[cur:end])
        out.append("".join(parts))
    return out
