"""Boolean query syntax: bare terms (OR), ``+term`` (MUST), ``-term``
(MUST NOT), ``"quoted phrase"`` (exact token sequence required).

The reference UI exposes none of this (backend/app/api/search.py is a
bare token OR); this is the breadth layer every fulltext engine grows.
Parsing is analyzer-aware: each captured chunk runs through the index's
analysis chain (tokenize + optional stem), so a ``+Databases`` matches
the same stemmed term the index stores.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"')


@dataclass
class BoolQuery:
    or_terms: list[str] = field(default_factory=list)      # any-of, scored
    must_terms: list[str] = field(default_factory=list)    # all required
    not_terms: list[str] = field(default_factory=list)     # none allowed
    phrases: list[list[str]] = field(default_factory=list)  # required seqs

    @property
    def positive_terms(self) -> list[str]:
        """Distinct scoring terms: or + must + phrase tokens, in first-
        appearance order."""
        out: dict[str, None] = {}
        for t in self.or_terms + self.must_terms:
            out.setdefault(t)
        for p in self.phrases:
            for t in p:
                out.setdefault(t)
        return list(out)

    @property
    def required_terms(self) -> list[str]:
        """Distinct terms every result MUST contain: must + phrase
        tokens (a doc holding a phrase necessarily holds its tokens)."""
        out: dict[str, None] = {}
        for t in self.must_terms:
            out.setdefault(t)
        for p in self.phrases:
            for t in p:
                out.setdefault(t)
        return list(out)


def parse_query(q: str, analyze) -> BoolQuery:
    """Parse the boolean syntax; ``analyze(text) -> list[str]`` is the
    index's analysis chain applied to each captured chunk.

    * ``-"a b"`` (negated phrase) is parsed as NOT over the phrase's
      tokens — stricter than pure phrase negation, documented behavior.
    * a ``+``/``-`` chunk that analyzes to multiple tokens applies the
      prefix to every token (``+data-base`` requires both).
    """
    bq = BoolQuery()

    def eat_phrase(m: re.Match) -> str:
        toks = analyze(m.group(2))
        if not toks:
            return " "
        if m.group(1) == "-":
            bq.not_terms.extend(toks)
        elif len(toks) == 1:
            (bq.must_terms if m.group(1) == "+" else bq.or_terms).append(toks[0])
        else:
            bq.phrases.append(toks)
            if m.group(1) == "+":
                pass  # phrases are always required
        return " "

    rest = _PHRASE_RE.sub(eat_phrase, q)
    for chunk in rest.split():
        sign = ""
        if chunk[0] in "+-":
            sign, chunk = chunk[0], chunk[1:]
        toks = analyze(chunk)
        if not toks:
            continue
        if sign == "-":
            bq.not_terms.extend(toks)
        elif sign == "+":
            bq.must_terms.extend(toks)
        else:
            bq.or_terms.extend(toks)
    # dedup, drop NOT terms from positives (a term can't be both)
    bq.not_terms = list(dict.fromkeys(bq.not_terms))
    ban = set(bq.not_terms)
    bq.or_terms = [t for t in dict.fromkeys(bq.or_terms) if t not in ban]
    bq.must_terms = [t for t in dict.fromkeys(bq.must_terms) if t not in ban]
    return bq
