"""Boolean query syntax: bare terms (OR), ``+term`` (MUST), ``-term``
(MUST NOT), ``"quoted phrase"`` (exact token sequence required;
``"a b"~N`` relaxes it to ordered proximity with total gap ≤ N —
functions/phrase.py semantics), ``(a|b)`` (required ANY-OF group — the
synonym/constraint clause; a wildcard inside a boolean query desugars
to one, operators/boolean.py).

Group semantics: every result must contain ≥1 member of each group;
members score like ordinary positive terms (their own idf — Lucene's
scoring-boolean shape, not SynonymQuery's shared-position blending).
``-(a|b)`` = none of the members may appear (De Morgan into NOT terms).
A group that analyzes to one member is just a MUST term; an empty group
is dropped. Members that also appear as NOT terms are kept in the group
(``(a|b) -a -b`` is an honest contradiction and returns nothing).

The reference UI exposes none of this (backend/app/api/search.py is a
bare token OR); this is the breadth layer every fulltext engine grows.
Parsing is analyzer-aware: each captured chunk runs through the index's
analysis chain (tokenize + optional stem), so a ``+Databases`` matches
the same stemmed term the index stores.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_PHRASE_RE = re.compile(r'([+-]?)"([^"]*)"(?:~(\d+))?')
_GROUP_RE = re.compile(r"([+-]?)\(([^)]*)\)")


@dataclass
class BoolQuery:
    or_terms: list[str] = field(default_factory=list)      # any-of, scored
    must_terms: list[str] = field(default_factory=list)    # all required
    not_terms: list[str] = field(default_factory=list)     # none allowed
    phrases: list[list[str]] = field(default_factory=list)  # required seqs
    groups: list[list[str]] = field(default_factory=list)   # req any-of sets
    # per-phrase ordered-proximity budgets ('"a b"~N'; 0 = exact). Kept
    # parallel to ``phrases``; read through ``slops()`` so BoolQuery
    # values built by hand (tests, injection) stay valid.
    phrase_slops: list[int] = field(default_factory=list)

    def slops(self) -> list[int]:
        """phrase_slops padded with 0 to len(phrases)."""
        return (self.phrase_slops + [0] * len(self.phrases))[
            : len(self.phrases)
        ]

    @property
    def positive_terms(self) -> list[str]:
        """Distinct scoring terms: or + must + group members + phrase
        tokens, in first-appearance order."""
        out: dict[str, None] = {}
        for t in self.or_terms + self.must_terms:
            out.setdefault(t)
        for g in self.groups:
            for t in g:
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


_BOOST = re.compile(r"^(\S+?)\^(\d+(?:\.\d+)?)$")


def parse_boosts(q: str) -> "tuple[str, dict[str, float]]":
    """Strip Lucene-style query-time boosts: a whitespace token
    ``chunk^N`` (N a positive number) contributes ``{chunk: N}`` and the
    bare chunk flows on to the normal parse. Quoted phrases and groups
    are left untouched (term-level boosts only — the common case; a
    boosted phrase stays literal and will fail analysis loudly rather
    than silently dropping the ^). Duplicate boosted chunks keep the
    MAX boost. ``^0`` (a zero weight is a disguised NOT — use ``-term``)
    and negative boosts raise ValueError."""
    out: list[str] = []
    boosts: dict[str, float] = {}
    for raw in q.split():
        m = _BOOST.match(raw)
        if not m or '"' in raw or "(" in raw or ")" in raw:
            out.append(raw)
            continue
        chunk, b = m.group(1), float(m.group(2))
        if b <= 0:
            raise ValueError(f"boost must be > 0, got {raw!r}")
        boosts[chunk] = max(boosts.get(chunk, 0.0), b)
        out.append(chunk)
    return " ".join(out), boosts


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
            # negated phrase desugars to NOT over its tokens (stricter,
            # documented) — a slop suffix changes nothing there
            bq.not_terms.extend(toks)
        elif len(toks) == 1:
            (bq.must_terms if m.group(1) == "+" else bq.or_terms).append(toks[0])
        else:
            bq.phrases.append(toks)
            bq.phrase_slops.append(int(m.group(3) or 0))
            if m.group(1) == "+":
                pass  # phrases are always required
        return " "

    rest = _PHRASE_RE.sub(eat_phrase, q)

    def eat_group(m: re.Match) -> str:
        members: dict[str, None] = {}
        for piece in m.group(2).split("|"):
            for t in analyze(piece):
                members.setdefault(t)
        mem = list(members)
        if not mem:
            return " "
        if m.group(1) == "-":
            bq.not_terms.extend(mem)
        elif len(mem) == 1:
            bq.must_terms.append(mem[0])
        else:
            bq.groups.append(mem)
        return " "

    rest = _GROUP_RE.sub(eat_group, rest)
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
