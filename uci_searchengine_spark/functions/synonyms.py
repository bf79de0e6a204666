"""Query-time synonym expansion.

ES/Lucene analog: the query-side ``synonym`` token filter. A synonym
map ``{term: [alternatives...]}`` rewrites a parsed boolean query so
each clause keeps its SEMANTIC ROLE while accepting any member of the
synonym class:

* bare (SHOULD) term  → the alternatives join as extra SHOULD terms —
  a doc matching any member scores;
* ``+must`` term      → a required ANY-OF group ``(term|alts...)`` —
  exactly the engine's existing group semantics (the constraint is
  "some member present", Lucene's SynonymQuery eligibility);
* ``-not`` term       → ALL members banned (conservative negation: if
  the user bans "car" with car≈auto, a doc saying "auto" is banned
  too — the ES behavior for synonym-analyzed NOT clauses);
* quoted phrases are NEVER expanded (multi-token synonym graphs inside
  phrases need position-graph matching; documented boundary).

Scoring divergence from Lucene, shared with the wildcard/fuzzy/regex
rewrites and documented once here: members score with their OWN idf
(scoring-boolean rewrite), not SynonymQuery's blended shared-df. This
keeps the scorer and the SQL oracles exact.

The map is applied AFTER analysis on both keys and values (an index
built with stemming looks up stemmed forms), is direction-explicit
(``a: [b]`` does not imply ``b: [a]`` — pass ``symmetric=True`` to
close it), and expansion is idempotent: expanded members are not
re-expanded (no transitive chains, the Lucene flatten rule).

Reference: no synonym support exists in UCI-SearchEngine; breadth
extension.
"""

from __future__ import annotations

from uci_searchengine_spark.functions.queryparse import BoolQuery


def normalize_synonyms(
    raw: dict[str, list[str]],
    analyze,
    symmetric: bool = False,
) -> dict[str, list[str]]:
    """Analyzer-normalize a user synonym map: keys and values run
    through the index's analysis chain; multi-token entries are dropped
    (single-token classes only — the phrase boundary above); self-maps
    and duplicates removed; optionally closed symmetrically (every
    member maps to every other member of its class)."""

    def one(tok: str) -> "str | None":
        ts = analyze(tok)
        return ts[0] if len(ts) == 1 else None

    norm: dict[str, list[str]] = {}
    for k, vals in raw.items():
        nk = one(k)
        if nk is None:
            continue
        out: dict[str, None] = {}
        for v in vals:
            nv = one(v)
            if nv is not None and nv != nk:
                out.setdefault(nv)
        if out:
            norm.setdefault(nk, [])
            for v in out:
                if v not in norm[nk]:
                    norm[nk].append(v)
    if symmetric:
        classes: dict[str, list[str]] = {
            k: [k, *v] for k, v in norm.items()
        }
        closed: dict[str, dict[str, None]] = {}
        for members in classes.values():
            for m in members:
                closed.setdefault(m, {})
                for o in members:
                    if o != m:
                        closed[m].setdefault(o)
        norm = {k: list(v) for k, v in closed.items()}
    return norm


def apply_synonyms(bq: BoolQuery, synmap: dict[str, list[str]]) -> BoolQuery:
    """Rewrite a parsed BoolQuery under a NORMALIZED synonym map (see
    ``normalize_synonyms``). Pure function — returns a new BoolQuery;
    phrases and their slops pass through untouched."""
    out = BoolQuery(
        phrases=[list(p) for p in bq.phrases],
        phrase_slops=list(bq.slops()),
    )
    # SHOULD terms: members join as extra SHOULD terms
    seen: dict[str, None] = {}
    for t in bq.or_terms:
        seen.setdefault(t)
        for s in synmap.get(t, ()):
            seen.setdefault(s)
    out.or_terms = list(seen)
    # MUST terms: a synonymed must becomes a required any-of group
    for t in bq.must_terms:
        alts = synmap.get(t, ())
        if alts:
            out.groups.append([t, *alts])
        else:
            out.must_terms.append(t)
    # existing groups: each member expands inside its group
    for g in bq.groups:
        mem: dict[str, None] = {}
        for t in g:
            mem.setdefault(t)
            for s in synmap.get(t, ()):
                mem.setdefault(s)
        out.groups.append(list(mem))
    # NOT terms: ban the whole class
    ban: dict[str, None] = {}
    for t in bq.not_terms:
        ban.setdefault(t)
        for s in synmap.get(t, ()):
            ban.setdefault(s)
    out.not_terms = list(ban)
    # re-apply the parser's invariant: a term can't be positive and
    # banned at once (the NOT set wins; honest contradiction semantics)
    bset = set(out.not_terms)
    out.or_terms = [t for t in out.or_terms if t not in bset]
    out.must_terms = [t for t in out.must_terms if t not in bset]
    return out
