"""Infix wildcard queries (trigram posting index — the Cox 2012 /
pg_trgm / Google-Code-Search shape): pattern parsing, required-trigram
extraction, the no-false-negative candidate property on random data,
indexed-expansion == brute-force-verify equality on both the live and
the persisted-plane path, plane freshness, and end-to-end
wildcard_search cross-checked against the (already-oracled) regexp
rewrite with an equivalent pattern."""

import math
import random
import re

import pytest

from uci_searchengine_spark.operators.trigram import (
    MAX_EXPANSIONS,
    is_infix_pattern,
    like_pattern,
    parse_infix,
    pattern_segments,
    required_trigrams,
)


def test_is_infix_pattern_ownership():
    # trailing-only star = PrefixQuery (prefix.py), not this module
    assert not is_infix_pattern("dat*")
    assert is_infix_pattern("*ata*")
    assert is_infix_pattern("*ata")
    assert is_infix_pattern("da*a")
    assert is_infix_pattern("*a*b*")
    assert is_infix_pattern("da**")  # two stars, not the prefix form
    assert not is_infix_pattern("data")  # no star
    assert not is_infix_pattern("*d/t*")  # outside the analyzer alphabet


def test_parse_infix_split():
    lits, pats = parse_infix("spark *ATA* join da*a stem*")
    assert lits == ["spark", "join", "stem*"]  # prefix form passes through
    assert pats == ["*ata*", "da*a"]  # lowered


def test_segments_and_trigrams():
    assert pattern_segments("*ata*") == ["ata"]
    assert pattern_segments("da*a") == ["da", "a"]
    assert pattern_segments("**x**") == ["x"]
    assert required_trigrams("*ata*") == ["ata"]
    assert required_trigrams("*datab*") == ["ata", "dat", "tab"]
    assert required_trigrams("*ab*") == []  # too short: fallback path
    assert required_trigrams("*ust*er*") == ["ust"]  # 'er' contributes none


def test_like_pattern_translation():
    assert like_pattern("*ata*") == "%ata%"
    assert like_pattern("da*a") == "da%a"


def _matches(term: str, pattern: str) -> bool:
    rx = "^" + ".*".join(re.escape(s) for s in pattern.split("*")) + "$"
    return re.fullmatch(rx, term) is not None


def test_trigram_filter_no_false_negatives_random():
    """Necessary-condition property: every full-match term contains all
    required trigrams — the AND candidate set can never drop a match.
    Random corpus, random patterns."""
    rng = random.Random(7)
    alphabet = "abcdef"
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(500)
    ]
    for _ in range(200):
        seg = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 5)))
        pattern = f"*{seg}*"
        grams = set(required_trigrams(pattern))
        for term in corpus:
            if _matches(term, pattern):
                term_grams = {
                    term[i : i + 3] for i in range(max(len(term) - 2, 0))
                }
                assert grams <= term_grams, (pattern, term)


def _expand_ref(vocab_rows, pattern, cap=MAX_EXPANSIONS):
    cand = [
        (-df, t) for t, df in vocab_rows if _matches(t, pattern)
    ]
    cand.sort()
    return [t for _, t in cand[:cap]]


@pytest.mark.spark
class TestTrigram:
    @pytest.mark.parametrize(
        "pattern",
        [
            "*rba*",  # trigram path, several arba- terms
            "*niv*",  # trigram path
            "*ar*",  # no trigram: fallback full-dictionary verify
            "*zzz*",  # trigram path, empty result
            "a*bak",  # anchored both ends, internal star
            "*versit*",  # multi-trigram AND
        ],
    )
    def test_expansion_matches_reference_both_paths(
        self, spark, index_small, vocab_rows, pattern
    ):
        from uci_searchengine_spark.operators.trigram import (
            expand_infix,
            write_trigram_plane,
        )

        ref = _expand_ref(vocab_rows, pattern)
        # live path (no plane yet, or stale) and plane path must agree
        got_live = expand_infix(spark, index_small, pattern)
        assert got_live == ref, pattern
        write_trigram_plane(spark, index_small)
        got_plane = expand_infix(spark, index_small, pattern)
        assert got_plane == ref, pattern

    def test_full_match_not_substring(self, spark, index_small, vocab_rows):
        """'*rba' (no trailing star) anchors the end: terms merely
        CONTAINING 'rba' don't match."""
        from uci_searchengine_spark.operators.trigram import expand_infix

        assert any("rba" in t and not t.endswith("rba") for t, _ in vocab_rows)
        got = expand_infix(spark, index_small, "*rba")
        assert got == _expand_ref(vocab_rows, "*rba")
        assert all(t.endswith("rba") for t in got)

    def test_non_infix_pattern_raises(self, spark, index_small):
        from uci_searchengine_spark.operators.trigram import expand_infix

        with pytest.raises(ValueError):
            expand_infix(spark, index_small, "dat*")  # prefix form
        with pytest.raises(ValueError):
            expand_infix(spark, index_small, "plain")

    def test_plane_freshness_gate(self, spark, index_small, tmp_path):
        """A tag that disagrees with the index meta (stale after an
        append) routes readers to the live derivation."""
        import json
        import os

        from uci_searchengine_spark.operators.index_build import IndexMeta
        from uci_searchengine_spark.operators.trigram import (
            trigram_plane_fresh,
            write_trigram_plane,
        )

        write_trigram_plane(spark, index_small)
        meta = IndexMeta.load(index_small)
        assert trigram_plane_fresh(index_small, meta)
        tag_p = os.path.join(index_small, "trigramplane", "_uss_tag.json")
        orig = open(tag_p).read()
        try:
            with open(tag_p, "w") as f:
                json.dump({"gens": -1, "n_docs": -1}, f)
            assert not trigram_plane_fresh(index_small, meta)
        finally:
            with open(tag_p, "w") as f:
                f.write(orig)

    @pytest.mark.parametrize(
        "wild, rx",
        [("*rba*", "/.*rba.*/"), ("*niv* arbak", "/.*niv.*/ arbak")],
    )
    def test_wildcard_search_equals_regexp_rewrite(
        self, spark, index_small, wild, rx
    ):
        """Same full-match semantics, ordering rule, and cap as the
        regexp rewrite — the two rewrites must produce identical top-k
        for equivalent patterns (regexp_search is oracle-pinned in
        test_regexp.py, so equality transfers the pin)."""
        from uci_searchengine_spark.operators.regexp import regexp_search
        from uci_searchengine_spark.operators.trigram import wildcard_search

        got = [
            (r["doc_id"], r["score"])
            for r in wildcard_search(spark, index_small, wild, k=10).collect()
        ]
        want = [
            (r["doc_id"], r["score"])
            for r in regexp_search(spark, index_small, rx, k=10).collect()
        ]
        assert len(got) == len(want) and len(got) > 0
        for (gd, gs), (ed, es) in zip(got, want):
            assert gd == ed
            assert math.isclose(gs, es, rel_tol=1e-9)
