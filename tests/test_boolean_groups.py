"""OR-groups `(a|b)` in boolean queries + wildcard desugar, pinned
against the python oracle (whose group logic is independent set
arithmetic over the postings dicts)."""

import math

import pytest

from uci_searchengine_spark.functions.queryparse import parse_query
from uci_searchengine_spark.functions.tokenize import tokenize_py
from uci_searchengine_spark.operators.boolean import (
    boolean_search,
    expand_wildcards,
)

GROUP_QUERIES = [
    "(arbak|arband) +stop0",          # group + must
    "(arbak|arband)",                 # group alone (scored, required)
    "(arbak|arband|arbast) -stop9",   # 3-way group + NOT
    "stop1 (arbak|arband)",           # OR term + group
    '(arbak|arband) "arbak stop1"',   # group + phrase
    "(arbak|arband) (stop0|stop1)",   # two groups
    "(arbak|zzznope)",                # group with an absent member
    "(zzznope|qqqnope)",              # group with NO present member
    "(arbak|arband) -arbak -arband",  # contradiction -> empty
    "(arbak)",                        # single-member group == +must
]


def test_parse_groups():
    bq = parse_query("(a|b) +c -d (e|f g)", lambda s: tokenize_py(s))
    assert bq.groups == [["a", "b"], ["e", "f", "g"]]
    assert bq.must_terms == ["c"] and bq.not_terms == ["d"]
    assert set(["a", "b", "e", "f", "g"]).issubset(bq.positive_terms)
    # single-member group folds to MUST; empty group drops
    bq = parse_query("(a) () x", lambda s: tokenize_py(s))
    assert bq.groups == [] and bq.must_terms == ["a"] and bq.or_terms == ["x"]
    # negated group -> NOT members
    bq = parse_query("-(a|b) x", lambda s: tokenize_py(s))
    assert bq.not_terms == ["a", "b"] and bq.groups == []


@pytest.mark.parametrize("q", GROUP_QUERIES)
def test_boolean_groups_vs_oracle(spark, index_small, oracle_small, q):
    want = oracle_small.boolean_top_k(q, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in boolean_search(spark, index_small, q, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], q
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12), (q, gd)


def test_boolean_groups_local_plan_equality(spark, index_small):
    from uci_searchengine_spark.operators.serving import Searcher

    s = Searcher(spark, index_small)
    for q in GROUP_QUERIES[:6]:
        loc = s.boolean_rows(q, k=10, plan="local")
        dist = s.boolean_rows(q, k=10, plan="spark")
        assert loc == dist, q


def test_expand_wildcards_rewrite():
    exp = {"arb": ["arbak", "arband"], "zzq": []}
    f = lambda p: exp.get(p, [])
    an = lambda s: [w.lower() for w in s.split()]
    # BARE wildcard is SHOULD (Lucene semantics, matches search())
    q, gs, ns, ors = expand_wildcards("arb* +stop0", f, an)
    assert q.split() == ["+stop0"] and gs == [] and ns == []
    assert ors == ["arbak", "arband"]
    # '+stem*' is the REQUIRED any-of form
    q, gs, ns, ors = expand_wildcards("+arb* +stop0", f, an)
    assert gs == [["arbak", "arband"]] and ors == []
    # negated wildcard with no expansion disappears
    q, gs, ns, ors = expand_wildcards("-zzq* stop0", f, an)
    assert q.split() == ["stop0"] and gs == [] and ns == [] and ors == []
    # negated wildcard WITH expansions -> verbatim NOT terms
    q, gs, ns, ors = expand_wildcards("-arb* stop0", f, an)
    assert ns == ["arbak", "arband"] and gs == []
    # bare wildcard with no expansion just drops (scores nothing)
    q, gs, ns, ors = expand_wildcards("zzq* stop0", f, an)
    assert q.split() == ["stop0"] and gs == [] and ors == []
    # required wildcard with no expansion -> unsatisfiable
    assert expand_wildcards("+zzq*", f, an) is None
    # quoted phrases untouched; plain groups left for the parser
    q, gs, ns, ors = expand_wildcards('"arb* x" (a|b) arb*', f, an)
    assert " ".join(q.split()) == '"arb* x" (a|b)'
    assert gs == [] and ors == ["arbak", "arband"]
    # wildcard INSIDE a group: expansions merge with analyzed literals
    q, gs, ns, ors = expand_wildcards("(arb*|ml) +x", f, an)
    assert gs == [["arbak", "arband", "ml"]] and q.split() == ["+x"]
    # group whose only member is an unexpandable wildcard -> unsat
    assert expand_wildcards("(zzq*)", f, an) is None
    # negated group with a wildcard -> verbatim NOTs
    q, gs, ns, ors = expand_wildcards("-(arb*|ml) y", f, an)
    assert ns == ["arbak", "arband", "ml"] and q.split() == ["y"]


def test_boolean_wildcard_vs_manual_group(spark, index_small, oracle_small):
    from collections import Counter

    vocab = {t: len(p) for t, p in oracle_small.postings.items()}
    pref = Counter(
        t[:4] for t in oracle_small.postings if len(t) >= 4
    ).most_common(1)[0][0]
    expanded = sorted(
        (t for t in vocab if t.startswith(pref)), key=lambda t: (-vocab[t], t)
    )[:50]
    manual = f"({'|'.join(expanded)}) +stop0"
    want = oracle_small.boolean_top_k(manual, k=10)
    # '+pref*' is the REQUIRED form equal to the manual any-of group
    got = [
        (r["doc_id"], r["score"])
        for r in boolean_search(
            spark, index_small, f"+{pref}* +stop0", k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    # bare 'pref*' is SHOULD: equal to the manual OR form (expansions
    # scored, not required) — same across surfaces
    manual_or = f"{' '.join(expanded)} +stop0"
    want_or = oracle_small.boolean_top_k(manual_or, k=10)
    got_or = [
        (r["doc_id"], r["score"])
        for r in boolean_search(
            spark, index_small, f"{pref}* +stop0", k=10
        ).collect()
    ]
    assert [d for d, _ in got_or] == [d for d, _ in want_or]
    # and through the resident Searcher (local plan)
    from uci_searchengine_spark.operators.serving import Searcher

    s = Searcher(spark, index_small)
    rows = s.boolean_rows(f"+{pref}* +stop0", k=10, plan="local")
    assert [(r["doc_id"], r["score"]) for r in rows] == got
    rows_or = s.boolean_rows(f"{pref}* +stop0", k=10, plan="local")
    assert [(r["doc_id"], r["score"]) for r in rows_or] == got_or


def test_boolean_wildcard_on_stemmed_index(spark, tmp_path):
    """Regression: wildcard expansions are stored (stemmed) vocab terms
    and must NOT round-trip the analyzer — Porter is not idempotent
    ('univers' -> 'univ'), so a textual group rewrite would silently
    empty the result on a stem=True index."""
    import datetime

    from uci_searchengine_spark.functions.stem import porter_stem
    from uci_searchengine_spark.operators.boolean import boolean_search
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.operators.serving import Searcher

    assert porter_stem("univers") == "univ"  # the non-fixed-point premise
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://a.example.com/1", "university data research"),
        ("https://a.example.com/2", "data tables only"),
        ("https://a.example.com/3", "universal data coverage"),
    ]
    pages = spark.createDataFrame(
        [
            (u, ts, f"<html><body>{t}</body></html>".encode())
            for u, t in rows
        ],
        "url string, warc_ts timestamp, html binary",
    )
    d = str(tmp_path / "stemidx")
    build_index(
        spark, pages, d, num_shards=2, n_buckets=1,
        input_snapshot="wcstem", stem=True,
    )
    got = {
        r["doc_id"]
        for r in boolean_search(spark, d, "+univers* +data", k=10).collect()
    }
    # 'university' and 'universal' both stem to vocab terms starting
    # with 'univers' ('univers', 'univers...') — both docs must match
    assert len(got) == 2, got
    rows2 = Searcher(spark, d).boolean_rows("+univers* +data", k=10)
    assert {r["doc_id"] for r in rows2} == got
    # bare 'univers*' is SHOULD: the data-only doc is included too,
    # scored on 'data' alone
    got_or = {
        r["doc_id"]
        for r in boolean_search(spark, d, "univers* +data", k=10).collect()
    }
    assert len(got_or) == 3, got_or


def test_wildcard_not_vs_explicit_must_contradiction(
    spark, index_small, oracle_small
):
    """`+t ... -pref*` where t ∈ the pref* expansion is an honest
    contradiction (t required AND banned) and must return NOTHING —
    regression: the injected-NOT filter used to drop the +must
    requirement instead, silently widening the result set."""
    from collections import Counter

    from uci_searchengine_spark.operators.serving import Searcher

    vocab = set(oracle_small.postings)
    pref = Counter(
        t[:4] for t in vocab if len(t) >= 5
    ).most_common(1)[0][0]
    term = next(t for t in sorted(vocab) if t.startswith(pref))
    q = f"+{term} stop0 -{pref}*"
    assert boolean_search(spark, index_small, q, k=10).collect() == []
    s = Searcher(spark, index_small)
    assert s.boolean_rows(q, k=10, plan="local") == []
    assert s.boolean_rows(q, k=10, plan="spark") == []


def test_group_internal_wildcard(spark, index_small, oracle_small):
    """`(arb*|stop1) +stop0` — the wildcard inside the group expands and
    merges with the literal member."""
    from collections import Counter

    vocab = {t: len(p) for t, p in oracle_small.postings.items()}
    pref = Counter(
        t[:4] for t in oracle_small.postings if len(t) >= 4
    ).most_common(1)[0][0]
    expanded = sorted(
        (t for t in vocab if t.startswith(pref)), key=lambda t: (-vocab[t], t)
    )[:50]
    manual = f"({'|'.join(expanded + ['stop1'])}) +stop0"
    want = oracle_small.boolean_top_k(manual, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in boolean_search(
            spark, index_small, f"({pref}*|stop1) +stop0", k=10
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
