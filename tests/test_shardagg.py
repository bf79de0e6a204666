"""Sharded terms agg (ES doc_count_error_upper_bound semantics):
python-reference equality on random data, the bound's defining
soundness property (true − received ≤ error_ub, always), exactness
when shards are exhaustive, and parameter guards."""

import hashlib
import random
from collections import Counter, defaultdict

import pytest

from uci_searchengine_spark.operators.shardagg import sharded_terms


def _shard(doc, n):
    return int(hashlib.md5(str(doc).encode()).hexdigest()[:8], 16) % n


def _ref(pairs, n_shards, shard_size, k):
    per_shard = defaultdict(Counter)
    for doc, term in pairs:
        per_shard[_shard(doc, n_shards)][term] += 1
    returned = {}
    floors = {}
    for s, c in per_shard.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:shard_size]
        returned[s] = dict(top)
        floors[s] = (min(v for _, v in top), len(top) == shard_size)
    terms = {t for r in returned.values() for t in r}
    out = []
    for t in terms:
        dc = sum(r.get(t, 0) for r in returned.values())
        err = sum(
            flr
            for s, (flr, cut) in floors.items()
            if cut and t not in returned[s]
        )
        out.append((t, dc, err))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _rand_pairs(rng, n_docs=200, vocab=12):
    pairs = set()
    for d in range(n_docs):
        for t in rng.sample(range(vocab), rng.randrange(1, vocab)):
            pairs.add((d, f"t{t:02d}"))
    return sorted(pairs)


@pytest.mark.spark
class TestShardedTerms:
    @pytest.mark.parametrize("shard_size,k", [(3, 8), (5, 12), (2, 5)])
    def test_equals_python_reference(self, spark, shard_size, k):
        rng = random.Random(shard_size * 100 + k)
        pairs = _rand_pairs(rng)
        df = spark.createDataFrame(pairs, "doc_id long, term string")
        got = [
            (r["term"], r["doc_count"], r["error_ub"])
            for r in sharded_terms(df, "doc_id", "term", 4, shard_size, k)
            .collect()
        ]
        assert got == _ref(pairs, 4, shard_size, k)

    def test_error_bound_is_sound(self, spark):
        """Defining property: received + error_ub >= true count, for
        every merged term — the shard top-N can undercount by at most
        the bound."""
        rng = random.Random(99)
        pairs = _rand_pairs(rng, n_docs=300, vocab=20)
        true = Counter(t for _, t in pairs)
        df = spark.createDataFrame(pairs, "doc_id long, term string")
        rows = sharded_terms(df, "doc_id", "term", 4, 3, 20).collect()
        assert any(r["error_ub"] > 0 for r in rows)  # cut shards exist
        for r in rows:
            assert r["doc_count"] <= true[r["term"]]
            assert r["doc_count"] + r["error_ub"] >= true[r["term"]], r

    def test_exhaustive_shards_are_exact(self, spark):
        rng = random.Random(5)
        pairs = _rand_pairs(rng, n_docs=100, vocab=6)
        true = Counter(t for _, t in pairs)
        df = spark.createDataFrame(pairs, "doc_id long, term string")
        rows = sharded_terms(df, "doc_id", "term", 4, 100, 10).collect()
        for r in rows:
            assert r["error_ub"] == 0
            assert r["doc_count"] == true[r["term"]]

    def test_guards(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, term string")
        with pytest.raises(ValueError):
            sharded_terms(df, "doc_id", "term", 0, 5)
        with pytest.raises(ValueError):
            sharded_terms(df, "doc_id", "term", 4, 0)
