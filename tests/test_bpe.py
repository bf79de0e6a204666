"""BPE induction vs the textbook reference algorithm (Sennrich et al.
2016 get_stats/merge_vocab), exact merge-sequence and segmentation
equality, plus greedy-application edge cases."""

import pytest


def _ref_bpe(word_freqs, num_merges, min_freq=2):
    """Pure-Python reference: returns (merges, final segmentation)."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        # count desc, then (a, b) asc — the pinned tie-break
        (a, b), c = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((a, b, c))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


WORDS = {
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "new": 2,
    "aaa": 4,  # overlapping-pair greedy case
}


@pytest.mark.spark
class TestBPE:
    def _words(self, spark):
        return spark.createDataFrame(
            list(WORDS.items()), "word string, freq long"
        )

    def test_merges_and_segmentation_match_reference(self, spark):
        from uci_searchengine_spark.operators.bpe import bpe_train

        exp_merges, exp_vocab = _ref_bpe(WORDS, 8)
        merges, state = bpe_train(self._words(spark), 8)
        assert merges == exp_merges
        got = {r["word"]: list(r["syms"]) for r in state.collect()}
        assert got == exp_vocab

    def test_greedy_overlap_not_remerged(self, spark):
        # merge (a,a) on "aaa" -> [aa, a], and the fresh "aa" is not
        # re-merged with the trailing "a" within the same pass
        from pyspark.sql import functions as F

        from uci_searchengine_spark.operators.bpe import merge_pair_col

        df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
        got = df.select(
            merge_pair_col(F.col("syms"), "a", "a").alias("m")
        ).collect()[0]["m"]
        assert list(got) == ["aa", "a"]

    def test_nonadjacent_pairs_both_merge(self, spark):
        from pyspark.sql import functions as F

        from uci_searchengine_spark.operators.bpe import merge_pair_col

        df = spark.createDataFrame(
            [(["b", "a", "b", "a", "b"],)], "syms array<string>"
        )
        got = df.select(
            merge_pair_col(F.col("syms"), "a", "b").alias("m")
        ).collect()[0]["m"]
        assert list(got) == ["b", "ab", "ab"]

    def test_min_freq_early_stop(self, spark):
        from uci_searchengine_spark.operators.bpe import bpe_train

        words = spark.createDataFrame(
            [("ab", 1), ("cd", 1)], "word string, freq long"
        )
        merges, _state = bpe_train(words, 5, min_freq=2)
        assert merges == []  # every pair occurs once < min_freq

    def test_segment_words_applies_learned_merges(self, spark):
        from uci_searchengine_spark.operators.bpe import (
            bpe_train,
            segment_words,
        )

        merges, state = bpe_train(self._words(spark), 6)
        reseg = segment_words(self._words(spark), merges)
        a = {r["word"]: list(r["syms"]) for r in state.collect()}
        b = {r["word"]: list(r["syms"]) for r in reseg.collect()}
        assert a == b
        # and an unseen word segments with the same rules
        unseen = spark.createDataFrame([("lowest", 1)], "word string, freq long")
        seg = {
            r["word"]: list(r["syms"])
            for r in segment_words(unseen, merges).collect()
        }
        ref_m, ref_v = _ref_bpe({**WORDS, "lowest": 0}, 6)
        assert seg["lowest"] == ref_v["lowest"]
