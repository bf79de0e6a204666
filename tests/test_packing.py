"""Sequence-packing invariants (operators/packing.py).

The packing assignment must be a pure function of (ids, token counts) —
independent of partitioning — and each shard's spans must form an exact
gapless tiling of its concatenated token stream.
"""

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.packing import (
    pack_sequences,
    shard_sequence_counts,
)

SEQ_LEN = 64
N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"doc {i}", (i * 7919) % 150 + 1) for i in range(200)]
    # a few zero-token docs that must be dropped
    rows += [(1000 + i, "", 0) for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, text string, tok long")


def _packed(df):
    return pack_sequences(df, "doc_id", "tok", SEQ_LEN, N_SHARDS)


class TestPacking:
    def test_partition_invariance(self, spark, docs):
        a = sorted(_packed(docs.repartition(1)).collect())
        b = sorted(_packed(docs.repartition(13, "doc_id")).collect())
        c = sorted(_packed(docs.orderBy(F.desc("doc_id"))).collect())
        assert a == b == c

    def test_gapless_tiling_per_shard(self, docs):
        rows = _packed(docs).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        assert len(by_shard) > 1
        for shard_rows in by_shard.values():
            shard_rows.sort(key=lambda r: r["start_off"])
            assert shard_rows[0]["start_off"] == 0
            for prev, cur in zip(shard_rows, shard_rows[1:]):
                assert cur["start_off"] == prev["end_off"]

    def test_sequence_indices_and_token_conservation(self, docs):
        rows = _packed(docs).collect()
        total_in = (
            docs.filter(F.col("tok") > 0).agg(F.sum("tok")).collect()[0][0]
        )
        assert sum(r["end_off"] - r["start_off"] for r in rows) == total_in
        assert len(rows) == docs.filter(F.col("tok") > 0).count()
        for r in rows:
            assert r["first_seq"] == r["start_off"] // SEQ_LEN
            assert r["last_seq"] == (r["end_off"] - 1) // SEQ_LEN
            assert r["first_seq"] <= r["last_seq"]

    def test_shard_summary(self, docs):
        packed = _packed(docs)
        summary = {r["shard"]: r for r in
                   shard_sequence_counts(packed, SEQ_LEN).collect()}
        ends = packed.groupBy("shard").agg(F.max("end_off").alias("m")).collect()
        for r in ends:
            s = summary[r["shard"]]
            assert 0 <= s["pad_tokens"] < SEQ_LEN
            assert s["n_seqs"] * SEQ_LEN == r["m"] + s["pad_tokens"]
