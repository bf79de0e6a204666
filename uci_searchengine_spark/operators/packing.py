"""Sequence packing for LLM pre-training batches.

GPT-style "concat-and-chunk" packing: documents are concatenated in a
deterministic shuffled order and the token stream is cut into
fixed-length training sequences of ``seq_len`` tokens. The operator
emits, per document, the half-open token span ``[start_off, end_off)``
it occupies inside its shard's stream and the first/last sequence index
it lands in — everything a downstream batch writer needs to materialize
packed sequences without re-tokenizing.

Scale shape: a single global prefix-sum would be one giant window
partition (a driver-sized bottleneck at 100 TB). Instead documents are
hash-assigned to ``n_shards`` independent shards and packing is
per-shard: the running offset is a window cumsum PARTITIONED BY shard —
every shard packs in parallel, each shard's final partial sequence is
padded (exactly what multi-worker training-data writers do: one stream
per writer). Determinism: shard id and within-shard order derive from
the md5 of the doc key (the portable hash-uniform trick shared with
operators/sampling.py), so the SAME packing comes out at any
parallelism, partitioning, or row order — and a SQL oracle reproduces
it exactly.

Reference: no packing exists in UCI-SearchEngine — breadth extension
for the LLM-data-pipeline surface (the step between `training_prep`
output and the trainer's data loader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.sampling import (
    hash_uniform_col,
    hash_uniform_sql,
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    seq_len: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document a token span in its shard's packed stream.

    Returns (id, shard, start_off, end_off, first_seq, last_seq):

    * ``shard``     — hash shard (md5-uniform bucket of the id), the
                      unit of parallel packing.
    * ``start_off`` / ``end_off`` — half-open token span in the shard's
                      concatenated stream (cumsum window over the
                      deterministic shuffle order).
    * ``first_seq`` / ``last_seq`` — the range of ``seq_len``-token
                      sequences the document overlaps (shard-local
                      indices; a doc longer than ``seq_len`` spans
                      many — the trainer's chunker splits it).

    Zero-token documents are dropped (they occupy no span). One shuffle
    total (the window exchange on shard); the cumsum itself is a
    map-side running sum within each shard partition. The shard/order
    hash is salted (default ``"pack"``) so it stays uniform even when
    upstream stages already filtered on unsalted md5(id) — an unsalted
    shard assignment after a ``u < 0.5`` hash-sample would leave half
    the shards empty.
    """
    u = hash_uniform_col(F.col(id_col), salt)
    shard = F.floor(u * n_shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy("_u", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(tok_col).cast("long").alias("_tok"),
            u.alias("_u"),
            shard.alias("shard"),
        )
        .filter(F.col("_tok") > 0)
        .withColumn("end_off", F.sum("_tok").over(w))
        .select(
            "id",
            "shard",
            (F.col("end_off") - F.col("_tok")).alias("start_off"),
            "end_off",
            F.floor((F.col("end_off") - F.col("_tok")) / seq_len)
            .cast("long")
            .alias("first_seq"),
            F.floor((F.col("end_off") - 1) / seq_len)
            .cast("long")
            .alias("last_seq"),
        )
    )


def pack_sequences_sql(
    table_sql: str,
    id_col: str,
    tok_col: str,
    seq_len: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> str:
    """DuckDB mirror of :func:`pack_sequences` (same md5 shard/order)."""
    u = hash_uniform_sql(id_col, salt)
    return f"""
WITH src AS (
  SELECT {id_col} AS id, CAST({tok_col} AS BIGINT) AS tok,
         {u} AS u,
         CAST(floor({u} * {n_shards}) AS INT) AS shard
  FROM ({table_sql})
  WHERE CAST({tok_col} AS BIGINT) > 0
),
c AS (
  SELECT id, shard, tok,
         -- CAST: DuckDB's windowed SUM(BIGINT) yields HUGEINT, which
         -- pandas widens to float64 (180.0 vs Spark's 180) and the
         -- driver's value hash then mismatches on every row.
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY u, id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
  FROM src
)
SELECT id, shard, CAST(end_off - tok AS BIGINT) AS start_off, end_off,
       CAST(floor((end_off - tok) / {seq_len}.0) AS BIGINT) AS first_seq,
       CAST(floor((end_off - 1) / {seq_len}.0) AS BIGINT) AS last_seq
FROM c
"""


def shard_sequence_counts(packed: DataFrame, seq_len: int) -> DataFrame:
    """Per-shard packing summary: total tokens, number of full
    ``seq_len`` sequences, and tokens of padding wasted in the final
    partial sequence — the packing-efficiency report a batch writer
    prints. One tiny agg over the packed assignment."""
    return packed.groupBy("shard").agg(
        F.sum(F.col("end_off") - F.col("start_off")).alias("total_tokens"),
        F.count("*").alias("n_docs"),
        F.ceil(F.max("end_off") / seq_len).cast("long").alias("n_seqs"),
        (
            F.ceil(F.max("end_off") / seq_len).cast("long") * seq_len
            - F.max("end_off")
        ).alias("pad_tokens"),
    )
