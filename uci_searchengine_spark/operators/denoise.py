"""T5-style span-corruption prep (Raffel et al. 2020 §3.1.4, the
denoising objective): deterministically mask a fraction of each doc's
tokens, collapse each masked RUN to a sentinel in the input, and emit
the sentinel-delimited masked runs as the target —

    tokens:  the quick brown fox jumps over the dog
    masked:      ^^^^^ ^^^^^           ^^^^
    input:   the <extra_id_0> fox jumps <extra_id_1> the dog
    target:  <extra_id_0> quick brown <extra_id_1> over

This is the trainer-prep stage between cleaning/dedup and packing: the
output (input_text, target_text) pairs feed seq2seq denoising training
directly, and determinism is the whole point at pipeline scale — a
resumed or re-run job must mask the SAME spans, so the mask decision
is a salted hash of (doc_id, position) (``sampling.hash_uniform_col``
convention), never an RNG.

Execution shape: ONE in-row ``F.aggregate`` fold over token positions
(the ``dedup.cdc_chunks_col`` pattern) — builds the input parts, the
target parts, and the span counter in a single pass; no explode, no
window, no shuffle, the whole operator is a scan projection. The
oracle mirrors it relationally (unnest-with-ordinality + the
gaps-and-islands window), which is also the honest description of what
the fold computes.

Reference: UCI-SearchEngine has no trainer-prep surface; breadth
extension of the training-data pipeline family (C4 clean → dedup →
span corruption → packing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.sampling import (
    hash_uniform_col,
    hash_uniform_sql,
)

MASK_RATE = 0.15
SALT = "t5span"


def _masked_flag(id_col: Column, i: Column, rate: float, salt: str) -> Column:
    """Deterministic per-(doc, position) mask decision."""
    key = F.concat(id_col.cast("string"), F.lit("|"), i.cast("string"))
    return hash_uniform_col(key, salt=salt) < F.lit(rate)


def _sentinel(k: Column) -> Column:
    return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))


def span_corrupt(
    id_col: Column,
    toks: Column,
    rate: float = MASK_RATE,
    salt: str = SALT,
) -> Column:
    """struct(input_text, target_text, n_spans, n_masked) for one doc —
    a single in-row fold over token positions. ``id_col`` seeds the
    per-position mask hash so the corruption is content-addressed and
    re-run-stable."""
    # guard the empty doc: sequence(0, -1) would DESCEND, not be empty
    idx = F.when(
        F.size(toks) > 0, F.sequence(F.lit(0), F.size(toks) - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    acc0 = F.struct(
        F.array().cast("array<string>").alias("inp"),
        F.array().cast("array<string>").alias("tgt"),
        F.lit(0).alias("k"),
        F.lit(False).alias("in_span"),
        F.lit(0).alias("nm"),
    )

    def step(acc, i):
        tok = F.element_at(toks, i + F.lit(1))
        masked = _masked_flag(id_col, i, rate, salt)
        sent = _sentinel(acc["k"])
        keep = F.struct(
            F.concat(acc["inp"], F.array(tok)).alias("inp"),
            acc["tgt"].alias("tgt"),
            acc["k"].alias("k"),
            F.lit(False).alias("in_span"),
            acc["nm"].alias("nm"),
        )
        open_span = F.struct(
            F.concat(acc["inp"], F.array(sent)).alias("inp"),
            F.concat(acc["tgt"], F.array(sent), F.array(tok)).alias("tgt"),
            (acc["k"] + F.lit(1)).alias("k"),
            F.lit(True).alias("in_span"),
            (acc["nm"] + F.lit(1)).alias("nm"),
        )
        extend = F.struct(
            acc["inp"].alias("inp"),
            F.concat(acc["tgt"], F.array(tok)).alias("tgt"),
            acc["k"].alias("k"),
            F.lit(True).alias("in_span"),
            (acc["nm"] + F.lit(1)).alias("nm"),
        )
        return (
            F.when(~masked, keep)
            .when(acc["in_span"], extend)
            .otherwise(open_span)
        )

    def finish(acc):
        return F.struct(
            F.concat_ws(" ", acc["inp"]).alias("input_text"),
            F.concat_ws(" ", acc["tgt"]).alias("target_text"),
            acc["k"].alias("n_spans"),
            acc["nm"].alias("n_masked"),
        )

    return F.aggregate(idx, acc0, step, finish)


def denoiser_prep(
    toks: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "t",
    rate: float = MASK_RATE,
    salt: str = SALT,
) -> DataFrame:
    """(id, input_text, target_text, n_spans, n_masked) for every doc —
    one zero-shuffle scan projection over the token-array relation."""
    c = span_corrupt(F.col(id_col), F.col(toks_col), rate, salt)
    return toks.select(id_col, c.alias("_c")).select(
        id_col,
        F.col("_c.input_text").alias("input_text"),
        F.col("_c.target_text").alias("target_text"),
        F.col("_c.n_spans").alias("n_spans"),
        F.col("_c.n_masked").alias("n_masked"),
    )


def mask_flag_sql(id_expr: str, pos0_expr: str, rate: float, salt: str = SALT) -> str:
    """DuckDB mirror of the per-(doc, 0-based position) mask rule."""
    key = f"(CAST({id_expr} AS VARCHAR) || '|' || CAST({pos0_expr} AS VARCHAR))"
    return f"({hash_uniform_sql(key, salt=salt)} < {rate})"


# ----------------------------------------------------------- BERT MLM
MLM_RATE = 0.15
MLM_SALT = "mlm"
MASK_TOKEN = "[MASK]"


def _u(id_col: Column, i: Column, salt: str) -> Column:
    key = F.concat(id_col.cast("string"), F.lit("|"), i.cast("string"))
    return hash_uniform_col(key, salt=salt)


def mlm_corrupt(
    id_col: Column,
    toks: Column,
    rate: float = MLM_RATE,
    salt: str = MLM_SALT,
) -> Column:
    """struct(masked_text, labels_text, n_masked) — BERT masked-LM
    corruption (Devlin et al. 2018 §3.1): select ``rate`` of positions
    by a salted (doc, position) hash; of the selected, 80% become
    ``[MASK]``, 10% a random token drawn FROM THE SAME DOC (index =
    ⌊u·len⌋ — deterministic, engine-portable), 10% stay unchanged (the
    model must still predict them). ``labels_text`` is the
    space-joined ``pos:original`` list — the prediction targets.

    Unlike span corruption, every position is independent, so this is
    a pure ``transform`` projection — no fold even needed; zero
    shuffle, zero Python. Three INDEPENDENT salted streams (select /
    action / replacement) per the ``hash_uniform_col`` correlation
    rule."""
    n = F.size(toks)
    idx = F.when(n > 0, F.sequence(F.lit(0), n - F.lit(1))).otherwise(
        F.array().cast("array<int>")
    )

    def sel(i):
        return _u(id_col, i, f"{salt}:sel") < F.lit(rate)

    def action(i):
        return _u(id_col, i, f"{salt}:act")

    def repl(i):
        # u in [0,1) → index in [1, len] for element_at (1-based)
        return F.element_at(
            toks,
            (F.floor(_u(id_col, i, f"{salt}:rep") * n.cast("double")) + 1)
            .cast("int"),
        )

    masked = F.transform(
        idx,
        lambda i: F.when(~sel(i), F.element_at(toks, i + F.lit(1)))
        .when(action(i) < F.lit(0.8), F.lit(MASK_TOKEN))
        .when(action(i) < F.lit(0.9), repl(i))
        .otherwise(F.element_at(toks, i + F.lit(1))),
    )
    labels = F.transform(
        F.filter(idx, sel),
        lambda i: F.concat(
            i.cast("string"), F.lit(":"), F.element_at(toks, i + F.lit(1))
        ),
    )
    return F.struct(
        F.concat_ws(" ", masked).alias("masked_text"),
        F.concat_ws(" ", labels).alias("labels_text"),
        F.size(F.filter(idx, sel)).alias("n_masked"),
    )


def mlm_prep(
    toks: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "t",
    rate: float = MLM_RATE,
    salt: str = MLM_SALT,
) -> DataFrame:
    """(id, masked_text, labels_text, n_masked) — one zero-shuffle
    scan projection."""
    c = mlm_corrupt(F.col(id_col), F.col(toks_col), rate, salt)
    return toks.select(id_col, c.alias("_c")).select(
        id_col,
        F.col("_c.masked_text").alias("masked_text"),
        F.col("_c.labels_text").alias("labels_text"),
        F.col("_c.n_masked").alias("n_masked"),
    )
