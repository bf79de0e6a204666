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


# --------------------------------------------- UL2 mixture-of-denoisers
UL2_MODE_SALT = "ul2mode"
UL2_R_RATE, UL2_R_SALT = 0.15, "ul2r"
UL2_X_RATE, UL2_X_SALT = 0.5, "ul2x"
UL2_S_SALT = "ul2s"
_SENT0 = "<extra_id_0>"


def prefix_lm_split(
    id_col: Column, toks: Column, salt: str = UL2_S_SALT
) -> Column:
    """struct(input_text, target_text) — UL2's S-denoiser (sequential
    prefix-LM): split the doc at K = 1 + ⌊u·(len−1)⌋ with u a salted
    doc hash (K ∈ [1, len−1], both sides nonempty); inputs end with
    the sentinel and targets start with it, the T5 continuation
    convention. Docs with < 2 tokens keep the whole text as input and
    get an empty continuation — total and deterministic."""
    n = F.size(toks)
    u = hash_uniform_col(id_col.cast("string"), salt=salt)
    k = (
        F.when(n >= 2, (F.lit(1) + F.floor(u * (n - F.lit(1)))))
        .otherwise(n)
        .cast("int")
    )
    inp = F.concat_ws(
        " ",
        F.concat(F.slice(toks, F.lit(1), k), F.array(F.lit(_SENT0))),
    )
    tgt = F.concat_ws(
        " ",
        F.concat(F.array(F.lit(_SENT0)), F.slice(toks, k + F.lit(1), n - k)),
    )
    return F.struct(inp.alias("input_text"), tgt.alias("target_text"))


def ul2_prep(
    toks: DataFrame, id_col: str = "doc_id", toks_col: str = "t"
) -> DataFrame:
    """UL2 mixture-of-denoisers trainer prep (Tay et al. 2022): every
    doc is deterministically assigned ONE of the three paradigms by a
    salted hash (equal thirds, pinned) and corrupted accordingly —

    * ``[R]`` regular denoising: the T5 span fold at rate 0.15;
    * ``[X]`` extreme denoising: the same fold at rate 0.5 (the
      paper's high-corruption family — span-length µ is rate-driven
      here, the pinned simplification of its µ/r grid);
    * ``[S]`` sequential prefix-LM: :func:`prefix_lm_split`.

    The paradigm token prefixes the input (the paper's mode tokens the
    model conditions on). One scan projection: the mode hash, both
    span folds, and the prefix split are all in-row expressions —
    conditional branches, zero shuffle, zero Python. Three INDEPENDENT
    salted hash streams (mode / R-mask / X-mask / S-split) per the
    hash-correlation rule."""
    idc, tc = F.col(id_col), F.col(toks_col)
    u = hash_uniform_col(idc.cast("string"), salt=UL2_MODE_SALT)
    mode = (
        F.when(u < F.lit(1.0 / 3.0), F.lit("[R]"))
        .when(u < F.lit(2.0 / 3.0), F.lit("[X]"))
        .otherwise(F.lit("[S]"))
    )
    r = span_corrupt(idc, tc, rate=UL2_R_RATE, salt=UL2_R_SALT)
    x = span_corrupt(idc, tc, rate=UL2_X_RATE, salt=UL2_X_SALT)
    s = prefix_lm_split(idc, tc)

    def pick(field):
        return (
            F.when(mode == F.lit("[R]"), r[field])
            .when(mode == F.lit("[X]"), x[field])
            .otherwise(s[field])
        )

    return toks.select(
        id_col,
        mode.alias("mode"),
        F.concat(mode, F.lit(" "), pick("input_text")).alias("input_text"),
        pick("target_text").alias("target_text"),
    )


def span_corrupt_sql_ctes(prefix: str, rate: float, salt: str) -> str:
    """The parameterized DuckDB mirror of the span fold as a CTE chain
    (expects a ``toks(doc_id, t)`` CTE in scope) — exposes
    ``{prefix}inp(doc_id, input_text)`` and ``{prefix}tgt(doc_id,
    target_text, n_spans)``. Shared by the span_corruption and
    ul2_prep gates so the two oracles cannot drift."""
    m = mask_flag_sql("doc_id", "pos", rate, salt=salt)
    p = prefix
    return f"""{p}tk AS (
  SELECT doc_id, unnest(t) AS tok, unnest(range(0, len(t))) AS pos
  FROM toks
),
{p}fl AS (SELECT doc_id, tok, pos, {m} AS m FROM {p}tk),
{p}mk AS (
  SELECT doc_id, tok, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM {p}fl WHERE m
),
{p}sp0 AS (
  SELECT doc_id, grp, min(pos) AS start,
         string_agg(tok, ' ' ORDER BY pos) AS body
  FROM {p}mk GROUP BY doc_id, grp
),
{p}sp AS (
  SELECT doc_id, start, body,
         row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1 AS k
  FROM {p}sp0
),
{p}inp_pieces AS (
  SELECT doc_id, pos, tok AS piece FROM {p}fl WHERE NOT m
  UNION ALL
  SELECT doc_id, start AS pos,
         '<extra_id_' || CAST(k AS VARCHAR) || '>' AS piece FROM {p}sp
),
{p}inp AS (
  SELECT doc_id, string_agg(piece, ' ' ORDER BY pos) AS input_text
  FROM {p}inp_pieces GROUP BY doc_id
),
{p}tgt AS (
  SELECT doc_id,
         string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' || body,
                    ' ' ORDER BY k) AS target_text,
         count(*) AS n_spans
  FROM {p}sp GROUP BY doc_id
),
{p}nm AS (
  SELECT doc_id, count(*) FILTER (WHERE m) AS n_masked
  FROM {p}fl GROUP BY doc_id
)"""


# ------------------------------------------------- fill-in-the-middle
FIM_RATE = 0.5
FIM_SEL_SALT = "fimsel"
FIM_C1_SALT = "fim1"
FIM_C2_SALT = "fim2"
PRE, SUF, MID = "<PRE>", "<SUF>", "<MID>"


def fim_prep(
    docs: DataFrame,
    rate: float = FIM_RATE,
    mode: str = "psm",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022 — the
    code-LLM prep: applying FIM to a fraction of documents teaches
    infilling "for free" without hurting left-to-right loss). A
    hash-chosen ``rate`` fraction of docs is rearranged: two uniform
    character cut points (independent salted streams) split the doc
    into prefix/middle/suffix, emitted as

    * ``psm``: ``<PRE>prefix<SUF>suffix<MID>middle``
    * ``spm``: ``<SUF>suffix<PRE>prefix<MID>middle``

    (the paper's two orders; the middle always trails so generation
    ends by producing it). Unselected docs pass through unchanged —
    the AR slice of the mixture. Character-level splitting is the
    published implementation (split first, tokenize after), which
    also keeps the operator a pure scan projection: three hashes +
    three substrs per row, zero shuffle, zero Python, trivially
    deterministic on re-run."""
    if mode not in ("psm", "spm"):
        raise ValueError("mode must be 'psm' or 'spm'")
    idc = F.col(id_col).cast("string")
    t = F.col(text_col)
    n = F.length(t)
    sel = hash_uniform_col(idc, salt=FIM_SEL_SALT) < F.lit(rate)
    c1 = F.floor(hash_uniform_col(idc, salt=FIM_C1_SALT) * (n + 1))
    c2 = F.floor(hash_uniform_col(idc, salt=FIM_C2_SALT) * (n + 1))
    lo = F.least(c1, c2).cast("int")
    hi = F.greatest(c1, c2).cast("int")
    prefix = t.substr(F.lit(1), lo)
    middle = t.substr(lo + 1, hi - lo)
    suffix = t.substr(hi + 1, n - hi)
    if mode == "psm":
        fim = F.concat(
            F.lit(PRE), prefix, F.lit(SUF), suffix, F.lit(MID), middle
        )
    else:
        fim = F.concat(
            F.lit(SUF), suffix, F.lit(PRE), prefix, F.lit(MID), middle
        )
    return docs.select(
        id_col,
        sel.alias("fim_applied"),
        F.when(sel, fim).otherwise(t).alias("output_text"),
    )
