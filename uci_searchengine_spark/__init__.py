"""PySpark-native full-text analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
jwong236/UCI-SearchEngine (reference at /root/reference) as an idiomatic
PySpark engine: vectorized Arrow UDF text extraction, inverted-index build
with docID-delta varint posting lists and per-block max-score metadata,
BM25 top-k with block-max WAND pruning, per-partition checkpoint/lineage,
plus the large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Nothing in here is ported from the reference's SQLAlchemy/SQLite execution;
only its *semantics* (tokenizer, extractor, ranking contract — see
FIXTURES.md) are matched.
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128
DEFAULT_NUM_SHARDS = 32
