import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uci_searchengine_spark.session import get_spark  # noqa: E402

N_TINY = 64
N_SMALL = 300
SEED = 1337


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_tiny_pdf():
    from uci_searchengine_spark.sources.synth import synth_pages_local

    return synth_pages_local(N_TINY, SEED)


@pytest.fixture(scope="session")
def pages_small_pdf():
    from uci_searchengine_spark.sources.synth import synth_pages_local

    return synth_pages_local(N_SMALL, SEED)


@pytest.fixture(scope="session")
def oracle_small(pages_small_pdf):
    from uci_searchengine_spark.oracle import OracleIndex

    return OracleIndex(pages_small_pdf)


@pytest.fixture(scope="session")
def index_small(spark, tmp_path_factory):
    """Index built over the small corpus (same data as oracle_small)."""
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.sources.synth import synth_pages

    d = str(tmp_path_factory.mktemp("index_small"))
    shutil.rmtree(d, ignore_errors=True)
    pages = synth_pages(spark, N_SMALL, SEED, partitions=7)
    build_index(
        spark,
        pages,
        d,
        num_shards=8,
        n_buckets=4,
        input_snapshot=f"synth:seed={SEED}:n={N_SMALL}",
    )
    return d


@pytest.fixture(scope="session")
def vocab_rows(spark, index_small):
    """Resident (term, df) vocabulary of index_small — the reference
    input for the multi-term rewrite tests (fuzzy/regex expansions)."""
    from uci_searchengine_spark.operators.suggest import vocab

    return [
        (r["term"], int(r["df"]))
        for r in vocab(spark, index_small).collect()
    ]


@pytest.fixture(scope="session")
def index_positional(spark, tmp_path_factory):
    """Index over the SAME small corpus, built with the positional plane."""
    from uci_searchengine_spark.operators.index_build import build_index
    from uci_searchengine_spark.sources.synth import synth_pages

    d = str(tmp_path_factory.mktemp("index_pos"))
    pages = synth_pages(spark, N_SMALL, SEED, partitions=7)
    build_index(
        spark,
        pages,
        d,
        num_shards=4,
        n_buckets=4,
        input_snapshot=f"synth:{SEED}:{N_SMALL}+pos",
        positions=True,
    )
    return d
