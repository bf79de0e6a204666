"""ES aggregation closure: extended_stats, weighted_avg,
median_absolute_deviation, diversified sampler — pinned against numpy /
pandas brute force on crafted inputs."""

import numpy as np
import pandas as pd
import pytest


def _write_lineitem(spark, tmp_path, flags, prices, qtys=None):
    n = len(prices)
    df = pd.DataFrame(
        {
            "l_orderkey": range(n),
            "l_returnflag": flags,
            "l_linestatus": ["O"] * n,
            "l_quantity": qtys if qtys is not None else [1.0] * n,
            "l_extendedprice": prices,
            "l_discount": [0.0] * n,
            "l_shipdate": ["1995-01-01"] * n,
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(df).coalesce(1).write.parquet(
        f"{sf}/lineitem.parquet"
    )
    return sf


@pytest.mark.spark
def test_extended_stats_matches_numpy(spark, tmp_path):
    from uci_searchengine_spark import entry_queries as eq

    rng = np.random.default_rng(7)
    prices = np.round(rng.uniform(10, 1000, 200), 2)
    sf = _write_lineitem(spark, tmp_path, ["A"] * 200, prices.tolist())
    r = eq.QUERIES["extended_stats"][0](spark, sf).collect()[0]
    assert r["cnt"] == 200
    assert r["mn"] == prices.min() and r["mx"] == prices.max()
    assert abs(r["avg"] - prices.mean()) < 1e-6
    # population variance / std and the ES ±2σ bounds
    assert abs(r["var_pop"] - prices.var()) < 1e-3
    assert abs(r["std_pop"] - prices.std()) < 1e-5
    assert abs(r["std_upper"] - (prices.mean() + 2 * prices.std())) < 1e-4
    assert abs(r["std_lower"] - (prices.mean() - 2 * prices.std())) < 1e-4


@pytest.mark.spark
def test_weighted_avg_weights_matter(spark, tmp_path):
    from uci_searchengine_spark import entry_queries as eq

    # two rows: cheap item bought 9x, expensive bought 1x — the
    # weighted mean sits near the cheap price, the plain mean doesn't
    sf = _write_lineitem(
        spark, tmp_path, ["A", "A"], [10.0, 100.0], qtys=[9.0, 1.0]
    )
    r = eq.QUERIES["weighted_avg"][0](spark, sf).collect()[0]
    want = (10.0 * 9 + 100.0 * 1) / 10.0  # 19.0 vs plain mean 55.0
    assert abs(r["weighted_avg"] - want) < 1e-9
    assert r["sw"] == 10.0


@pytest.mark.spark
def test_mad_robust_to_outlier(spark, tmp_path):
    from uci_searchengine_spark import entry_queries as eq

    base = [100.0 + i for i in range(21)]  # median 110, MAD 5
    with_outlier = base + [10_000.0]
    sf = _write_lineitem(
        spark, tmp_path, ["A"] * len(with_outlier), with_outlier
    )
    r = eq.QUERIES["mad_dispersion"][0](spark, sf).collect()[0]
    x = np.array(with_outlier)
    med = np.median(x)
    mad = np.median(np.abs(x - med))
    assert abs(r["med"] - med) < 1e-9
    assert abs(r["mad"] - mad) < 1e-9
    # robustness: the 10k outlier leaves MAD at ~5.5 while the std of
    # the same data is ~2000 — the property the agg exists for
    assert r["mad"] < 10 < x.std()


@pytest.mark.spark
def test_diversified_sample_caps_per_key(spark, tmp_path):
    from uci_searchengine_spark import entry_queries as eq

    # customer 1 owns the 6 most expensive orders; the sampler may keep
    # only its best 2 and must backfill from other customers
    rows = []
    for i in range(6):
        rows.append((i, 1, 1000.0 - i))
    for i in range(6, 20):
        rows.append((i, 100 + i, 500.0 - i))
    df = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    df["o_orderstatus"] = "O"
    df["o_orderdate"] = "1995-01-01"
    sf = str(tmp_path)
    spark.createDataFrame(df).coalesce(1).write.parquet(f"{sf}/orders.parquet")
    out = eq.QUERIES["diversified_sample"][0](spark, sf).collect()
    assert len(out) == 10
    per_key = {}
    for r in out:
        per_key[r["o_custkey"]] = per_key.get(r["o_custkey"], 0) + 1
    assert max(per_key.values()) <= 2
    assert per_key[1] == 2  # its top two survive
    # pandas brute force: rank within key, cap 2, global top 10
    df["rn"] = df.groupby("o_custkey")["o_totalprice"].rank(
        ascending=False, method="first"
    )
    want = (
        df[df.rn <= 2]
        .sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(10)["o_orderkey"]
        .tolist()
    )
    assert [r["o_orderkey"] for r in out] == want
