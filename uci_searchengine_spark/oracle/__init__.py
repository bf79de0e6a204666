from uci_searchengine_spark.oracle.oracle import OracleIndex  # noqa: F401
