from uci_searchengine_spark.functions.tokenize import (  # noqa: F401
    tokenize_py,
    tokenize_series,
    tokens_col,
    tokens_sql_expr,
)
from uci_searchengine_spark.functions.extract import (  # noqa: F401
    extract_html,
    extract_pages,
    normalize_url,
)
